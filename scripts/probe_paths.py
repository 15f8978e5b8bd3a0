"""Probe: tile path vs flat-batch path on the bunny headline config.

Prints per-path seconds, segments, Mrays/s, and (for uncapped runs)
iterations -> us/iter and rows/segment — the currency breakdown."""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import render_batch_flat, render_tile_with_stats

    base = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, bruteforce_threshold=4096,
    )
    scene, cam = build_scene("bunny", base)
    scene = jax.device_put(scene)
    print(f"tris={scene.num_triangles} mega_rows={scene.mega_rows.shape} "
          f"statics={len(scene.mega_static_cull)} chain={len(scene.mega_chain)}",
          file=sys.stderr)

    total = base.width * base.height

    def probe_flat(tag, cfg, batches=2):
        b = min(cfg.rays_per_batch, total)
        # warm
        m, s, it = render_batch_flat(scene, cam, cfg, 0)
        np.asarray(m)
        t0 = time.perf_counter()
        segs = 0.0
        iters = 0
        for i in range(batches):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            segs += float(s)
            if it is not None:
                iters += int(it)
            np.asarray(m)
        dt = time.perf_counter() - t0
        lanes = b
        msg = (f"[{tag}] {batches}x{b} lanes: {dt:.3f}s {segs/1e6:.2f}M segs "
               f"=> {segs/dt/1e6:.2f} Mseg/s")
        if iters:
            msg += (f" | {iters} iters, {dt/iters*1e6:.0f} us/iter, "
                    f"{iters*lanes/segs:.2f} rows/seg")
        print(msg, file=sys.stderr)

    def probe_tiles(tag, cfg, n_tiles=4):
        ts = cfg.tile_size
        r, s = render_tile_with_stats(scene, cam, cfg, 0, 0, ts, ts)
        np.asarray(r)
        t0 = time.perf_counter()
        segs = 0.0
        for k in range(n_tiles):
            r, s = render_tile_with_stats(
                scene, cam, cfg, (k % 4) * ts, (k // 4) * ts, ts, ts)
            segs += float(s)
            np.asarray(r)
        dt = time.perf_counter() - t0
        print(f"[{tag}] {n_tiles}x{ts}x{ts}: {dt:.3f}s {segs/1e6:.2f}M segs "
              f"=> {segs/dt/1e6:.2f} Mseg/s", file=sys.stderr)

    # 1. tile path as bench.py currently drives it (staged compaction on)
    probe_tiles("tile256-staged", base)
    # 2. tile path, no compaction (single uncapped launch per tile)
    probe_tiles("tile256-plain", base.replace(compaction_threshold=0))
    # 3. flat 262144, compaction on (render_frame default)
    probe_flat("flat262k-staged", base)
    # 4. flat 262144, no compaction — reports iters/rows per seg
    probe_flat("flat262k-plain", base.replace(compaction_threshold=0))
    # 5. flat 65536 plain for the lane-scaling comparison
    probe_flat("flat65k-plain",
               base.replace(compaction_threshold=0, rays_per_batch=65536),
               batches=4)


if __name__ == "__main__":
    main()
