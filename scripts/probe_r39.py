"""Probe r39 (TPU, quiet box): 4K animated-sweep row — plain schedule
and pixels_per_lane ladder.

The 4K row (BASELINE config 5) runs spp=4, so per-lane work P x spp
drives amortisation of the batch's fixed costs (probe_r25/r26). With
plain batches now beating staged (root expansion + tail3), the row
should move to compaction_threshold=0, and P=16 halves the launch
count (2 per 8.3M-pixel frame instead of 4) while doubling per-lane
work — at the cost of +24 banked-accumulator state leaves. P=32 would
cover the frame in ONE launch but likely exceeds the 16 MB scoped-VMEM
ceiling (+96 leaves); tried last, failure tolerated.
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.core.camera import Camera

    def run(label, p_lane):
        jax.clear_caches()
        from tpurt.render.renderer import (
            _flat_batch_size, _tonemap_dev, render_batch_flat,
        )

        cfg = RenderConfig(
            width=3840, height=2160, rays_per_pixel=4, max_bounces=4,
            tile_size=256, seed_mode="reference", pixels_per_lane=p_lane,
            mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
        )
        scene, _cam = build_scene("bunny", cfg)
        frames = 2
        cams = [
            Camera.create(
                position=cfg.camera_position, pitch=cfg.camera_pitch,
                yaw=cfg.camera_yaw + 2.0 * math.pi * f / 720.0,
                roll=cfg.camera_roll, fov_degrees=cfg.fov_degrees,
                aspect_ratio=cfg.aspect_ratio,
            )
            for f in range(frames)
        ]
        total = cfg.width * cfg.height
        b = _flat_batch_size(cfg) * cfg.pixels_per_lane
        n_batches = -(-total // b)
        try:
            for _ in range(2):
                for i in range(n_batches):
                    m, s, _ = render_batch_flat(scene, cams[0], cfg, i * b)
                    _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
        except Exception as e:
            print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            segs = 0.0
            for f, cam in enumerate(cams):
                outs = []
                for i in range(n_batches):
                    m, s, _ = render_batch_flat(scene, cam, cfg, i * b,
                                                frame_index=f)
                    segs += float(s)
                    outs.append(m)
                for m in outs:
                    np.asarray(_tonemap_dev(m))
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        mrays = segs / best / 1e6
        print(f"[{label}] {frames} frames {best:.3f}s "
              f"({best/frames:.3f}s/frame) batches/frame={n_batches} "
              f"=> {mrays:.2f} Mrays/s", flush=True)
        return mrays

    results = {}
    for p in (8, 16, 32):
        results[f"P{p}"] = run(f"4k plain P={p}", p)

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
