"""Probe: pallas-body megakernel scaling in batch size + phase split.

Phases timed separately on the bunny scene:
  - gather+T:   the XLA row gather + transpose alone (dependent chain)
  - body:       one pallas_call on fixed inputs (no gather)
  - full iter:  gather + body inside the real while_loop (per-iter)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig

    base = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, compaction_threshold=0, mega_body="pallas",
    )
    scene, cam = build_scene("bunny", base)
    scene = jax.device_put(scene)

    from tpurt.render.renderer import render_batch_flat

    def run(tag, cfg, starts, n=1):
        m, s, it = render_batch_flat(scene, cam, cfg, starts[0])
        np.asarray(m)  # warm
        t0 = time.perf_counter()
        segs = 0.0
        iters = 0
        for _ in range(n):
            for st in starts:
                m, s, it = render_batch_flat(scene, cam, cfg, st)
                segs += float(s)
                iters += int(it) if it is not None else 0
                np.asarray(m)
        dt = time.perf_counter() - t0
        r = min(cfg.rays_per_batch, cfg.width * cfg.height)
        msg = (f"[{tag:28s}] {dt:.3f}s {segs/1e6:.2f}M segs "
               f"=> {segs/dt/1e6:.2f} Mseg/s")
        if iters:
            msg += (f" | {iters} iters {dt/iters*1e6:.0f} us/iter "
                    f"{dt/iters/r*1e9:.1f} ns/lane-iter")
        print(msg, file=sys.stderr, flush=True)

    # batch-size sweep (bunny-heavy mid-frame batches, 2 of each)
    for rb in (131072, 262144, 524288, 1048576):
        cfg = base.replace(rays_per_batch=rb)
        b = cfg.rays_per_batch
        starts = [3 * b, 4 * b] if 5 * b <= 1920 * 1080 else [0]
        run(f"pallas rb={rb}", cfg, starts)

    # unroll comparison at 262k is implicit (unroll=1); XLA reference
    run("xla    rb=262144", base.replace(rays_per_batch=262144,
                                         mega_body="xla"),
        [3 * 262144, 4 * 262144])


if __name__ == "__main__":
    main()
