"""Probe r33 (CPU counters): lane-iteration mix under the round-3
headline schedule (root expansion ON, tail_passes=3, plain batches) —
where do the remaining iterations go once enter bubbles are merged and
replay-shade runs in-iteration?

Also prints the tail_passes=1 mix for contrast.
"""

import functools
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.core.camera import make_ray, pixel_uv
    from tpurt.render.renderer import _flat_coords, _flat_batch_size

    p = 8
    cfg = RenderConfig(width=960, height=540, rays_per_pixel=4,
                       max_bounces=4, tile_size=256, compaction_threshold=0,
                       pixels_per_lane=p, mega_body="xla")
    scene, cam = build_scene("bunny", cfg)
    b = _flat_batch_size(cfg)

    def run_with(tail_passes):
        @functools.partial(jax.jit, static_argnames=("batch", "tp"))
        def run(scene, camera, coords, *, batch, tp):
            from tpurt.render.megakernel import run_megakernel

            xs, ys, pix = _flat_coords(coords, batch, cfg.width, cfg.height)
            uv = pixel_uv(xs, ys, cfg.width, cfg.height)
            ro0, rd0 = make_ray(camera, uv)
            return run_megakernel(
                scene, ro0, rd0, pix, coords[1], sample_offset=coords[2],
                camera=camera, width=cfg.width, height=cfg.height,
                rays_per_pixel=cfg.rays_per_pixel,
                max_bounces=cfg.max_bounces,
                seed_mode=cfg.seed_mode,
                invisible_budget=cfg.invisible_budget,
                subpixel_jitter=False, body_backend="xla",
                pixels_per_lane=p, tail_passes=tp, debug_counters=True,
            )

        coords = jnp.asarray([0, 0, 0], jnp.int32)
        mean, segs, tallies = run(scene, cam, coords, batch=b, tp=tail_passes)
        t = np.asarray(tallies).astype(float)
        iters, live, node, leaf, shade, enter = t
        total = iters * b
        segs = float(segs)
        print(f"--- tail_passes={tail_passes} ---")
        print(f"lanes={b} iters={iters:.0f} segs={segs/1e6:.2f}M")
        print(f"lane-iters total {total/1e6:.1f}M; per-seg {total/segs:.2f}")
        for name, v in (("live", live), ("node", node), ("leaf", leaf),
                        ("shade", shade), ("enter-bubble", enter)):
            print(f"  {name:13s} {v/1e6:9.1f}M lane-iters  "
                  f"{v/segs:6.2f}/seg  {100*v/total:5.1f}% of total",
                  flush=True)
        print(f"  idle          {(total-live)/1e6:9.1f}M lane-iters  "
              f"{(total-live)/segs:6.2f}/seg  {100*(total-live)/total:5.1f}%")

    run_with(3)
    run_with(1)


if __name__ == "__main__":
    main()
