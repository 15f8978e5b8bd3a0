"""Probe r73 (TPU): numerator-form dense accepts A/B (VERDICT r4 #5).

The round-4 close-out named numerator-form accept tests as the one
unprobed dense-sweep lever (the epilogue's VPU fold is the measured
floor). Op-count analysis says the win is knife-edge — t's division
survives for the min-fold, so the variant trades 2 multiplies for ~4
selects/negates — this probe measures it on the BASELINE config-2 row
(teapot 720p brute force, the r60-attributed shape).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 4


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    import tpurt.config as _c
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import _add_dev, render_batch_flat

    cfg = RenderConfig(width=1280, height=720, rays_per_pixel=8,
                       max_bounces=4, mega_dense=True,
                       rays_per_batch=230400, tile_size=256,
                       seed_mode="reference", pixels_per_lane=4,
                       mega_interleave=4, mega_tail_passes=5,
                       compaction_threshold=0)
    scene, cam = bench.build_scene("teapot", cfg)

    def run_leg(label, numerator):
        _c.DENSE_NUMERATOR_ACCEPT = numerator
        jax.clear_caches()

        def block_fn():
            seg_d = None
            for f in range(FRAMES):
                m, s, _ = render_batch_flat(scene, cam, cfg, 0,
                                            frame_index=f)
                seg_d = s if seg_d is None else _add_dev(seg_d, s)
            return seg_d

        try:
            for _ in range(2):
                segs = float(np.asarray(block_fn()))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            segs = float(np.asarray(block_fn()))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.2f} Mrays/s", flush=True)
        _c.DENSE_NUMERATOR_ACCEPT = False

    run_leg("divided(ship)", False)
    run_leg("numerator", True)


if __name__ == "__main__":
    main()
