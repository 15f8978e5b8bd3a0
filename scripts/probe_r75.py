"""Probe r75 (TPU): cross-frame packing at the parity row's 4-iteration
frames (VERDICT r4 #4 — packing's natural habitat, never probed).

BASELINE config 1 (640x480, 1 spp, 1 bounce) renders in ~4 loop
iterations at P=8: the launch ramp IS the frame, so cross-frame packing
(F frames share one launch's ramp + decay) should pay its maximum
here. Legs: unpacked anchor, F2, F4, F8 (P stays 8; slots split over
frames), plus a P=16/F2 point (deeper quota at equal slots-per-frame).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 16


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    import tpurt.config as _c
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import (
        _add_dev, render_batch_flat, render_batch_flat_frames,
    )

    _c.MEGA_MAT_PRUNE = True
    base = RenderConfig(width=640, height=480, rays_per_pixel=1,
                        max_bounces=1, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=5, compaction_threshold=0)
    scene, cam = bench.build_scene("sphere", base)

    def run_leg(label, cfg, pack=1):
        jax.clear_caches()

        def block_fn():
            seg_d = it_d = None
            for f in range(0, FRAMES, pack):
                if pack > 1:
                    m, sg, it = render_batch_flat_frames(
                        scene, (cam,) * pack, cfg, 0, frame_index=f)
                else:
                    m, sg, it = render_batch_flat(scene, cam, cfg, 0,
                                                  frame_index=f)
                seg_d = sg if seg_d is None else _add_dev(seg_d, sg)
                it_d = it if it_d is None else _add_dev(it_d, it)
            return seg_d, it_d

        try:
            for _ in range(2):
                seg_d, it_d = block_fn()
                segs = float(np.asarray(seg_d))
                _ = int(np.asarray(it_d))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            return
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            seg_d, it_d = block_fn()
            segs = float(np.asarray(seg_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.2f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  iters/frame "
              f"{int(np.asarray(it_d))/FRAMES:.1f}", flush=True)

    run_leg("anchor P8 unpacked", base)
    run_leg("packF2", base.replace(mega_frames_per_batch=2), pack=2)
    run_leg("packF4", base.replace(mega_frames_per_batch=4), pack=4)
    run_leg("packF8", base.replace(mega_frames_per_batch=8), pack=8)
    run_leg("P16 packF2",
            base.replace(pixels_per_lane=16, mega_frames_per_batch=2),
            pack=2)


if __name__ == "__main__":
    main()
