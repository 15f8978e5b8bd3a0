"""Probe r65 (TPU): tail-pass ladder + combos at leaf5/W104.

r64: with the narrow bank's VMEM slack, tail4 flipped from a wash to
+7% (314.4 Mrays/s, 58.3 iters/frame — iterations track worst-lane
segments / tail_passes almost exactly: 72*3/4 = 54 + traversal).
Climb until the body growth overtakes: tail5, tail6; combos with the
pack (iters -4%) and leaf4 (same W104 bank, more leaf rows).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 6


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

    _c.MEGA_LEAF_TRIS = 5
    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=4, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", base)

    def run_leg(label, cfg, f_pack=1, leaf=None):
        nonlocal scene, cam
        if leaf is not None:
            _c.MEGA_LEAF_TRIS = leaf
            jax.clear_caches()
            scene, cam = bench.build_scene("bunny", cfg)
        cams = (cam,) * f_pack

        def block():
            seg_d = it_d = None
            for f in range(0, FRAMES, f_pack):
                for start in range(0, cfg.width * cfg.height,
                                   262144 * cfg.pixels_per_lane):
                    if f_pack == 1:
                        m, s, it = render_batch_flat(scene, cam, cfg,
                                                     start, frame_index=f)
                    else:
                        m, s, it = render_batch_flat_frames(
                            scene, cams, cfg, start, frame_index=f)
                    seg_d = s if seg_d is None else _add_dev(seg_d, s)
                    it_d = it if it_d is None else _add_dev(it_d, it)
            return seg_d, it_d

        try:
            for _ in range(2):
                seg_d, it_d = block()
                segs = float(np.asarray(seg_d))
                _ = int(np.asarray(it_d))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            seg_d, it_d = block()
            segs = float(np.asarray(seg_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  iters/frame "
              f"{int(np.asarray(it_d))/FRAMES:.1f}", flush=True)

    run_leg("tail5", base.replace(mega_tail_passes=5))
    run_leg("tail6", base.replace(mega_tail_passes=6))
    run_leg("tail4 packF2", base, f_pack=2)
    run_leg("tail4 leaf4", base, leaf=4)
    run_leg("tail4 anchor leaf5", base, leaf=5)


if __name__ == "__main__":
    main()
