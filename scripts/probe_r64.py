"""Probe r64 (TPU): re-sweep the ceiling-blocked knobs at leaf5/W104.

r63: the W=104 bank (leaf5, u8 bounds) took the headline 226.5 -> 295.0
Mrays/s — 35% fewer gathered bytes AND ~1.8 MB of scoped-VMEM slack
freed per block (row operand 2.6 -> 1.7 MB double-buffered). Every knob
that previously hit the 16 MB ceiling gets a re-probe at the new
layout:

  anchor     leaf5 W104 (r63: 295.0, 72 iters)
  p16        pixels_per_lane=16, plain affine (never compiled at W160)
  packF2P8   cross-frame pack, 16 slots (failed at W160; vmem32 -5%)
  tail4      4 full tail passes (past-ceiling spill made it a wash)
  unroll3    3-body unroll (previously neutral-to-worse)
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
                        mega_tail_passes=3, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", base)
    print(f"bank {scene.mega_rows.shape}", flush=True)

    def run_leg(label, cfg, f_pack=1, unroll=None):
        if unroll is not None:
            _c.MEGA_UNROLL = unroll
            jax.clear_caches()
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
        if unroll is not None:
            _c.MEGA_UNROLL = 2

    run_leg("anchor leaf5", base)
    run_leg("p16", base.replace(pixels_per_lane=16))
    run_leg("packF2P8", base, f_pack=2)
    run_leg("tail4", base.replace(mega_tail_passes=4))
    run_leg("unroll3", base, unroll=3)


if __name__ == "__main__":
    main()
