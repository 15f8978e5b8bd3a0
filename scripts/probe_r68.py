"""Probe r68 (TPU): arity-8 combos + the arity-4 floor.

r67: a8/l3/W64 = 372.6 at tail4 (node branch down to 8 slab tests,
iterations still pinned at 58.3 despite BVH depth 11); tail5 at a16
gave +1.8%. Legs:

  a8 tail5, a8 tail5 packF2, a8 tail4 packF2  — the combo grid
  a4 l2 (W40, depth ~15)                      — the arity floor: 4
                                                tests/row but the
                                                doubled stack state
                                                streams every iteration
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

    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=4, compaction_threshold=0)

    scene = cam = None
    cur = (None, None)

    def run_leg(label, cfg, arity, leaf, f_pack=1):
        nonlocal scene, cam, cur
        if cur != (arity, leaf):
            _c.MEGA_NODE_ARITY = arity
            _c.MEGA_LEAF_TRIS = leaf
            jax.clear_caches()
            scene, cam = bench.build_scene("bunny", cfg)
            cur = (arity, leaf)
            print(f"[{label}] bank {scene.mega_rows.shape} "
                  f"depth {scene.mega_stack_depth}", flush=True)
        cams = (cam,) * f_pack

        def block():
            seg_d = it_d = None
            for f in range(0, FRAMES, f_pack):
                if f_pack == 1:
                    m, s, it = render_batch_flat(scene, cam, cfg, 0,
                                                 frame_index=f)
                else:
                    m, s, it = render_batch_flat_frames(
                        scene, cams, cfg, 0, frame_index=f)
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

    run_leg("a8 tail5", base.replace(mega_tail_passes=5), 8, 3)
    run_leg("a8 tail5 packF2", base.replace(mega_tail_passes=5), 8, 3,
            f_pack=2)
    run_leg("a8 tail4 packF2", base, 8, 3, f_pack=2)
    run_leg("a4 l2 W40 tail4", base, 4, 2)
    _c.MEGA_NODE_ARITY = 32
    _c.MEGA_LEAF_TRIS = 5


if __name__ == "__main__":
    main()
