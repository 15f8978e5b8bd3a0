"""Probe r61 (TPU): NARROW leaf rows — cut gather bytes.

r59b: iterations are pinned at 72/frame regardless of leaf capacity
(segment-pipeline-bound: iters ~ worst-lane segments / tail_passes),
so leaf capacity is free to shrink. The gather moves W f32 per lane
per iteration (~168 MB at W=160, ~46% of the 2.13 ms iteration);
leaf5 narrows the bank to W=136 (node rows need 7+4*32=135) and leaf3
is the floor (same 136). If the gather at 262k lanes is partially
bytes-bound, -15% bytes shows up directly; if latency-bound, flat.

Legs: anchor leaf8/W160, leaf5/W136, leaf4/W136 (more rows, same
width — tests the row-count sensitivity too).
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
    from tpurt.render.renderer import _add_dev, render_batch_flat

    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       pixels_per_lane=8, mega_interleave=4,
                       mega_tail_passes=3, compaction_threshold=0)
    # (cfg reassigned per leg for tail-pass variants)

    def run_leg(label, leaf_tris, tail=3, expand_passes=99):
        _c.MEGA_LEAF_TRIS = leaf_tris
        _c.MEGA_EXPAND_PASSES = expand_passes
        nonlocal cfg
        cfg = cfg.replace(mega_tail_passes=tail)
        jax.clear_caches()
        scene, cam = bench.build_scene("bunny", cfg)
        print(f"[{label}] bank {scene.mega_rows.shape} "
              f"depth {scene.mega_stack_depth}", flush=True)

        def block():
            seg_d = it_d = None
            for f in range(FRAMES):
                m, s, it = render_batch_flat(scene, cam, cfg, 0,
                                             frame_index=f)
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

    run_leg("leaf8 anchor W160", 8)
    run_leg("leaf5 W136", 5)
    run_leg("leaf4 W136", 4)
    # Cheap-4th-pass hybrid: iterations are segment-pipeline-bound
    # (iters ~ worst-lane segs / tail_passes, r59b) and tail4 was only
    # a wash because its 4th pass replicates the FULL tail incl. the
    # 32-slab root expansions; expansion limited to passes 1-3 keeps
    # the 4th pass to shade/static/enter-unexpanded only.
    run_leg("leaf8 tail4 expand3", 8, tail=4, expand_passes=3)
    run_leg("leaf8 tail5 expand3", 8, tail=5, expand_passes=3)
    _c.MEGA_LEAF_TRIS = 8
    _c.MEGA_EXPAND_PASSES = 99


if __name__ == "__main__":
    main()
