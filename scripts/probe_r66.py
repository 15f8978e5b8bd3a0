"""Probe r66 (TPU): narrower node rows — MEGA_NODE_ARITY=16.

The W104 win (r63) was mostly gathered-bytes + VMEM slack. Arity 16
halves node-row words (u8 floor 104 -> 56): leaf5/a16 = W96, leaf3/a16
= W64, leaf4/a16 = W80. The tree gains a level (deeper stacks, more
node steps), but iterations are segment-pipeline-bound (r59b) — the
question is whether that holds when node rows carry half the fanout.
All legs at tail_passes=4 (r64/r65: 314-315 Mrays/s at a32/l5/W104).
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
                       mega_tail_passes=4, compaction_threshold=0)

    def run_leg(label, arity, leaf):
        _c.MEGA_NODE_ARITY = arity
        _c.MEGA_LEAF_TRIS = leaf
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

    run_leg("a32 l5 W104 anchor", 32, 5)
    run_leg("a16 l5 W96", 16, 5)
    run_leg("a16 l4 W80", 16, 4)
    run_leg("a16 l3 W64", 16, 3)
    _c.MEGA_NODE_ARITY = 32
    _c.MEGA_LEAF_TRIS = 5


if __name__ == "__main__":
    main()
