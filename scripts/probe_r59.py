"""Probe r59 (TPU): 16-tri leaf rows on the headline scene.

config.MEGA_LEAF_TRIS=16 doubles leaf-row capacity (bank width 160 ->
320 f32; W=320 measured ~free per row at 262k lanes, notes r8; never
256 — pathological). Blob bank shrinks 13635 -> 7339 rows and the tree
loses a level of leaf fan-out, so straggler lanes — which set the
iteration count — spend fewer leaf steps per segment. Cost: the
in-kernel leaf MT block doubles (16 inline tests vs 8) and the row
gather moves 2x the bytes. CPU-verified bitwise-identical to leaf8 on
sphere and blob scenes.

Legs: leaf8 anchor, leaf16, each a 6-frame steady block (plain P=8,
il4, tail3), plus iters/frame.
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

    def run_leg(label, leaf_tris):
        _c.MEGA_LEAF_TRIS = leaf_tris
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
            print(f"[{label}] FAILED: {str(e)[:200]}", flush=True)
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            seg_d, it_d = block()
            segs = float(np.asarray(seg_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        iters = int(np.asarray(it_d))
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  iters/frame "
              f"{iters/FRAMES:.1f}", flush=True)

    run_leg("leaf8 anchor", 8)
    run_leg("leaf16", 16)
    run_leg("leaf8 (drift)", 8)
    _c.MEGA_LEAF_TRIS = 8


if __name__ == "__main__":
    main()
