"""Probe r63 (TPU): leaf5 on the u8-aware W=104 bank (the shipping
candidate) vs the W=160 anchor.

r61 measured leaf5/W136 at +1.5% over leaf8/W160 with iterations flat
at 72 (segment-pipeline-bound). With u8 node bounds the node row only
needs 103 words, so leaf5 rides W=104 — 35% fewer gathered bytes per
iteration than the anchor. Also re-checks bitwise vs leaf8 on-chip via
segment counts (radiance equality is CPU-tested).
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

    segs_by = {}

    def run_leg(label, leaf_tris):
        _c.MEGA_LEAF_TRIS = leaf_tris
        jax.clear_caches()
        scene, cam = bench.build_scene("bunny", cfg)
        print(f"[{label}] bank {scene.mega_rows.shape}", flush=True)

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
        segs_by[leaf_tris] = segs
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  iters/frame "
              f"{int(np.asarray(it_d))/FRAMES:.1f}", flush=True)

    run_leg("leaf8 anchor W160", 8)
    run_leg("leaf5 W104", 5)
    _c.MEGA_LEAF_TRIS = 8
    if 8 in segs_by and 5 in segs_by:
        print(f"segment counts equal: {segs_by[8] == segs_by[5]} "
              f"({segs_by[8]:.0f} vs {segs_by[5]:.0f})", flush=True)


if __name__ == "__main__":
    main()
