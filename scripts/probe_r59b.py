"""Probe r59b (TPU): leaf16 under VMEM relief valves.

r59: MEGA_LEAF_TRIS=16 (bank 13635x160 -> 7339x320, depth 7 -> 6)
fails the default 16 MB scoped-VMEM compile — the (W,subl,128) row
operand doubles (+~5 MB with double buffering). Legs price the relief
valves; the leaf16 iteration win must exceed their standalone costs
(vmem32 ~ -5%, block2048 ~ -24%):

  leaf16 vmem32, leaf16 blk2048, leaf16 vmem32+blk2048; leaf8 anchor.
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

    def run_leg(label, leaf_tris, vmem=0, blk=4096):
        _c.MEGA_LEAF_TRIS = leaf_tris
        _c.MEGA_VMEM_LIMIT_MB = vmem
        _c.MEGA_BLOCK_LANES = blk
        jax.clear_caches()
        scene, cam = bench.build_scene("bunny", cfg)

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

    run_leg("leaf16 vmem32", 16, vmem=32)
    run_leg("leaf16 blk2048", 16, blk=2048)
    run_leg("leaf16 vmem32 blk2048", 16, vmem=32, blk=2048)
    run_leg("leaf8 anchor", 8)
    _c.MEGA_LEAF_TRIS = 8
    _c.MEGA_VMEM_LIMIT_MB = 0
    _c.MEGA_BLOCK_LANES = 4096


if __name__ == "__main__":
    main()
