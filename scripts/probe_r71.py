"""Probe r71 (TPU): round-5 lever re-sweep at the SHIPPED config
(a8/l3/W64, tail5, prune ON — the round-4 close-out left several knobs
measured only pre-prune):

  tail6 / tail7   deeper retire ladder with the PRUNED slimmer tail
                  body (r64 measured tail6 losing pre-prune at a16;
                  prune freed more scoped VMEM since)
  packF2          cross-frame packing (P16 slots) with prune — r68
                  measured it neutral pre-prune at tail5
  tail6+packF2    iteration win composition
  vmem32          raised Mosaic scoped-VMEM limit alone (schedule
                  penalty vs spill relief at the ship body)
  block8192+vmem32  bigger Pallas blocks under the raised limit
                  (always OOM'd at default scope)
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
                        mega_tail_passes=5, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", base)

    def run_leg(label, cfg, block=4096, vmem=0, pack=1):
        _c.MEGA_BLOCK_LANES = block
        _c.MEGA_VMEM_LIMIT_MB = vmem
        _c.MEGA_MAT_PRUNE = True
        jax.clear_caches()

        def block_fn():
            seg_d = it_d = None
            for f in range(0, FRAMES, pack):
                if pack > 1:
                    m, s, it = render_batch_flat_frames(
                        scene, (cam,) * pack, cfg, 0, frame_index=f)
                else:
                    m, s, it = render_batch_flat(scene, cam, cfg, 0,
                                                 frame_index=f)
                seg_d = s if seg_d is None else _add_dev(seg_d, s)
                it_d = it if it_d is None else _add_dev(it_d, it)
            return seg_d, it_d

        try:
            for _ in range(2):
                seg_d, it_d = block_fn()
                segs = float(np.asarray(seg_d))
                _ = int(np.asarray(it_d))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            _c.MEGA_BLOCK_LANES = 4096
            _c.MEGA_VMEM_LIMIT_MB = 0
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            seg_d, it_d = block_fn()
            segs = float(np.asarray(seg_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  iters/frame "
              f"{int(np.asarray(it_d))/FRAMES:.1f}", flush=True)
        _c.MEGA_BLOCK_LANES = 4096
        _c.MEGA_VMEM_LIMIT_MB = 0

    run_leg("anchor(ship)", base)
    run_leg("tail6", base.replace(mega_tail_passes=6))
    run_leg("tail7", base.replace(mega_tail_passes=7))
    run_leg("packF2", base.replace(mega_frames_per_batch=2), pack=2)
    run_leg("tail6+packF2",
            base.replace(mega_tail_passes=6, mega_frames_per_batch=2),
            pack=2)
    run_leg("vmem32", base, vmem=32)
    run_leg("block8192+vmem32", base, block=8192, vmem=32)


if __name__ == "__main__":
    main()
