"""Probe r76 (TPU): hide the gather — schedule re-sweep at the r72 ship.

r72's fake-gather attribution: the row-gather DMA costs ~28 ms of the
89.4 ms headline frame (570.7 Mrays/s with it removed) — it is NOT
fully hidden behind the Pallas bodies under the default "inline"
schedule (whose r6 measurement predates the narrow bank, tail passes,
unroll=2 and packing). Legs, all at ship+packF2 (the r72 best):

  inline (anchor)   the shipped schedule
  carry il4         software-pipelined: the loop CARRIES each
                    sub-batch's gathered rows one body-step ahead, so
                    every DMA has a full body to hide behind
  carry il2         half as many, bigger gathers (the engine's row
                    rate rises with batch size) with the same lookahead
  pair2 il4         two DMAs in flight per step (the gather engine's
                    measured +20% two-stream mode)
  carry il8         deepest lookahead (floor drops to 32k)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    import tpurt.config as _c
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import _add_dev, render_batch_flat_frames

    _c.MEGA_MAT_PRUNE = True
    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=5, compaction_threshold=0,
                        mega_frames_per_batch=2)
    scene, cam = bench.build_scene("bunny", base)

    def run_leg(label, cfg, floor=None):
        if floor is not None:
            _c.MEGA_INTERLEAVE_FLOOR = floor
        jax.clear_caches()

        def block_fn():
            seg_d = it_d = None
            for f in range(0, FRAMES, 2):
                m, sg, it = render_batch_flat_frames(
                    scene, (cam,) * 2, cfg, 0, frame_index=f)
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
            _c.MEGA_INTERLEAVE_FLOOR = 65536
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
        _c.MEGA_INTERLEAVE_FLOOR = 65536

    run_leg("inline il4 (anchor)", base)
    run_leg("carry il4", base.replace(mega_schedule="carry"))
    run_leg("carry il2", base.replace(mega_schedule="carry",
                                      mega_interleave=2))
    run_leg("pair2 il4", base.replace(mega_schedule="pair2"))
    run_leg("carry il8", base.replace(mega_schedule="carry",
                                      mega_interleave=8), floor=32768)


if __name__ == "__main__":
    main()
