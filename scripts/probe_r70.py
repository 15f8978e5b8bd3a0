"""Probe r70 (TPU): final knob re-sweep at the a8/l3/W64/tail5 ship.

The scoped-VMEM slack from the narrow bank may unlock knobs that were
ceiling-blocked at every earlier layout:

  block8192   8192-lane Pallas blocks (halved per-block overhead;
              OOM'd at every previous layout)
  prune       MEGA_MAT_PRUNE scene-specialised shade (previously
              needed vmem raise, net -7%)
  bf16bounds  4-words/slot absolute bf16 child bounds (same W64 bank
              at arity 8: max(19*3, 7+4*8)=64; cheaper decode,
              tighter bounds)
  il2 / il8   interleave re-sweep (gather size changed 2.5x)
  unroll3     while-loop unroll (neutral at a16)
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

    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=5, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", base)

    def run_leg(label, cfg, block=4096, prune=False, unroll=2,
                bf16=False, floor=None):
        nonlocal scene, cam
        _c.MEGA_BLOCK_LANES = block
        _c.MEGA_MAT_PRUNE = prune
        _c.MEGA_UNROLL = unroll
        if floor is not None:
            _c.MEGA_INTERLEAVE_FLOOR = floor
        if bf16 != _c.MEGA_BF16_BOUNDS:
            _c.MEGA_BF16_BOUNDS = bf16
            scene, cam = bench.build_scene("bunny", cfg)
        jax.clear_caches()

        def block_fn():
            seg_d = it_d = None
            for f in range(FRAMES):
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
        _c.MEGA_MAT_PRUNE = False
        _c.MEGA_UNROLL = 2
        _c.MEGA_INTERLEAVE_FLOOR = 65536

    run_leg("anchor", base)
    run_leg("block8192", base, block=8192)
    run_leg("prune", base, prune=True)
    run_leg("bf16bounds", base, bf16=True)
    run_leg("il2 (back to f32 bounds)", base.replace(mega_interleave=2),
            bf16=False)
    run_leg("il8 floor32k", base.replace(mega_interleave=8), floor=32768)
    run_leg("unroll3", base, unroll=3)


if __name__ == "__main__":
    main()
