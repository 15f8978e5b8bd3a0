"""Probe r72 (TPU): attribution + untried bank points at the r71 ship.

r71 showed the knob space exhausted at +-1.5%: tail6/7 cut iterations
18% with zero net win (body growth offsets), vmem/block lose. The
binding constraint is the per-iteration gather/body pipeline. Legs:

  fake-gather     MEGA_FAKE_GATHER=True (broadcast row 0, garbage
                  image) — prices the engine WITHOUT the gather DMA:
                  anchor-minus-this = the gather's marginal share at
                  the ship schedule (r46 dual-cap methodology)
  a8l2 / a16l3    untried bank corners: leaf2 at arity 8 (W40 — fewer
                  bytes, same node branch, shallower than the a4/l2
                  loser), leaf3 at arity 16 (same W64, double fanout)
  packF3 / packF4 deeper cross-frame packs now that share_rd collapses
                  the rd-table operands (packF2 measured +1.4%, r71)
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
    from tpurt.render.renderer import (
        _add_dev, render_batch_flat, render_batch_flat_frames,
    )

    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=5, compaction_threshold=0)
    _c.MEGA_MAT_PRUNE = True
    scene, cam = bench.build_scene("bunny", base)

    def run_leg(label, cfg, pack=1, scn=None, fake=False):
        _c.MEGA_FAKE_GATHER = fake
        s = scn if scn is not None else scene
        jax.clear_caches()

        def block_fn():
            seg_d = it_d = None
            for f in range(0, FRAMES, pack):
                if pack > 1:
                    m, sg, it = render_batch_flat_frames(
                        s, (cam,) * pack, cfg, 0, frame_index=f)
                else:
                    m, sg, it = render_batch_flat(s, cam, cfg, 0,
                                                  frame_index=f)
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
            _c.MEGA_FAKE_GATHER = False
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
        _c.MEGA_FAKE_GATHER = False

    run_leg("anchor(ship)", base)
    # Gather share: same schedule, row DMA replaced by a broadcast.
    run_leg("fake-gather", base, fake=True)
    # Bank corners (refreeze per layout).
    _c.MEGA_NODE_ARITY, _c.MEGA_LEAF_TRIS = 8, 2
    s_a8l2, _ = bench.build_scene("bunny", base)
    run_leg(f"a8l2 W{int(s_a8l2.mega_rows.shape[1])}", base, scn=s_a8l2)
    _c.MEGA_NODE_ARITY, _c.MEGA_LEAF_TRIS = 16, 3
    s_a16l3, _ = bench.build_scene("bunny", base)
    run_leg(f"a16l3 W{int(s_a16l3.mega_rows.shape[1])}", base, scn=s_a16l3)
    _c.MEGA_NODE_ARITY, _c.MEGA_LEAF_TRIS = 8, 3
    # Deeper packs (share_rd keeps the operand footprint one frame's).
    run_leg("packF2", base.replace(mega_frames_per_batch=2), pack=2)
    run_leg("packF4", base.replace(mega_frames_per_batch=4), pack=4)


if __name__ == "__main__":
    main()
