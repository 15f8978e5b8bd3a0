"""Probe r67 (TPU): push the slim-body ladder at arity16/leaf4/W80.

r66: a16/l4/W80 = 356.9 (from a32/l5/W104's 313.7) at iterations STILL
pinned to 58.3 — the node branch halved and the scoped-VMEM slack
grew. Legs continue each axis from the new optimum:

  anchor    a16 l4 W80 tail4           (r66: 356.9)
  a8        arity 8, leaf3, W64 tail4  (node branch halves again;
                                        depth +1-2)
  tail5     a16 l4 tail5               (cheaper iterations may extend
                                        the pass ladder past r65's 5)
  tail6     a16 l4 tail6
  packF2    a16 l4 tail4 + cross-frame pack (r65: +1.6% at a32)
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

    def run_leg(label, cfg, arity, leaf, f_pack=1):
        nonlocal scene, cam
        if (_c.MEGA_NODE_ARITY, _c.MEGA_LEAF_TRIS) != (arity, leaf) \
                or scene is None:
            _c.MEGA_NODE_ARITY = arity
            _c.MEGA_LEAF_TRIS = leaf
            jax.clear_caches()
            scene, cam = bench.build_scene("bunny", cfg)
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

    run_leg("anchor a16 l4 tail4", base, 16, 4)
    run_leg("packF2", base, 16, 4, f_pack=2)
    run_leg("tail5", base.replace(mega_tail_passes=5), 16, 4)
    run_leg("tail6", base.replace(mega_tail_passes=6), 16, 4)
    run_leg("a8 l3 W64 tail4", base, 8, 3)
    _c.MEGA_NODE_ARITY = 32
    _c.MEGA_LEAF_TRIS = 5


if __name__ == "__main__":
    main()
