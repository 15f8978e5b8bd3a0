"""Probe r55 (TPU): why does the 16-slot packed body fail to compile?

r54: pack2 F2 P8 (16 quota slots) fails the remote Mosaic compile at
block 4096 AND block 2048 (so not per-block VMEM scaling alone), while
the 4K ladder row compiles 16 AFFINE slots (P=16, F=1, spp=4) every
round. Legs isolate the delta (each ~3-5 min compile):

  a  F1 P16 affine, 1080p spp8     — 16 slots, NO new pack code. If
                                     this fails, 16 slots never
                                     compiled at the headline shape
                                     (spp8) and the 4K precedent was
                                     shape-specific; if it compiles,
                                     the pack tables/f_off chain are
                                     the trigger.
  b  F2 P8 pack, vmem 32 MB        — raised scoped-VMEM ceiling.
  c  F2 P8 pack, vmem 32 + blk2048 — both relief valves.
  d  F2 P8 pack, spp4              — body-size vs spp interaction.

Any compiling pack leg also reports steady ms/frame (anchor F1 P8
repeated for drift).
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

    cfg0 = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4,
                        mega_tail_passes=3, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", cfg0)
    print(f"scene tris={scene.num_triangles}", flush=True)

    def run_leg(label, cfg, f_pack):
        cams = (cam,) * f_pack

        def block():
            seg_d = it_d = None
            for f in range(0, FRAMES, f_pack):
                for start in range(0, cfg.width * cfg.height,
                                   262144 * cfg.pixels_per_lane):
                    if f_pack == 1:
                        m, s, it = render_batch_flat(scene, cam, cfg,
                                                     start, frame_index=f)
                    else:
                        m, s, it = render_batch_flat_frames(
                            scene, cams, cfg, start, frame_index=f)
                    seg_d = s if seg_d is None else _add_dev(seg_d, s)
                    it_d = it if it_d is None else _add_dev(it_d, it)
            return seg_d, it_d

        try:
            for _ in range(2):
                seg_d, it_d = block()
                segs = float(np.asarray(seg_d))
                iters = int(np.asarray(it_d))
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
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s  "
              f"iters/frame {int(np.asarray(it_d))/FRAMES:.1f}", flush=True)

    run_leg("a F1 P16 affine spp8", cfg0.replace(pixels_per_lane=16), 1)
    _c.MEGA_VMEM_LIMIT_MB = 32
    run_leg("b F2 P8 pack vmem32", cfg0, 2)
    _c.MEGA_BLOCK_LANES = 2048
    run_leg("c F2 P8 pack vmem32 blk2048", cfg0, 2)
    _c.MEGA_BLOCK_LANES = 4096
    _c.MEGA_VMEM_LIMIT_MB = 0
    run_leg("d F2 P8 pack spp4", cfg0.replace(rays_per_pixel=4), 2)
    run_leg("anchor F1 P8 (drift)", cfg0, 1)


if __name__ == "__main__":
    main()
