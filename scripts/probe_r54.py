"""Probe r54 (TPU): cross-frame lane packing on the headline frame.

The committed headline (irregular 69k mesh, 1080p x 8spp, 262144 lanes,
P=8, plain schedule) runs ~74 iterations/frame at ~2.1 ms — the last
~10-20% of iterations run mostly-idle decay tail and the first ~6 are
launch ramp. Packing F frames into one launch (quota slots spanning
frames: megakernel frames_per_batch) overlaps frame f's tail with
frame f+1's ramp and averages straggler variance over F*P pixels per
lane, so per-frame iterations should drop toward the per-lane mean.

Legs (steady blocks of 6 frames, best of 2; no tonemap/collect in any
leg so the comparison is pure render):
  anchor   F=1: 6 launches of P=8       (the committed steady path)
  pack2    F=2: 3 launches of P=16 slots
  pack3    F=3: 2 launches of P=24 slots (VMEM risk: banked accs)

Same scene/pixels/seeds in every leg; per-frame radiance is bitwise
identical across legs (tests/test_flat_batching.py), so s/frame is the
whole story.
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
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import (
        _add_dev, render_batch_flat, render_batch_flat_frames,
    )

    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       pixels_per_lane=8, mega_interleave=4,
                       mega_tail_passes=3, compaction_threshold=0)
    scene, cam = bench.build_scene("bunny", cfg)
    print(f"scene tris={scene.num_triangles}", flush=True)

    def run_leg(label, f_pack, p=None):
        cfg_l = cfg if p is None else cfg.replace(pixels_per_lane=p)
        assert FRAMES % f_pack == 0
        cams = (cam,) * f_pack

        def block():
            seg_d = it_d = None
            for f in range(0, FRAMES, f_pack):
                for start in range(0, cfg.width * cfg.height,
                                   262144 * cfg_l.pixels_per_lane):
                    if f_pack == 1:
                        m, s, it = render_batch_flat(scene, cam, cfg_l,
                                                     start, frame_index=f)
                    else:
                        m, s, it = render_batch_flat_frames(
                            scene, cams, cfg_l, start, frame_index=f)
                    seg_d = s if seg_d is None else _add_dev(seg_d, s)
                    it_d = it if it_d is None else _add_dev(it_d, it)
            return seg_d, it_d

        try:
            for _ in range(2):  # compile+warm the exact executable set
                seg_d, it_d = block()
                segs = float(np.asarray(seg_d))
                iters = int(np.asarray(it_d))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:240]}", flush=True)
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            seg_d, it_d = block()
            segs = float(np.asarray(seg_d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        iters = int(np.asarray(it_d))
        spf = best / FRAMES
        mrays = segs / best / 1e6
        print(f"[{label}] {spf*1e3:.1f} ms/frame  {mrays:.1f} Mrays/s  "
              f"iters/frame {iters/FRAMES:.1f} "
              f"({iters/(FRAMES//f_pack):.0f}/launch)", flush=True)

    # 16-slot packed bodies fail the remote Mosaic compile (HTTP 500 at
    # block 4096 AND 2048 — not per-block VMEM). Probe the pack at the
    # KNOWN-GOOD 8-slot budget instead: F=2 x P=4 (two launches per
    # frame-pair) and F=4 x P=2, vs the P-matched unpacked anchors.
    run_leg("anchor F1 P8", 1)
    run_leg("anchor F1 P4", 1, p=4)
    run_leg("pack2 F2 P4 (8 slots)", 2, p=4)
    run_leg("pack4 F4 P2 (8 slots)", 4, p=2)
    run_leg("pack2 F2 P8 (16 slots)", 2)
    # Re-run the anchor to bound drift within the process.
    run_leg("anchor F1 P8 (re)", 1)


if __name__ == "__main__":
    main()
