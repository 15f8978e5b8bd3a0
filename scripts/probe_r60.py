"""Probe r60 (TPU): production teapot dense-iteration attribution.

The teapot-720p-bruteforce row runs ~37 ms/iteration. probe_r56-r58
priced the SWEEP KERNEL at ~11-14 ms per 0.94 Gpairs (VPU epilogue
~5.4 ms + f32 padded dot ~10 ms, partially overlapped; bf16 +6% only,
so not flop-bound) — production scale (~1.4 Gpairs) ~= 16-20 ms. The
other ~17-21 ms must be the per-iteration XLA machinery around it:
the dense-mode XLA _body_math (Mosaic can't nest the sweep), the
exact-winner rescue gathers (_dense_hit -> _mt_single on 6 gathered
triangle arrays), and fusion-boundary glue. Dual-cap marginals on the
REAL engine (traced iteration caps, fixed costs cancel):

  base      full dense iteration
  nosweep   sweep_entry_local stubbed to (inf, -1) with a live data dep
            — everything BUT the sweep kernel
  norescue  intersect._mt_single stubbed — everything but the exact
            winner recompute (its 6 per-lane triangle gathers)

base - nosweep = the sweep's true in-engine cost;
base - norescue = the rescue gathers' cost.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CAP_LO, CAP_HI = 12, 36


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import _mega_flat_start, _mega_statics

    cfg = RenderConfig(width=1280, height=720, rays_per_pixel=8,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       mega_dense=True, rays_per_batch=230400,
                       pixels_per_lane=4, mega_interleave=4,
                       mega_tail_passes=3, compaction_threshold=0)
    scene, cam = bench.build_scene("teapot", cfg)
    print(f"tris={scene.num_triangles}", flush=True)
    statics = _mega_statics(cfg, cfg.width, cfg.height)
    b = 230400

    def leg(label):
        def run(cap):
            coords = jnp.asarray([0, 0, 0, cap], jnp.int32)
            state, active = _mega_flat_start(
                scene, cam, coords, batch=b,
                pixels_per_lane=cfg.pixels_per_lane, **statics,
            )
            return float(jnp.sum(state.segments.astype(jnp.float32))
                         + active)

        try:
            for _ in range(2):
                run(CAP_LO)
                run(CAP_HI)
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:200]}", flush=True)
            return
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            run(CAP_LO)
            t1 = time.perf_counter()
            run(CAP_HI)
            t2 = time.perf_counter()
            d = ((t2 - t1) - (t1 - t0)) / (CAP_HI - CAP_LO)
            best = d if best is None else min(best, d)
        print(f"[{label}] {best*1e3:.2f} ms/iter marginal", flush=True)

    leg("base")

    import tpurt.render.plucker_fused as pf

    real_sweep = pf.sweep_entry_local

    def stub_sweep(lo, ld, lane_entry, table, interpret=None):
        # live data dep so nothing hoists; all-miss result
        t = lo.x * np.float32(0.0) + np.float32(np.inf)
        col = (lane_entry & 0) - 1
        return t, col

    pf.sweep_entry_local = stub_sweep
    jax.clear_caches()
    leg("nosweep")
    pf.sweep_entry_local = real_sweep

    import tpurt.render.intersect as itc

    real_mt = itc._mt_single

    def stub_mt(lo_rows, ld_rows, pa, pb, pc, na, nb, nc, cull):
        r = lo_rows.shape[0]
        dep = (lo_rows[:, 0] + pa[:, 0]) * np.float32(0.0)
        ok = dep > np.float32(-1.0)
        t = dep + np.float32(1.0)
        n = jnp.stack([dep, dep + 1.0, dep], axis=1)
        back = dep > np.float32(0.0)
        return ok, t, n, back

    itc._mt_single = stub_mt
    jax.clear_caches()
    leg("norescue")
    itc._mt_single = real_mt


if __name__ == "__main__":
    main()
