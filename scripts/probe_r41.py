"""Probe r41 (TPU): ablation cost profile of the headline iteration.

The headline sits at ~72 iters x ~5.8 ms/iter (89.1 Mrays/s quiet box).
Iteration count is ~ the per-lane mean work, so the next lever is the
COST of one iteration. SPMD body cost is lane-phase-independent (every
lane executes the whole program), so stubbing one program block and
re-timing a PINNED-iteration run attributes that block's cost exactly —
trajectories change, program cost doesn't lie.

Legs (all: bunny 1080p shape, 262144 lanes, P=8, il4, unroll2,
tail3+expansion base, max_iterations=48 via _mega_flat_start):
  base      full program
  tail1     tail_passes=1 (drops 2x shade/static/enter/expansion)
  noexpand  MEGA_ROOT_EXPAND=False (drops 3x 32-slab expansion)
  nostatic  _static_stage stubbed (drops 3x 14-tri MT static stage)
  noshade   shade_hit_soa stubbed (drops 3x material shade)
  copybody  _body_math = state-copy (floor: gather + stream + glue)
plus a standalone chained-gather micro at the interleave sub-shape
(4 x 65536 rows/iter from the real row bank) for the gather component.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CAP = 48
LANES = 262144


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    import tpurt.config as tconfig
    from tpurt.config import RenderConfig
    from tpurt.core import v3 as v3lib
    from tpurt.core.v3 import V3
    from tpurt.render import megakernel as mk
    from tpurt.render import shading as sh

    base_kw = dict(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    cfg = RenderConfig(**base_kw)
    scene, cam = build_scene("bunny", cfg)

    orig_static = mk._static_stage
    orig_shade = mk.shade_hit_soa
    orig_body = mk._body_math

    def stub_static(srows, s_cull, s_onesided, s_owner, mats,
                    num_meshes, enabled, origin, direction):
        zeros = jnp.zeros(enabled.shape, jnp.float32)
        zero3 = V3(zeros, zeros, zeros)
        falses = mk._bool_full(enabled.shape, False)
        return (falses, jnp.full(enabled.shape, np.float32(np.inf)),
                zero3, zero3, falses,
                jnp.zeros(enabled.shape, jnp.int32) - 1)

    def stub_shade(mats, num_meshes, shade, w_valid, w_point, w_normal,
                   w_back, w_mesh, origin, direction, throughput, light,
                   rng, bounces, max_bounces, present=None):
        # Paths never terminate => lanes stay live to the iteration cap.
        return sh.ShadeResultSoA(
            origin=w_point, direction=direction, throughput=throughput,
            light=light, rng=rng, bounces=bounces + 1,
            continuing=mk._bool_full(rng.shape, True),
            invisible=mk._bool_full(rng.shape, False),
        )

    def stub_body(s, col, srows, mats, params, slot_rays, frame_index,
                  sample_offset, primary_ray_fn, **kw):
        # Touch the row so the gather is not dead-code-eliminated.
        seg = s.segments + 1
        if col is not None:
            seg = seg + (col(0) > np.float32(1e30)).astype(jnp.int32)
        return s._replace(segments=seg)

    def run_leg(label, cfg_leg, patches=(), knobs=()):
        for mod, name, val in patches:
            setattr(mod, name, val)
        saved = [(k, getattr(tconfig, k)) for k, _ in knobs]
        for k, v in knobs:
            setattr(tconfig, k, v)
        try:
            jax.clear_caches()
            from tpurt.render.renderer import _mega_flat_start, _mega_statics

            statics = _mega_statics(cfg_leg, cfg_leg.width, cfg_leg.height)
            coords = jnp.asarray([0, 0, 0, CAP], jnp.int32)
            p = cfg_leg.pixels_per_lane

            def once():
                state, active = _mega_flat_start(
                    scene, cam, coords, batch=LANES, pixels_per_lane=p,
                    **statics)
                return int(active), int(np.asarray(state.iters))

            try:
                for _ in range(2):
                    act, iters = once()
            except Exception as e:
                print(f"[{label}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:250]}", flush=True)
                return None
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                act, iters = once()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            us = best / iters * 1e6
            print(f"[{label}] {best:.3f}s / {iters} iters = "
                  f"{us:.0f} us/iter (active {act})", flush=True)
            return us
        finally:
            for mod, name, _ in patches:
                orig = {"_static_stage": orig_static,
                        "shade_hit_soa": orig_shade,
                        "_body_math": orig_body}[name]
                setattr(mod, name, orig)
            for k, v in saved:
                setattr(tconfig, k, v)

    res = {}
    res["base"] = run_leg("base", cfg)
    res["tail1"] = run_leg(
        "tail1", RenderConfig(**{**base_kw, "mega_tail_passes": 1}))
    res["noexpand"] = run_leg("noexpand", cfg,
                              knobs=[("MEGA_ROOT_EXPAND", False)])
    res["nostatic"] = run_leg("nostatic", cfg,
                              patches=[(mk, "_static_stage", stub_static)])
    res["noshade"] = run_leg("noshade", cfg,
                             patches=[(mk, "shade_hit_soa", stub_shade)])
    res["copybody"] = run_leg("copybody", cfg,
                              patches=[(mk, "_body_math", stub_body)])

    # Gather micro: 4 independent chained 65536-row gathers per
    # fori_loop iteration from the real transposed bank (the exact
    # interleave-4 gather stream, minus the bodies they overlap).
    rows_t = jnp.asarray(scene.mega_rows.T)  # (W, N)
    n_rows = rows_t.shape[1]
    sub = LANES // 4

    def g_body(_, idxs):
        out = []
        for j in range(4):
            r = rows_t[:, idxs[j]]  # (W, sub)
            nxt = (jax.lax.bitcast_convert_type(r[7], jnp.uint32)
                   % np.uint32(n_rows)).astype(jnp.int32)
            out.append(nxt)
        return tuple(out)

    @jax.jit
    def g_run(seed):
        idx0 = tuple(
            (seed + jnp.arange(sub, dtype=jnp.int32) * (j + 1)) % n_rows
            for j in range(4)
        )
        return jax.lax.fori_loop(0, CAP, g_body, idx0)[0]

    for _ in range(2):
        np.asarray(g_run(jnp.int32(1)))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g_run(jnp.int32(1)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    res["gather4x"] = best / CAP * 1e6
    print(f"[gather4x] {best:.3f}s / {CAP} iters = "
          f"{res['gather4x']:.0f} us/iter (4x{sub} rows)", flush=True)

    print("--- attribution (us/iter) ---")
    b = res.get("base")
    if b:
        for k in ("tail1", "noexpand", "nostatic", "noshade", "copybody"):
            if res.get(k):
                print(f"  base - {k}: {b - res[k]:+.0f}")
        print(f"  gather stream alone: {res['gather4x']:.0f}")


if __name__ == "__main__":
    main()
