"""Probe r45 (TPU): DUAL-CAP marginal per-iteration costs.

probes r42-r44 were polluted: their per-trip numbers were dominated by
the fixed D2H sync of the timing harness (~25-30 ms / 48 trips ~ 600-700
us/trip — even a trivial XLA trip 'measured' 700). This probe times the
SAME executable at two iteration caps and reports the MARGINAL cost
(t_hi - t_lo) / (cap_hi - cap_lo): sync and launch fixed costs cancel.

Legs:
  engine base / tail1 / noexpand / noshade / copybody (via
  _mega_flat_start with a TRACED cap — one executable per leg), plus
  micro legs: gather-only, xla-trivial trip, pallas-identity trip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LANES = 262144


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vm = {"memory_space": pltpu.VMEM}
    except Exception:
        vm = {}
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    from tpurt.config import RenderConfig
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

    def stub_shade(mats, num_meshes, shade, w_valid, w_point, w_normal,
                   w_back, w_mesh, origin, direction, throughput, light,
                   rng, bounces, max_bounces, present=None):
        return sh.ShadeResultSoA(
            origin=w_point, direction=direction, throughput=throughput,
            light=light, rng=rng, bounces=bounces + 1,
            continuing=mk._bool_full(rng.shape, True),
            invisible=mk._bool_full(rng.shape, False),
        )

    def stub_body(s, col, srows, mats, params, slot_rays, frame_index,
                  sample_offset, primary_ray_fn, **kw):
        seg = s.segments + 1
        if col is not None:
            seg = seg + (col(0) > np.float32(1e30)).astype(jnp.int32)
        return s._replace(segments=seg)

    def marginal_engine(label, cfg_leg, lo, hi, patches=()):
        for mod, name, val in patches:
            setattr(mod, name, val)
        try:
            jax.clear_caches()
            from tpurt.render.renderer import _mega_flat_start, _mega_statics

            statics = _mega_statics(cfg_leg, cfg_leg.width, cfg_leg.height)
            p = cfg_leg.pixels_per_lane

            def once(cap):
                coords = jnp.asarray([0, 0, 0, cap], jnp.int32)
                state, active = _mega_flat_start(
                    scene, cam, coords, batch=LANES, pixels_per_lane=p,
                    **statics)
                return int(active), int(np.asarray(state.iters))

            try:
                for cap in (lo, hi):
                    once(cap)
                    once(cap)
            except Exception as e:
                print(f"[{label}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:250]}", flush=True)
                return None
            ts = {}
            for cap in (lo, hi, lo, hi, lo, hi):
                t0 = time.perf_counter()
                act, iters = once(cap)
                dt = time.perf_counter() - t0
                key = cap
                ts.setdefault(key, []).append((dt, iters))
            tl = min(ts[lo])[0]
            il = min(ts[lo])[1]
            th = min(ts[hi])[0]
            ih = min(ts[hi])[1]
            us = (th - tl) / (ih - il) * 1e6
            print(f"[{label}] marginal {us:.0f} us/iter "
                  f"({tl*1e3:.0f}ms@{il} -> {th*1e3:.0f}ms@{ih})",
                  flush=True)
            return us
        finally:
            for mod, name, _ in patches:
                orig = {"_static_stage": orig_static,
                        "shade_hit_soa": orig_shade,
                        "_body_math": orig_body}[name]
                setattr(mod, name, orig)

    res = {}
    res["base"] = marginal_engine("base", cfg, 24, 64)
    res["tail1"] = marginal_engine(
        "tail1", RenderConfig(**{**base_kw, "mega_tail_passes": 1}), 24, 64)
    res["noshade"] = marginal_engine(
        "noshade", cfg, 48, 192,
        patches=[(mk, "shade_hit_soa", stub_shade)])
    res["copybody"] = marginal_engine(
        "copybody", cfg, 48, 480,
        patches=[(mk, "_body_math", stub_body)])

    # --- micro legs (fori_loop with traced cap, dual-cap) -------------
    def marginal_micro(label, run, lo, hi):
        f = jax.jit(run)
        for cap in (lo, hi):
            out = f(jnp.int32(cap))
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        ts = {}
        for cap in (lo, hi, lo, hi, lo, hi):
            t0 = time.perf_counter()
            out = f(jnp.int32(cap))
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            dt = time.perf_counter() - t0
            ts.setdefault(cap, []).append(dt)
        us = (min(ts[hi]) - min(ts[lo])) / (hi - lo) * 1e6
        print(f"[{label}] marginal {us:.0f} us/iter", flush=True)
        return us

    rows_t = jnp.asarray(scene.mega_rows.T)
    n_rows = rows_t.shape[1]
    sub = LANES // 4

    def g_run(cap):
        def g_body(_, idxs):
            out = []
            for j in range(4):
                r = rows_t[:, idxs[j]]
                nxt = (lax.bitcast_convert_type(r[7], jnp.uint32)
                       % np.uint32(n_rows)).astype(jnp.int32)
                out.append(nxt)
            return tuple(out)

        idx0 = tuple(
            (jnp.arange(sub, dtype=jnp.int32) * (j + 1)) % n_rows
            for j in range(4)
        )
        return lax.while_loop(
            lambda c: c[0] < cap,
            lambda c: (c[0] + 1, g_body(0, c[1])),
            (jnp.int32(0), idx0),
        )[1]

    res["gather4x65k"] = marginal_micro("gather 4x65k", g_run, 48, 480)

    L = 16

    def xla_run(cap):
        def body(c):
            i, leaves = c
            return (i + 1, tuple(x + 1.0 for x in leaves))

        leaves = tuple(jnp.zeros((LANES // 4 // 128, 128), jnp.float32)
                       for _ in range(L))
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), leaves))[1]

    res["xla_trip"] = marginal_micro("xla trivial trip 16x64k", xla_run,
                                     48, 480)

    subl = 4096 // 128

    def kernel(*refs):
        ins, outs = refs[:L], refs[L:]
        for i, o in zip(ins, outs):
            o[...] = i[...] + 1.0

    call = pl.pallas_call(
        kernel,
        grid=(sub // 4096,),
        in_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                  for _ in range(L)],
        out_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                   for _ in range(L)],
        out_shape=[jax.ShapeDtypeStruct((sub // 128, 128), jnp.float32)
                   for _ in range(L)],
    )

    def pl_run(cap):
        def body(c):
            i, leaves = c
            return (i + 1, tuple(call(*leaves)))

        leaves = tuple(jnp.zeros((sub // 128, 128), jnp.float32)
                       for _ in range(L))
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), leaves))[1]

    res["pallas_id"] = marginal_micro("pallas identity 16x64k", pl_run,
                                      48, 480)

    def pl4_run(cap):
        def body(c):
            i, chains = c
            return (i + 1, tuple(tuple(call(*ch)) for ch in chains))

        chains = tuple(
            tuple(jnp.zeros((sub // 128, 128), jnp.float32)
                  for _ in range(L))
            for _ in range(4)
        )
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), chains))[1]

    res["pallas_id_x4"] = marginal_micro("pallas identity 4 chains x 64k",
                                         pl4_run, 48, 480)

    print("--- marginal us/iter summary ---")
    for k, v in res.items():
        print(f"  {k}: {v if v is None else round(v)}")


if __name__ == "__main__":
    main()
