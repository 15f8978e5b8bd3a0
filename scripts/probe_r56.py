"""Probe r56 (TPU): honest re-attribution of the dense-sweep cost.

probe_r53's first runs were invalid twice over (block_until_ready
returns early on axon; an out*0 chain dependency constant-folds and
XLA CSEs the chain to one call). With a non-foldable fori_loop chain
and dual-k marginals, the pure fused dot measures ~140-200 TF/s — so
the r52-era "Mosaic dot is 4.6x slow" attribution is suspect, and the
teapot row's 37 ms/iter must be priced again, structurally:

  dot4     four (256,128)@(128,1024) f32 dots + sum  — the SHIPPED
           kernel's dot structure
  dot1     one (256,128)@(128,4096) fused dot + sum  — r53's shape
  epi4     dot4 + the FULL shipped accept/min/winner epilogue
           (transcribed from plucker_fused._sweep_kernel)
  epi1     one fused dot, planes sliced, same epilogue
  ship     the shipped sweep_entry_local itself, synthetic rays
  ship-bf16c  shipped kernel with bf16 COEFFS (f32 feats upcast) if it
           lowers — the cheap-memory variant

All legs: R=131072 rays, TPAD=7168 tris (teapot-class), marginal cost
per call from a traced-count fori_loop chain at k=3 vs k=9.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 131072
TPAD = 7168
RB = 256
TC = 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpurt.config import EPSILON

    key = jax.random.PRNGKey(0)
    pairs = R * TPAD
    flops = pairs * 1024.0  # padded K=128 x 4 planes x 2

    def marginal(label, run, args, reps=5, unit_pairs=True):
        def chain(k, *a):
            def body(_, carry):
                seed, out = carry
                o = run(seed, *a)
                s2 = (jnp.sum(o) * np.float32(1e-30)).astype(jnp.float32)
                return seed + s2, o

            _, out = lax.fori_loop(
                0, k, body, (jnp.float32(0.0), run(jnp.float32(0.0), *a))
            )
            return jnp.sum(out)

        try:
            f = jax.jit(chain)
            for _ in range(2):
                float(f(3, *args))
                float(f(9, *args))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:200]}", flush=True)
            return
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(3, *args))
            t1 = time.perf_counter()
            float(f(9, *args))
            t2 = time.perf_counter()
            d = ((t2 - t1) - (t1 - t0)) / 6.0
            best = d if best is None else min(best, d)
        extra = (f"  {pairs/best/1e9:.1f} Gpairs/s  {flops/best/1e12:.1f} TF/s"
                 if unit_pairs else "")
        print(f"[{label}] {best*1e3:.2f} ms/call{extra}", flush=True)

    feats = jax.random.normal(key, (R, 128), jnp.float32)
    cfull = jax.random.normal(key, (128, 4 * TPAD), jnp.float32)
    c4 = cfull.reshape(128, 4, TPAD).transpose(1, 0, 2).copy()  # (4,128,T)

    # ---- dot-only legs ----
    def make_dots(fused):
        if fused:
            def kernel(s_ref, f_ref, c_ref, o_ref, acc):
                j = pl.program_id(1)

                @pl.when(j == 0)
                def _():
                    acc[...] = jnp.zeros_like(acc)

                f = f_ref[...] + s_ref[0]
                planes = jnp.dot(f, c_ref[...],
                                 preferred_element_type=jnp.float32)
                acc[...] += jnp.sum(planes, axis=1, keepdims=True)

                @pl.when(j == pl.num_programs(1) - 1)
                def _():
                    o_ref[...] = acc[...]

            call = pl.pallas_call(
                kernel,
                grid=(R // RB, TPAD // TC),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((RB, 128), lambda i, j: (i, 0)),
                    pl.BlockSpec((128, 4 * TC), lambda i, j: (0, j)),
                ],
                out_specs=pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32)],
            )
            cf = cfull.reshape(128, TPAD // TC, 4 * TC)  # wrong col order,
            # fine for timing: same op shapes/bytes
            return lambda s, f, c: call(s.reshape(1), f, c), (
                feats, cf.reshape(128, 4 * TC * (TPAD // TC)))
        else:
            def kernel(s_ref, f_ref, c_ref, o_ref, acc):
                j = pl.program_id(1)

                @pl.when(j == 0)
                def _():
                    acc[...] = jnp.zeros_like(acc)

                f = f_ref[...] + s_ref[0]
                tot = None
                for k in range(4):
                    p = jnp.dot(f, c_ref[k],
                                preferred_element_type=jnp.float32)
                    ps = jnp.sum(p, axis=1, keepdims=True)
                    tot = ps if tot is None else tot + ps
                acc[...] += tot

                @pl.when(j == pl.num_programs(1) - 1)
                def _():
                    o_ref[...] = acc[...]

            call = pl.pallas_call(
                kernel,
                grid=(R // RB, TPAD // TC),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((RB, 128), lambda i, j: (i, 0)),
                    pl.BlockSpec((4, 128, TC), lambda i, j: (0, 0, j)),
                ],
                out_specs=pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32)],
            )
            return lambda s, f, c: call(s.reshape(1), f, c), (feats, c4)

    run, args = make_dots(fused=False)
    marginal("dot4 (shipped structure)", run, args)
    run, args = make_dots(fused=True)
    marginal("dot1 (fused columns)", run, args)

    # ---- full-epilogue legs ----
    ids = jnp.ones((1, TPAD), jnp.int32)
    entry = jnp.zeros((1, TPAD), jnp.int32)
    cull = jnp.zeros((1, TPAD), jnp.float32)
    orient = jnp.ones((1, TPAD), jnp.float32)
    lane_e = jnp.zeros((R, 1), jnp.int32)
    eps = np.float32(EPSILON)

    def epilogue(det, u_num, v_num, t_num, j, ids_b, entry_b, cull_b,
                 orient_b, lane_b, tacc, cacc):
        f = 1.0 / det
        u = f * u_num
        v = f * v_num
        t = f * t_num
        ok = jnp.abs(det) >= eps
        ok &= (u >= 0.0) & (u <= 1.0)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        ok &= t > eps
        ok &= ids_b >= 0
        ok &= entry_b == lane_b
        backface = det * orient_b < 0.0
        ok &= ~((cull_b != 0.0) & backface)
        t = jnp.where(ok, t, np.float32(np.inf))
        t_min = jnp.min(t, axis=1, keepdims=True)
        ncols = t.shape[1]
        col_iota = lax.broadcasted_iota(jnp.int32, (1, ncols), 1) \
            + j * jnp.int32(ncols)
        big = jnp.int32(2**30)
        col_min = jnp.min(
            jnp.where((t == t_min) & ok,
                      jnp.broadcast_to(col_iota, t.shape), big),
            axis=1, keepdims=True,
        )
        closer = (t_min < tacc[...]) & (col_min < big)
        tacc[...] = jnp.where(closer, t_min, tacc[...])
        cacc[...] = jnp.where(closer, col_min, cacc[...])

    def make_epi(fused):
        def kernel(s_ref, f_ref, c_ref, ids_ref, entry_ref, cull_ref,
                   orient_ref, lane_ref, t_ref, col_ref, tacc, cacc):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                tacc[...] = jnp.full(tacc.shape, np.float32(np.inf),
                                     jnp.float32)
                cacc[...] = jnp.full(cacc.shape, -1, jnp.int32)

            f = f_ref[...] + s_ref[0]
            if fused:
                planes = jnp.dot(f, c_ref[...],
                                 preferred_element_type=jnp.float32)
                det = planes[:, 0 * TC:1 * TC]
                u_num = planes[:, 1 * TC:2 * TC]
                v_num = planes[:, 2 * TC:3 * TC]
                t_num = planes[:, 3 * TC:4 * TC]
            else:
                det, u_num, v_num, t_num = [
                    jnp.dot(f, c_ref[k], preferred_element_type=jnp.float32)
                    for k in range(4)
                ]
            epilogue(det, u_num, v_num, t_num, j, ids_ref[...],
                     entry_ref[...], cull_ref[...], orient_ref[...],
                     lane_ref[...], tacc, cacc)

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                t_ref[...] = tacc[...]
                col_ref[...] = cacc[...]

        cspec = (
            pl.BlockSpec((128, 4 * TC), lambda i, j: (0, j)) if fused
            else pl.BlockSpec((4, 128, TC), lambda i, j: (0, 0, j))
        )
        call = pl.pallas_call(
            kernel,
            grid=(R // RB, TPAD // TC),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((RB, 128), lambda i, j: (i, 0)),
                cspec,
                pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((RB, 1), jnp.float32),
                pltpu.VMEM((RB, 1), jnp.int32),
            ],
        )
        # interleave the 4 plane groups column-wise for the fused form:
        # [det cols | u cols | v cols | t cols] per TC chunk
        if fused:
            cf = jnp.concatenate(
                [c4[k].reshape(128, TPAD // TC, TC) for k in range(4)],
                axis=2,
            ).reshape(128, (TPAD // TC) * 4 * TC)
        else:
            cf = c4

        def run(s, f, c):
            t, col = call(s.reshape(1), f, c, ids, entry, cull, orient,
                          lane_e)
            return t + col.astype(jnp.float32)

        return run, (feats, cf)

    run, args = make_epi(fused=False)
    marginal("epi4 (shipped math)", run, args)
    run, args = make_epi(fused=True)
    marginal("epi1 (fused dot + slice)", run, args)

    # ---- the shipped kernel itself ----
    from tpurt.core.v3 import V3
    from tpurt.render.plucker_fused import FusedDenseTable, sweep_entry_local

    coeffs = jax.random.normal(key, (4, 128, TPAD), jnp.float32)
    table = FusedDenseTable(
        coeffs=coeffs, ids=ids, owner=entry, entry=entry, cull=cull,
        orient=orient, count=TPAD,
    )
    lo = V3(jax.random.normal(key, (R,)), jax.random.normal(key, (R,)),
            jax.random.normal(key, (R,)))
    ld = V3(jnp.ones((R,)), jnp.ones((R,)), jnp.ones((R,)))
    lane = jnp.zeros((R,), jnp.int32)

    def run_ship(s, lox):
        t, col = sweep_entry_local(
            lo._replace(x=lox + s), ld, lane, table, interpret=False
        )
        return t + col.astype(jnp.float32)

    marginal("ship (sweep_entry_local)", run_ship, (lo.x,))


if __name__ == "__main__":
    main()
