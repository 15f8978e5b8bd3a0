"""Probe r57 (TPU): kill the dense sweep's XLA feats prep.

r56 attribution at R=131072 x TPAD=7168: shipped sweep_entry_local
13.31 ms/call vs 5.66 for the identical in-kernel math fed pre-built
feats — the difference is the per-call XLA prep (stack 10 components,
pad to (R,128): a ~64 MB HBM write + read). Legs try the lowerable way
to build the (RB,128) feats tile INSIDE the kernel:

  A ship      anchor: current sweep_entry_local
  B feats16   host passes (R,16) (3 MB); kernel widens via jnp.pad
  C comps     host passes lo/ld as 6 (R,1) operands; kernel computes
              w = cross in-VMEM and assembles a (RB,128) scratch via
              sliced stores when the tri index j==0 (reused across j)
  D epi4      anchor: pre-built feats, no prep (r56's 5.66)

Winner ships in render/plucker_fused.py.
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
    eps = np.float32(EPSILON)

    def marginal(label, run, args, reps=5):
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
        print(f"[{label}] {best*1e3:.2f} ms/call  {pairs/best/1e9:.1f} "
              f"Gpairs/s", flush=True)

    ids = jnp.ones((1, TPAD), jnp.int32)
    entry = jnp.zeros((1, TPAD), jnp.int32)
    cull = jnp.zeros((1, TPAD), jnp.float32)
    orient = jnp.ones((1, TPAD), jnp.float32)
    lane_e = jnp.zeros((R, 1), jnp.int32)
    coeffs = jax.random.normal(key, (4, 128, TPAD), jnp.float32)
    lo = [jax.random.normal(key, (R,)) for _ in range(3)]
    ld = [jax.random.normal(key, (R,)) for _ in range(3)]

    def epilogue(planes, j, ids_b, entry_b, cull_b, orient_b, lane_b,
                 tacc, cacc):
        det, u_num, v_num, t_num = planes
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

    common_tri_specs = [
        pl.BlockSpec((4, 128, TC), lambda i, j: (0, 0, j)),
        pl.BlockSpec((1, TC), lambda i, j: (0, j)),
        pl.BlockSpec((1, TC), lambda i, j: (0, j)),
        pl.BlockSpec((1, TC), lambda i, j: (0, j)),
        pl.BlockSpec((1, TC), lambda i, j: (0, j)),
        pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
    ]
    outs = dict(
        out_specs=[
            pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
    )

    # ---- A: shipped anchor ----
    from tpurt.core.v3 import V3
    from tpurt.render.plucker_fused import FusedDenseTable, sweep_entry_local

    table = FusedDenseTable(coeffs=coeffs, ids=ids, owner=entry, entry=entry,
                            cull=cull, orient=orient, count=TPAD)
    loV = V3(*lo)
    ldV = V3(*ld)
    lane = jnp.zeros((R,), jnp.int32)

    def run_ship(s, lox):
        t, col = sweep_entry_local(
            loV._replace(x=lox + s), ldV, lane, table, interpret=False
        )
        return t + col.astype(jnp.float32)

    marginal("A ship", run_ship, (lo[0],))

    # ---- B: (R,16) host feats, in-kernel pad ----
    wx = ld[1] * lo[2] - ld[2] * lo[1]
    wy = ld[2] * lo[0] - ld[0] * lo[2]
    wz = ld[0] * lo[1] - ld[1] * lo[0]
    one = jnp.ones((R,), jnp.float32)
    f16 = jnp.stack(ld + [wx, wy, wz] + lo + [one], axis=1)
    f16 = jnp.pad(f16, ((0, 0), (0, 6)))  # (R, 16)

    def kernel_b(s_ref, f_ref, c_ref, ids_ref, entry_ref, cull_ref,
                 orient_ref, lane_ref, t_ref, col_ref, tacc, cacc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            tacc[...] = jnp.full(tacc.shape, np.float32(np.inf), jnp.float32)
            cacc[...] = jnp.full(cacc.shape, -1, jnp.int32)

        f = jnp.pad(f_ref[...] + s_ref[0], ((0, 0), (0, 112)))
        planes = [jnp.dot(f, c_ref[k], preferred_element_type=jnp.float32)
                  for k in range(4)]
        epilogue(planes, j, ids_ref[...], entry_ref[...], cull_ref[...],
                 orient_ref[...], lane_ref[...], tacc, cacc)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            t_ref[...] = tacc[...]
            col_ref[...] = cacc[...]

    call_b = pl.pallas_call(
        kernel_b,
        grid=(R // RB, TPAD // TC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((RB, 16), lambda i, j: (i, 0))]
        + common_tri_specs,
        scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32),
                        pltpu.VMEM((RB, 1), jnp.int32)],
        **outs,
    )

    def run_b(s, f):
        t, col = call_b(s.reshape(1), f, coeffs, ids, entry, cull, orient,
                        lane_e)
        return t + col.astype(jnp.float32)

    marginal("B feats16 in-kernel pad", run_b, (f16,))

    # ---- C: 6 component operands, in-kernel assembly ----
    def kernel_c(s_ref, lox, loy, loz, ldx, ldy, ldz, c_ref, ids_ref,
                 entry_ref, cull_ref, orient_ref, lane_ref, t_ref, col_ref,
                 fz, tacc, cacc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            tacc[...] = jnp.full(tacc.shape, np.float32(np.inf), jnp.float32)
            cacc[...] = jnp.full(cacc.shape, -1, jnp.int32)
            ox = lox[...] + s_ref[0]
            oy = loy[...]
            oz = loz[...]
            dx = ldx[...]
            dy = ldy[...]
            dz = ldz[...]
            z = jnp.zeros((RB, 128), jnp.float32)
            fz[...] = z
            fz[:, 0:1] = dx
            fz[:, 1:2] = dy
            fz[:, 2:3] = dz
            fz[:, 3:4] = dy * oz - dz * oy
            fz[:, 4:5] = dz * ox - dx * oz
            fz[:, 5:6] = dx * oy - dy * ox
            fz[:, 6:7] = ox
            fz[:, 7:8] = oy
            fz[:, 8:9] = oz
            fz[:, 9:10] = jnp.ones((RB, 1), jnp.float32)

        f = fz[...]
        planes = [jnp.dot(f, c_ref[k], preferred_element_type=jnp.float32)
                  for k in range(4)]
        epilogue(planes, j, ids_ref[...], entry_ref[...], cull_ref[...],
                 orient_ref[...], lane_ref[...], tacc, cacc)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            t_ref[...] = tacc[...]
            col_ref[...] = cacc[...]

    comp_spec = pl.BlockSpec((RB, 1), lambda i, j: (i, 0))
    call_c = pl.pallas_call(
        kernel_c,
        grid=(R // RB, TPAD // TC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [comp_spec] * 6 + common_tri_specs,
        scratch_shapes=[pltpu.VMEM((RB, 128), jnp.float32),
                        pltpu.VMEM((RB, 1), jnp.float32),
                        pltpu.VMEM((RB, 1), jnp.int32)],
        **outs,
    )
    comps = [a.reshape(R, 1) for a in lo + ld]

    def run_c(s, lox, *rest):
        t, col = call_c(s.reshape(1), lox, *rest, coeffs, ids, entry, cull,
                        orient, lane_e)
        return t + col.astype(jnp.float32)

    marginal("C comps in-kernel assembly", run_c, tuple(comps))

    # ---- D: pre-built feats anchor ----
    f128 = jnp.pad(f16, ((0, 0), (0, 112)))

    def kernel_d(s_ref, f_ref, c_ref, ids_ref, entry_ref, cull_ref,
                 orient_ref, lane_ref, t_ref, col_ref, tacc, cacc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            tacc[...] = jnp.full(tacc.shape, np.float32(np.inf), jnp.float32)
            cacc[...] = jnp.full(cacc.shape, -1, jnp.int32)

        f = f_ref[...] + s_ref[0]
        planes = [jnp.dot(f, c_ref[k], preferred_element_type=jnp.float32)
                  for k in range(4)]
        epilogue(planes, j, ids_ref[...], entry_ref[...], cull_ref[...],
                 orient_ref[...], lane_ref[...], tacc, cacc)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            t_ref[...] = tacc[...]
            col_ref[...] = cacc[...]

    call_d = pl.pallas_call(
        kernel_d,
        grid=(R // RB, TPAD // TC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((RB, 128), lambda i, j: (i, 0))]
        + common_tri_specs,
        scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32),
                        pltpu.VMEM((RB, 1), jnp.int32)],
        **outs,
    )

    def run_d(s, f):
        t, col = call_d(s.reshape(1), f, coeffs, ids, entry, cull, orient,
                        lane_e)
        return t + col.astype(jnp.float32)

    marginal("D prebuilt feats anchor", run_d, (f128,))


if __name__ == "__main__":
    main()
