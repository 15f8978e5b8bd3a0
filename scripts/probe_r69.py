"""Probe r69 (TPU): K_PAD 32/64 dense dots under HONEST timing.

r51/r52 dismissed smaller contraction paddings under the broken clock.
With the marginal harness: the f32 padded dot is ~10 ms of the ~14 ms
probe-shape sweep (K_PAD=128 pads 10 features 12.8x). If a K=32 dot
lowers at MXU rate, padded flops drop 4x. Legs: full shipped-math
kernels (dots + accept/min epilogue) at K_PAD 128 / 64 / 32.
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
                s2 = jnp.where(jnp.isfinite(s2), s2, jnp.float32(1e-30))
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

    def make(kpad):
        coeffs = jax.random.normal(key, (4, kpad, TPAD), jnp.float32)
        f0 = jax.random.normal(key, (R, kpad), jnp.float32)

        def kernel(s_ref, f_ref, c_ref, ids_ref, entry_ref, cull_ref,
                   orient_ref, lane_ref, t_ref, col_ref, tacc, cacc):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                tacc[...] = jnp.full(tacc.shape, np.float32(np.inf),
                                     jnp.float32)
                cacc[...] = jnp.full(cacc.shape, -1, jnp.int32)

            f = f_ref[...] + s_ref[0]
            planes = [jnp.dot(f, c_ref[k],
                              preferred_element_type=jnp.float32)
                      for k in range(4)]
            epilogue(planes, j, ids_ref[...], entry_ref[...], cull_ref[...],
                     orient_ref[...], lane_ref[...], tacc, cacc)

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                t_ref[...] = tacc[...]
                col_ref[...] = cacc[...]

        call = pl.pallas_call(
            kernel,
            grid=(R // RB, TPAD // TC),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((RB, kpad), lambda i, j: (i, 0)),
                      pl.BlockSpec((4, kpad, TC), lambda i, j: (0, 0, j)),
                      pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                      pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                      pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                      pl.BlockSpec((1, TC), lambda i, j: (0, j)),
                      pl.BlockSpec((RB, 1), lambda i, j: (i, 0))],
            out_specs=[
                pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, 1), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32),
                            pltpu.VMEM((RB, 1), jnp.int32)],
        )

        def run(s, fa):
            t, col = call(s.reshape(1), fa, coeffs, ids, entry, cull,
                          orient, lane_e)
            return t + col.astype(jnp.float32)

        return run, (f0,)

    for kpad in (128, 64, 32):
        run, args = make(kpad)
        marginal(f"K_PAD={kpad}", run, args)


if __name__ == "__main__":
    main()
