"""Probe r53 (TPU): why does the dense-sweep's Mosaic f32 dot run at
~17 TFLOP/s when XLA's K=128 f32 dot measures ~80 (r52: the dots are
56 of the 62 ms; epilogue only ~7)?

Pure-dot microkernels (sum-fold epilogue only), teapot-class totals
(R=131072 x TPAD=7168 pairs, 963 GFLOP padded). Grid is (rays, tris)
with tris FASTEST so the per-ray-block VMEM accumulator is sound
(consecutive steps share the block); r51 showed the resulting coeff
re-streaming costs ~nothing next to the dot itself.
  rb256    (256,128)@(128,4096) fused planes   — r51/r52 shape anchor
  rb512    (512,128)@(128,4096)                — M scaling
  rb1024   (1024,128)@(128,2048), TC=512       — M scaling, VMEM-safe
  tlhs     dot_general contracting dim 0 of a PRE-TRANSPOSED (128,256)
           LHS (skips any in-kernel relayout of the M-major LHS)
  xla      the same fused dot in plain XLA — the ~80 TF/s anchor
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 131072
TPAD = 7168


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (R, 128), jnp.float32)
    featsT = feats.T.copy()                        # (128, R)
    cfull = jax.random.normal(key, (128, 4 * TPAD), jnp.float32)
    flops = R * TPAD * 1024.0

    def timeit(label, fn, args, reps=6):
        """Dual-rep marginal timing ending in host materialisation:
        block_until_ready can return before work drains on axon, and a
        scalar D2H costs a fixed ~25 ms tunnel RTT — so time an in-jit
        chain of k calls (data-dependent, no reordering) at two k's and
        report (t_hi - t_lo) / dk per call; sync and dispatch cancel."""

        # fori_loop with a TRACED trip count: one executable serves both
        # k's (chaining k separate pallas_calls re-invokes the remote
        # Mosaic compile per instance — minutes each over the tunnel).
        def run(k, f0, *rest):
            def body(_, carry):
                f0c, out = carry
                # (R,1) broadcasts over the feature dim. The tiny
                # non-zero factor keeps a REAL data dependency: out*0
                # constant-folds and lets XLA CSE the whole chain into
                # one call (observed: a ~zero marginal on one leg).
                dep = (out * np.float32(1e-35)).astype(f0c.dtype)
                nxt = fn(f0c + dep, *rest)
                return f0c, nxt

            out0 = jnp.zeros((f0.shape[0], 1), jnp.float32)
            _, out = lax.fori_loop(0, k, body, (f0, out0))
            return jnp.sum(out)

        k_lo, k_hi = 3, 9
        try:
            f = jax.jit(run)
            for _ in range(2):
                float(f(k_lo, *args))
                float(f(k_hi, *args))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            return
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(k_lo, *args))
            t1 = time.perf_counter()
            float(f(k_hi, *args))
            t2 = time.perf_counter()
            d = ((t2 - t1) - (t1 - t0)) / (k_hi - k_lo)
            best = d if best is None else min(best, d)
        print(f"[{label}] {best*1e3:.2f} ms/call -> {flops/best/1e12:.1f} TF/s",
              flush=True)

    def make(rb, tc, tlhs=False):
        n4 = 4 * tc
        nch = 4 * TPAD // n4

        def kernel(f_ref, c_ref, o_ref, acc_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            if tlhs:
                planes = lax.dot_general(
                    f_ref[...], c_ref[...],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                planes = jnp.dot(f_ref[...], c_ref[...],
                                 preferred_element_type=jnp.float32)
            acc_ref[...] += jnp.sum(planes, axis=1, keepdims=True)

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc_ref[...]

        return pl.pallas_call(
            kernel,
            grid=(R // rb, nch),
            in_specs=[
                (pl.BlockSpec((128, rb), lambda i, j: (0, i)) if tlhs
                 else pl.BlockSpec((rb, 128), lambda i, j: (i, 0))),
                pl.BlockSpec((128, n4), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((rb, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rb, 1), jnp.float32)],
        )

    timeit("rb256 TC1024", make(256, 1024), (feats, cfull))
    timeit("rb512 TC1024", make(512, 1024), (feats, cfull))
    timeit("rb1024 TC512", make(1024, 512), (feats, cfull))
    timeit("tlhs rb256", make(256, 1024, tlhs=True), (featsT, cfull))

    # bf16 inputs, f32 accumulate (MXU native rate — the candidate fast
    # sweep with exact-f32 winner rescue on the caller side).
    fb = feats.astype(jnp.bfloat16)
    cb = cfull.astype(jnp.bfloat16)
    timeit("rb256 bf16", make(256, 1024), (fb, cb))
    timeit("rb512 bf16", make(512, 1024), (fb, cb))
    timeit("rb1024 bf16 TC512", make(1024, 512), (fb, cb))

    def xla_dot(fts, cf):
        acc = jnp.zeros((R, 1), jnp.float32)
        for j in range(4):
            p = jnp.dot(fts, cf[:, j * TPAD:(j + 1) * TPAD],
                        preferred_element_type=jnp.float32)
            acc += jnp.sum(p, axis=1, keepdims=True)
        return acc

    timeit("xla fused-chunk", xla_dot, (feats, cfull))
    timeit("xla bf16", xla_dot, (fb, cb))


if __name__ == "__main__":
    main()
