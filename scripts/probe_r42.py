"""Probe r42 (TPU): decompose the ~2 ms/iter pallas-boundary glue.

probe_r41 measured: base 3738 us/iter, body-compute only ~750, gather
~1000 — leaving ~2000 us/iter of "glue". Hypothesis: the per-call
boundary work in mega_pallas.call — ~110 state leaves x (reshape (R,)
-> (R/128, 128) + bool<->u32 converts) x in+out — materialises as
unfusable copies around the custom call (XLA cannot fuse into a
custom-call operand), costing real HBM round trips + dispatch each.

Legs (65536 lanes, 4096-lane blocks, fori_loop of 48 iterations, one
identity pallas kernel per iteration; x4 would mirror interleave):
  A flat110: 110 (R,) f32 leaves (8 carried as bool), per-iter prep
             (astype+reshape) + pallas copy + unprep — today's boundary.
  B shaped110: the same 110 leaves pre-shaped (R/128, 128), bools as
             u32, no per-iter reshapes/converts.
  C shaped40: leg B with 40 leaves (a slimmed state).
  D gather+shaped110: leg B plus one 65536-row gather per iteration
             (the real per-sub-batch iteration's shape).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 65536
BLOCK = 4096
CAP = 48
N_F32 = 102
N_BOOL = 8


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

    subl = BLOCK // 128
    grid = R // BLOCK

    def pallas_copy(n):
        def kernel(*refs):
            ins, outs = refs[:n], refs[n:]
            for i, o in zip(ins, outs):
                v = i[...]
                o[...] = v + (1.0 if v.dtype == jnp.float32 else 1)

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                      for _ in range(n)],
            out_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                       for _ in range(n)],
            out_shape=[jax.ShapeDtypeStruct((R // 128, 128), jnp.float32)
                       for _ in range(n)],
        )

    def time_fn(label, fn, args):
        jitted = jax.jit(fn)
        for _ in range(2):
            out = jitted(*args)
            jax.tree_util.tree_map(
                lambda a: a.block_until_ready(), out)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = jitted(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best:.3f}s / {CAP} iters = "
              f"{best/CAP*1e6:.0f} us/iter", flush=True)
        return best / CAP * 1e6

    # ---- leg A: today's boundary (flat state, bools, per-iter prep) ----
    call_a = pallas_copy(N_F32 + N_BOOL)

    def body_a(_, leaves):
        f32s, bools = leaves
        xs = [l.reshape(R // 128, 128) for l in f32s]
        xs += [b.astype(jnp.uint32).astype(jnp.float32).reshape(
            R // 128, 128) for b in bools]
        outs = call_a(*xs)
        f32s2 = tuple(o.reshape(R) for o in outs[:N_F32])
        bools2 = tuple((o.reshape(R) != 0) for o in outs[N_F32:])
        return (f32s2, bools2)

    def run_a():
        f32s = tuple(jnp.zeros((R,), jnp.float32) for _ in range(N_F32))
        bools = tuple(jnp.zeros((R,), bool) for _ in range(N_BOOL))
        return lax.fori_loop(0, CAP, body_a, (f32s, bools))

    a = time_fn("A flat110", run_a, ())

    # ---- leg B: pre-shaped state, u32 bools, zero boundary work -------
    call_b = pallas_copy(N_F32 + N_BOOL)

    def body_b(_, leaves):
        return call_b(*leaves)

    def run_b():
        leaves = tuple(jnp.zeros((R // 128, 128), jnp.float32)
                       for _ in range(N_F32 + N_BOOL))
        return lax.fori_loop(0, CAP, body_b, tuple(leaves))

    b = time_fn("B shaped110", run_b, ())

    # ---- leg C: shaped, 40 leaves --------------------------------------
    call_c = pallas_copy(40)

    def body_c(_, leaves):
        return call_c(*leaves)

    def run_c():
        leaves = tuple(jnp.zeros((R // 128, 128), jnp.float32)
                       for _ in range(40))
        return lax.fori_loop(0, CAP, body_c, tuple(leaves))

    c = time_fn("C shaped40", run_c, ())

    # ---- leg D: shaped 110 + one real-width row gather per iter --------
    rows_t = jnp.asarray(
        np.random.rand(160, 16384).astype(np.float32))
    call_d = pallas_copy(N_F32 + N_BOOL + 1)

    def body_d(_, carry):
        leaves, idx = carry
        rowt = rows_t[:, idx]  # (W, R)
        row0 = rowt[0].reshape(R // 128, 128)
        outs = call_d(*(leaves + (row0,)))
        nidx = (lax.bitcast_convert_type(outs[-1].reshape(R), jnp.uint32)
                % np.uint32(16384)).astype(jnp.int32)
        return (outs[:-1], nidx)

    def run_d():
        leaves = tuple(jnp.zeros((R // 128, 128), jnp.float32)
                       for _ in range(N_F32 + N_BOOL))
        idx = jnp.arange(R, dtype=jnp.int32) % 16384
        return lax.fori_loop(0, CAP, body_d, (leaves, idx))

    d = time_fn("D shaped110+gather", run_d, ())

    print("--- summary (us/iter, ONE 65536-lane sub-batch) ---")
    print(f"A flat-boundary {a:.0f} | B shaped {b:.0f} | "
          f"C shaped40 {c:.0f} | D shaped+gather {d:.0f}")
    print(f"boundary glue (A-B): {a-b:.0f} us/iter/sub  "
          f"(x4 subs = {(a-b)*4:.0f} of the frame's per-iter cost)")


if __name__ == "__main__":
    main()
