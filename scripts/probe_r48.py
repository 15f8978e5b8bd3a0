"""Probe r48 (TPU): is a Mosaic custom call a scheduling BARRIER for
in-flight gather DMAs?

r47 found dependent-chain gathers run 651 us/65k rows while FOUR
independent chains run 1014 us total (heavy DMA-level overlap between
gathers), matching the engine's measured in-engine gather cost. So the
engine's 4 interleaved gather streams already overlap EACH OTHER —
what they do not overlap is the Pallas bodies (r46: fully additive).
This probe prices gather + an EXPENSIVE pallas call (~500us) in three
structures to find whether the custom call is the barrier:

  g4       4 indep gather chains, no pallas       (anchor ~1014)
  p        expensive pallas chain alone           (anchor ~500)
  g4+p     pallas chain independent of gathers    (max => no barrier)
  il4      engine structure: g_j then body_j(x4), body consumes rows
           and produces next idx (the real dependency shape)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 65536
W = 160
N = 16384


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

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (W, N), jnp.float32)
    idx0 = jnp.arange(R, dtype=jnp.int32) * 7 % N

    BL = 8192
    FLOP_REPS = 600  # ~ (R*4ops*REPS) flops ~ 157 MFLOP ~ 0.3-0.6 ms on VPU

    def flop_kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(FLOP_REPS):
            x = x * np.float32(1.000001) + np.float32(1e-6)
            x = jnp.maximum(x - np.float32(2e-6), x * np.float32(0.999))
        o_ref[...] = x

    flop_call = pl.pallas_call(
        flop_kernel,
        grid=(R // BL,),
        in_specs=[pl.BlockSpec((BL // 128, 128), lambda i: (i, 0), **vm)],
        out_specs=pl.BlockSpec((BL // 128, 128), lambda i: (i, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((R // 128, 128), jnp.float32),
    )
    x0 = jax.random.normal(key, (R // 128, 128), jnp.float32)

    # Engine-shaped body: consumes the FULL (W, R) rows (sum over W) and
    # produces the next index per lane — the body->gather dependency.
    def body_kernel(rows_ref, idx_ref, o_idx_ref, o_acc_ref):
        rows = rows_ref[...]
        acc = jnp.zeros_like(rows[0:1])
        for w in range(W):
            acc = acc + rows[w:w + 1] * np.float32(1.0 / (w + 1))
        nxt = (idx_ref[...] * 1103515245 + 12345) % N
        o_idx_ref[...] = nxt
        o_acc_ref[...] = acc

    def make_body_call():
        return pl.pallas_call(
            body_kernel,
            grid=(R // BL,),
            in_specs=[
                pl.BlockSpec((W, BL), lambda i: (0, i), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_specs=[
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, R), jnp.int32),
                jax.ShapeDtypeStruct((1, R), jnp.float32),
            ],
        )

    body_call = make_body_call()

    def marginal(label, run, lo=48, hi=240):
        f = jax.jit(run)
        for cap in (lo, hi):
            out = f(jnp.int32(cap))
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        ts = {}
        for cap in (lo, hi, lo, hi, lo, hi):
            t0 = time.perf_counter()
            out = f(jnp.int32(cap))
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            ts.setdefault(cap, []).append(time.perf_counter() - t0)
        us = (min(ts[hi]) - min(ts[lo])) / (hi - lo) * 1e6
        print(f"[{label}] marginal {us:.0f} us/iter", flush=True)
        return us

    def nxt(rows):
        return (lax.bitcast_convert_type(rows[7], jnp.uint32)
                % np.uint32(N)).astype(jnp.int32)

    def g4_run(cap):
        def body(c):
            i, idxs = c
            return (i + 1, tuple(nxt(table[:, ix]) for ix in idxs))
        i4 = tuple((idx0 + 3 * j) % N for j in range(4))
        return lax.while_loop(lambda c: c[0] < cap, body, (jnp.int32(0), i4))

    def p_run(cap):
        def body(c):
            i, x = c
            return (i + 1, flop_call(x))
        return lax.while_loop(lambda c: c[0] < cap, body, (jnp.int32(0), x0))

    def g4p_run(cap):
        def body(c):
            i, idxs, x = c
            idxs = tuple(nxt(table[:, ix]) for ix in idxs)
            x = flop_call(x)
            return (i + 1, idxs, x)
        i4 = tuple((idx0 + 3 * j) % N for j in range(4))
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), i4, x0))

    def il4_run(cap):
        def body(c):
            i, idxs = c
            out = []
            for j in range(4):
                rows = table[:, idxs[j]]
                ni, _ = body_call(rows.reshape(W, R), idxs[j].reshape(1, R))
                out.append(ni.reshape(R))
            return (i + 1, tuple(out))
        i4 = tuple((idx0 + 3 * j) % N for j in range(4))
        return lax.while_loop(lambda c: c[0] < cap, body, (jnp.int32(0), i4))

    res = {}
    res["g4"] = marginal("4 indep gather chains", g4_run)
    res["p"] = marginal("expensive pallas", p_run)
    res["g4p"] = marginal("4 gathers + indep pallas", g4p_run)
    res["il4"] = marginal("engine shape: (gather -> body)x4", il4_run)

    print("--- summary ---")
    for k, v in res.items():
        print(f"  {k}: {round(v)}")
    print(f"  g4p serial-sum {res['g4'] + res['p']:.0f} "
          f"vs overlap-max {max(res['g4'], res['p']):.0f}")


if __name__ == "__main__":
    main()
