"""Probe r47 (TPU): is gather<->Pallas overlap PHYSICALLY possible here?

probe_r46 showed the engine's row gather is fully serial with the
Mosaic body (base - fake == standalone gather). Either (a) the XLA
gather occupies the core (compute-lowered => overlap is impossible and
the lever is shrinking gather WORK), or (b) it is DMA-driven and the
engine's program structure just fails to overlap it (=> the lever is
scheduling). This measures, as dual-cap marginals on micro loops:

  g        chained gather, 65536 rows x W=160        (one stream)
  p        pallas FLOP kernel, ~250us/iter           (no gather)
  g+p ind  both in one while body, NO data deps      (ceiling test)
  g+p dep  gather feeds NEXT iter's pallas (pipeline) (realistic test)
  g+g      two independent 65k gathers               (two-stream anchor)

If g+p(ind) ~= max(g, p): overlap possible -> engineer the schedule.
If g+p(ind) ~= g + p: gather is core compute -> shrink gather work.
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
    table = jax.random.normal(key, (W, N), jnp.float32)  # bank layout (W, N)
    idx0 = jnp.arange(R, dtype=jnp.int32) * 7 % N

    def nxt(rows):
        return (lax.bitcast_convert_type(rows[7], jnp.uint32)
                % np.uint32(N)).astype(jnp.int32)

    # Pallas FLOP kernel: f(x) iterated in-VMEM, sized to ~gather cost.
    BL = 4096
    FLOP_ITERS = 40

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(FLOP_ITERS):
            x = x * 1.000001 + 0.000001
            x = jnp.maximum(x * 0.999999 - 0.000001, x * 0.5)
        o_ref[...] = x

    call = pl.pallas_call(
        kernel,
        grid=(R // BL,),
        in_specs=[pl.BlockSpec((BL // 128, 128), lambda i: (i, 0), **vm)],
        out_specs=pl.BlockSpec((BL // 128, 128), lambda i: (i, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((R // 128, 128), jnp.float32),
    )
    x0 = jax.random.normal(key, (R // 128, 128), jnp.float32)

    def marginal(label, run, lo=48, hi=480):
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

    def g_run(cap):
        def body(c):
            i, idx = c
            rows = table[:, idx]
            return (i + 1, nxt(rows))
        return lax.while_loop(lambda c: c[0] < cap, body, (jnp.int32(0), idx0))

    def p_run(cap):
        def body(c):
            i, x = c
            return (i + 1, call(x))
        return lax.while_loop(lambda c: c[0] < cap, body, (jnp.int32(0), x0))

    def gp_ind_run(cap):
        def body(c):
            i, idx, x = c
            rows = table[:, idx]
            x = call(x)
            return (i + 1, nxt(rows), x)
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), idx0, x0))

    def gp_dep_run(cap):
        # Software pipeline: iteration i's pallas consumes the rows
        # gathered at iteration i-1 (carried), so the fresh gather has a
        # full pallas call to hide behind.
        rows_c = table[:, idx0]

        def body(c):
            i, idx, rows, x = c
            x = call(x + rows[0, :R].reshape(R // 128, 128) * 1e-30)
            new_rows = table[:, idx]
            return (i + 1, nxt(new_rows), new_rows, x)
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), nxt(rows_c), rows_c, x0))

    def gg_run(cap):
        def body(c):
            i, ia, ib = c
            ra = table[:, ia]
            rb = table[:, ib]
            return (i + 1, nxt(ra), nxt(rb))
        return lax.while_loop(lambda c: c[0] < cap, body,
                              (jnp.int32(0), idx0, (idx0 + 3) % N))

    res = {}
    res["g"] = marginal("gather 65k", g_run)
    res["p"] = marginal("pallas flops", p_run)
    res["gp_ind"] = marginal("gather + pallas (independent)", gp_ind_run)
    res["gp_dep"] = marginal("gather + pallas (pipelined dep)", gp_dep_run)
    res["gg"] = marginal("two gathers", gg_run)

    print("--- summary ---")
    for k, v in res.items():
        print(f"  {k}: {round(v)}")
    s = res["g"] + res["p"]
    m = max(res["g"], res["p"])
    print(f"  serial-sum {s:.0f}, overlap-max {m:.0f}; "
          f"ind measured {res['gp_ind']:.0f}, dep {res['gp_dep']:.0f}")


if __name__ == "__main__":
    main()
