"""Probe r50 (TPU): price tpu.dynamic_gather at the ONLY shape Mosaic
lowers (r49 + lowering.py:2464-2524): take_along_axis on 2D with
indices.shape == table.shape — i.e. a VMEM node table padded to the
block lane count, out[w, j] = table[w, idx[j]].

If this costs << the XLA row gather's ~3.9 ns/row equivalent
(~250 us per 262k-lane step), the internal BVH levels can live in
VMEM and traverse IN-KERNEL: HBM rows/segment drops to leaf rows
only and node steps stop costing loop iterations.

Legs (all R=262144 lanes, BL=4096 blocks, 64 grid steps):
  w8    table (8, BL) f32      — scaling floor
  w103  table (103, BL) f32    — the real node-row width
  w103x2 two DEPENDENT steps   — traversal shape (idx2 from step 1)
  w103b BL=2048 variant        — block-size scaling
Report us per 262k-lane gather-step and the implied ns/row.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 262144


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vm = {"memory_space": pltpu.VMEM}
    key = jax.random.PRNGKey(0)

    def bench(label, fn, args, reps=30):
        try:
            f = jax.jit(fn)
            for _ in range(2):
                out = f(*args)
                jax.tree_util.tree_map(
                    lambda a: a.block_until_ready(), out)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:200]
            print(f"[{label}] FAILED: {msg}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"[{label}] {best*1e6:.0f} us/step ({best/R*1e9:.2f} ns/lane)",
              flush=True)
        return best

    def make(W, BL, steps=1):
        table = jax.random.normal(key, (W, BL), jnp.float32)
        idx0 = ((jnp.arange(R, dtype=jnp.int32) * 7919) % BL).reshape(1, R)

        def kernel(tab_ref, idx_ref, o_ref):
            tab = tab_ref[...]
            ix = idx_ref[...]                       # (1, BL)
            ixb = jnp.broadcast_to(ix, (W, BL))
            out = jnp.take_along_axis(tab, ixb, axis=1)
            for _ in range(steps - 1):
                nx = (jnp.abs(out[0:1]).astype(jnp.int32) * 7 + ix) % BL
                ixb = jnp.broadcast_to(nx, (W, BL))
                out = jnp.take_along_axis(tab, ixb, axis=1)
            o_ref[...] = out

        call = pl.pallas_call(
            kernel,
            grid=(R // BL,),
            in_specs=[
                pl.BlockSpec((W, BL), lambda i: (0, 0), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_specs=pl.BlockSpec((W, BL), lambda i: (0, i), **vm),
            out_shape=jax.ShapeDtypeStruct((W, R), jnp.float32),
        )
        return call, (table, idx0)

    for W, BL, steps, label in (
        (8, 4096, 1, "w8 BL=4096"),
        (103, 4096, 1, "w103 BL=4096"),
        (103, 4096, 2, "w103x2 dependent BL=4096"),
        (103, 2048, 1, "w103 BL=2048"),
    ):
        call, args = make(W, BL, steps)
        bench(label, call, args)

    # correctness spot check on the last compiled variant
    call, args = make(8, 4096, 1)
    try:
        got = np.asarray(jax.jit(call)(*args))
        tab, idx = np.asarray(args[0]), np.asarray(args[1])[0]
        want = np.stack([tab[:, idx[j]] for j in range(0, 16)], axis=1)
        ok = np.array_equal(got[:, :16], want)
        print(f"[check] first-16-lane values exact: {ok}", flush=True)
    except Exception as e:
        print(f"[check] FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
