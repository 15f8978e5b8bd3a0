"""Probe r49 (TPU): does per-lane dynamic gather from a VMEM table
lower in Mosaic NOW, and at what rate?

Round-2 probes (r3c/r3d/r8) found `tpu.dynamic_gather`
(take_along_axis) failed to lower (HTTP 500 from the remote compile
helper) and scalar-indexed fetch cost ~13 us/fetch, which forced the
row gather to stay an XLA op between pallas_calls (serial with the
body, 972 us/iter at 262k lanes = 46% of the headline frame).  If ANY
in-kernel form lowers at a sane rate, the top two BVH levels
(~1k rows x 640 B = 655 KB) can sit in VMEM and traverse in-kernel:
HBM rows/segment drops 0.52 -> ~0.25 (leaf rows only) and node steps
stop consuming loop iterations.

Legs (each its own kernel; failures are caught and reported):
  dg_lane   take_along_axis along the LANE axis: table (8, N) f32,
            idx (8, BL) -> out (8, BL).  The native tpu.dynamic_gather
            shape.  N=128 and N=1024 variants (vreg-internal vs not).
  dg_sub    jnp.take along axis 0: table (N, 128) f32, idx (BL,) ->
            out (BL, 128).  Sublane-axis gather.
  onehot    exact u8-valued bf16 one-hot MXU gather (known-lowerable
            baseline): out = onehot(idx) @ table, values in [0, 255].
  dg_chain  two DEPENDENT dg_lane steps (traversal shape: idx2 is a
            function of step 1's gathered values).

Rates to beat: XLA gather engine ~3.9 ns/row (262k rows in ~1.0 ms).
Anything under ~8 ns/row wins, because it removes rows from the XLA
gather AND overlaps with the body by living inside it.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 65536
BL = 8192


def main():
    import jax
    import jax.numpy as jnp

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vm = {"memory_space": pltpu.VMEM}
    key = jax.random.PRNGKey(0)

    def bench(label, fn, args, reps=20, steps=1):
        # ``steps``: dependent gathers per call (the dg_chain leg), so
        # ns/row stays comparable per GATHER across legs against the
        # 3.9 ns/row XLA threshold in the docstring.
        try:
            f = jax.jit(fn)
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"[{label}] FAILED: {msg}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        ns_row = best / (R * steps) * 1e9
        print(f"[{label}] {best*1e6:.0f} us for {R} rows -> "
              f"{ns_row:.2f} ns/row", flush=True)
        return best

    # ---------------- dg_lane: lane-axis take_along_axis ----------------
    def make_dg_lane(N, W, steps=1):
        table = jax.random.normal(key, (W, N), jnp.float32)
        idx0 = (jnp.arange(R, dtype=jnp.int32) * 7919) % N

        def kernel(tab_ref, idx_ref, o_ref):
            tab = tab_ref[...]
            ix = idx_ref[...]          # (1, BL) i32
            ixb = jnp.broadcast_to(ix, (W, BL))
            out = jnp.take_along_axis(tab, ixb, axis=1)    # (W, BL)
            for _ in range(steps - 1):
                # dependent second step: next index from gathered data
                nx = (jnp.abs(out[0:1]).astype(jnp.int32) * 7 + ix) % N
                ixb = jnp.broadcast_to(nx, (W, BL))
                out = jnp.take_along_axis(tab, ixb, axis=1)
            o_ref[...] = out

        call = pl.pallas_call(
            kernel,
            grid=(R // BL,),
            in_specs=[
                pl.BlockSpec((W, N), lambda i: (0, 0), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_specs=pl.BlockSpec((W, BL), lambda i: (0, i), **vm),
            out_shape=jax.ShapeDtypeStruct((W, R), jnp.float32),
        )
        return call, (table, idx0.reshape(1, R))

    for N, W, steps, label in (
        (128, 8, 1, "dg_lane N=128 W=8"),
        (1024, 8, 1, "dg_lane N=1024 W=8"),
        (1024, 64, 1, "dg_lane N=1024 W=64"),
        (8192, 64, 1, "dg_lane N=8192 W=64"),
        (1024, 64, 2, "dg_chain N=1024 W=64 2-step"),
    ):
        call, args = make_dg_lane(N, W, steps)
        bench(label, call, args, steps=steps)

    # ---------------- dg_sub: sublane-axis jnp.take ----------------
    def make_dg_sub(N, W):
        table = jax.random.normal(key, (N, W), jnp.float32)
        idx0 = (jnp.arange(R, dtype=jnp.int32) * 7919) % N

        def kernel(tab_ref, idx_ref, o_ref):
            tab = tab_ref[...]
            ix = idx_ref[...][0]       # (BL,) i32
            o_ref[...] = jnp.take(tab, ix, axis=0)   # (BL, W)

        call = pl.pallas_call(
            kernel,
            grid=(R // BL,),
            in_specs=[
                pl.BlockSpec((N, W), lambda i: (0, 0), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_specs=pl.BlockSpec((BL, W), lambda i: (i, 0), **vm),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        )
        return call, (table, idx0.reshape(1, R))

    call, args = make_dg_sub(1024, 128)
    bench("dg_sub N=1024 W=128", call, args)

    # ---------------- onehot: exact u8-valued bf16 MXU gather -----------
    def make_onehot(N, W):
        tab8 = jax.random.randint(key, (N, W), 0, 256, jnp.int32)
        table = tab8.astype(jnp.bfloat16)
        idx0 = (jnp.arange(R, dtype=jnp.int32) * 7919) % N

        def kernel(tab_ref, idx_ref, o_ref):
            tab = tab_ref[...]
            ix = idx_ref[...][0]       # (BL,)
            io = jax.lax.broadcasted_iota(jnp.int32, (BL, N), 1)
            oh = (ix[:, None] == io).astype(jnp.bfloat16)
            o_ref[...] = jnp.dot(oh, tab,
                                 preferred_element_type=jnp.float32)

        call = pl.pallas_call(
            kernel,
            grid=(R // BL,),
            in_specs=[
                pl.BlockSpec((N, W), lambda i: (0, 0), **vm),
                pl.BlockSpec((1, BL), lambda i: (0, i), **vm),
            ],
            out_specs=pl.BlockSpec((BL, W), lambda i: (i, 0), **vm),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        )
        return call, (table, idx0.reshape(1, R)), tab8, idx0

    call, args, tab8, idxh = make_onehot(1024, 256)
    best = bench("onehot N=1024 W=256 bf16", call, args[:2])
    if best is not None:
        got = np.asarray(jax.jit(call)(*args[:2]))
        want = np.asarray(tab8)[np.asarray(idxh)]
        exact = np.array_equal(got, want.astype(np.float32))
        print(f"[onehot] exact u8 round-trip: {exact}", flush=True)


if __name__ == "__main__":
    main()
