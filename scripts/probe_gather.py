"""Probe: dependent-chain gather rate vs row width and lane count.

Sets the megakernel's row-bank design (leaf triangle count / node
arity trade against bytes per gathered row). complex64/f64 packing is
UNIMPLEMENTED on this backend, so f32 width is the only knob."""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    import functools

    ITERS = 64
    N = 15284  # the bunny bank's row count

    rs = np.random.RandomState(0)

    def timed(tag, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        dt = time.perf_counter() - t0
        print(f"[{tag:28s}] {dt/ITERS*1e6:8.0f} us/iter", file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(table, idx, iters):
        n = table.shape[0]

        def body(c):
            i, idx, acc = c
            row = table[idx]
            nxt = (idx + 1 + row[:, 1].astype(jnp.int32)) % n
            return i + 1, nxt, acc + row[:, 0]

        r = idx.shape[0]
        return lax.while_loop(
            lambda c: c[0] < iters, body,
            (jnp.int32(0), idx, jnp.zeros((r,), jnp.float32)))

    for W in (20, 40, 76, 112, 160):
        table = jax.device_put(rs.rand(N, W).astype(np.float32))
        for R in (65536, 262144):
            idx0 = jax.device_put((np.arange(R, dtype=np.int32) * 7919) % N)
            timed(f"W={W:3d} R={R:6d} f32", chain, table, idx0, ITERS)

    # Table-size effect at the production width
    for n2 in (2048, 65536):
        table = jax.device_put(rs.rand(n2, 160).astype(np.float32))
        idx0 = jax.device_put((np.arange(262144, dtype=np.int32) * 7919) % n2)
        timed(f"W=160 R=262144 N={n2}", chain, table, idx0, ITERS)


if __name__ == "__main__":
    main()
