"""Probe: gather cost per lane at large lane counts (W=160)."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import functools

    ITERS = 32
    N = 15284
    W = 160
    rs = np.random.RandomState(0)
    table = jax.device_put(rs.rand(N, W).astype(np.float32))

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

    for R in (262144, 524288, 1048576, 2097152):
        idx0 = jax.device_put((np.arange(R, dtype=np.int32) * 7919) % N)
        out = chain(table, idx0, ITERS)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        t0 = time.perf_counter()
        out = chain(table, idx0, ITERS)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        dt = time.perf_counter() - t0
        per = dt / ITERS
        print(f"R={R:8d}: {per*1e6:8.0f} us/iter  {per/R*1e9:6.2f} ns/lane  "
              f"{R/per/1e6:6.1f} Mrows/s", file=sys.stderr)


if __name__ == "__main__":
    main()
