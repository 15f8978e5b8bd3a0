"""Probe: does index locality change the gather's per-lane cost?"""

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
    R = 262144
    rs = np.random.RandomState(0)
    table = jax.device_put(rs.rand(N, W).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def chain(table, idx, iters, mode):
        n = table.shape[0]

        def body(c):
            i, idx, acc = c
            row = table[idx]
            if mode == "dependent":
                nxt = (idx + 1 + row[:, 1].astype(jnp.int32)) % n
            else:  # static index stream: same idx each iteration
                nxt = idx
            return i + 1, nxt, acc + row[:, 0]

        r = idx.shape[0]
        return lax.while_loop(
            lambda c: c[0] < iters, body,
            (jnp.int32(0), idx, jnp.zeros((r,), jnp.float32)))

    patterns = {
        "const0": np.zeros(R, np.int32),
        "seq": (np.arange(R, dtype=np.int32) % N),
        "block64": (np.arange(R, dtype=np.int32) // 64 % N),
        "random": rs.randint(0, N, R).astype(np.int32),
    }
    for mode in ("static", "dependent"):
        for name, idx in patterns.items():
            idx0 = jax.device_put(idx)
            out = chain(table, idx0, ITERS, mode)
            jax.tree_util.tree_map(lambda a: np.asarray(a), out)
            t0 = time.perf_counter()
            out = chain(table, idx0, ITERS, mode)
            jax.tree_util.tree_map(lambda a: np.asarray(a), out)
            dt = time.perf_counter() - t0
            print(f"[{mode:9s} {name:8s}] {dt/ITERS*1e6:8.0f} us/iter  "
                  f"{dt/ITERS/R*1e9:6.2f} ns/lane", file=sys.stderr)


if __name__ == "__main__":
    main()
