"""Probe: row gather + transpose strategies for the megakernel.

The Pallas body consumes columns, so the (R, W) gather output is
transposed to (W, R) each iteration today. Candidates:
  a) table[idx].T               (gather then XLA transpose — current)
  b) table_T[:, idx]            (gather along the minor axis of the
                                 pre-transposed (W, N) bank)
  c) jnp.take(table, idx, 0).T  (same as a, explicit)
  d) table[idx]                 (no transpose — lower bound)
"""

import sys
import time
import functools

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    ITERS = 64
    N = 15284
    W = 160
    rs = np.random.RandomState(0)

    def timed(tag, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        dt = time.perf_counter() - t0
        print(f"[{tag:28s}] {dt/ITERS*1e6:8.0f} us/iter", file=sys.stderr)

    def make_chain(get_row):
        # get_row(tables, idx) -> (W, R) (or (R, W) for the baseline);
        # consume a few columns like the body does.
        @jax.jit
        def chain(tables, idx):
            def body(c):
                i, idx, acc = c
                rowt = get_row(tables, idx)
                c0 = rowt[0] if rowt.shape[0] == W else rowt[:, 0]
                c1 = rowt[1] if rowt.shape[0] == W else rowt[:, 1]
                nxt = (idx + 1 + c1.astype(jnp.int32)) % N
                return i + 1, nxt, acc + c0

            r = idx.shape[0]
            return lax.while_loop(
                lambda c: c[0] < ITERS, body,
                (jnp.int32(0), idx, jnp.zeros((r,), jnp.float32)))

        return chain

    table = jax.device_put(rs.rand(N, W).astype(np.float32))
    table_t = jax.device_put(np.ascontiguousarray(np.asarray(table).T))

    for R in (262144,):
        idx0 = jax.device_put((np.arange(R, dtype=np.int32) * 7919) % N)
        timed(f"a gather+T R={R}",
              make_chain(lambda t, i: t[0][i].T), (table,), idx0)
        timed(f"b gatherT  R={R}",
              make_chain(lambda t, i: t[1][:, i]), (table, table_t), idx0)
        timed(f"d gather   R={R}",
              make_chain(lambda t, i: t[0][i]), (table,), idx0)


if __name__ == "__main__":
    main()
