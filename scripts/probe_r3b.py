"""Round-3 XLA-level probes: gather concurrency and overlap.

The in-kernel dynamic gather is still unsupported by the platform
(tpu.dynamic_gather crashes the remote compile helper — probe_r3.py),
so the row fetch stays an XLA gather between pallas_calls. Its measured
ceiling (207M rows/s at 262k lanes, fixed ~310us/iteration below that)
is the engine's binding constraint. These probes ask whether that
ceiling is an ISSUE-RATE property of one gather op (in which case
splitting the batch into independent gathers, or overlapping gathers
with the Pallas body, buys real concurrency) or a hard engine limit.

Usage: python scripts/probe_r3b.py [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def _put(*arrays):
    import jax

    out = [jax.device_put(a) for a in arrays]
    for o in out:
        o.block_until_ready()
    return out if len(out) > 1 else out[0]


def _t(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def report(name, value, unit, detail=""):
    print(f"{name:<56s} {value:>12.3f} {unit:<12s} {detail}", flush=True)


ITERS = 32
N, W = 8192, 128


def probe_split_gather(jnp, jax, lax):
    """k independent chained gathers per while-iteration, same total
    rows (262144). If the per-op fixed cost serialises, k>1 loses; if
    the DMA chains pipeline, k>1 approaches k x the single-gather rate."""

    @functools.partial(jax.jit, static_argnames=("k", "r"))
    def run(table, idx0, *, k, r):
        # idx0: (k, r) i32
        def body(i, idxs):
            outs = []
            for j in range(k):
                rows = table[idxs[j]]  # (r, W) gather j — independent
                nxt = rows[:, 0].astype(jnp.int32)
                outs.append(jnp.abs(idxs[j] + nxt + i) % N)
            return jnp.stack(outs)

        idxs = lax.fori_loop(0, ITERS, body, idx0)
        return jnp.sum(idxs)

    rng = np.random.default_rng(0)
    table = _put(rng.standard_normal((N, W)).astype(np.float32))
    total = 262144
    for k in (1, 2, 4, 8):
        r = total // k
        idx0 = _put(rng.integers(0, N, size=(k, r)).astype(np.int32))
        try:
            np.asarray(run(table, idx0, k=k, r=r))
            sec = _t(lambda: run(table, idx0, k=k, r=r))
            report(
                f"xla gather x{k} of {r} rows (W={W})",
                sec / ITERS * 1e6, "us/iter",
                f"{total*ITERS/sec/1e6:.0f} Mrows/s total",
            )
        except Exception as e:  # noqa: BLE001
            report(f"xla gather x{k}", float("nan"), "ERROR",
                   f"{type(e).__name__}: {str(e)[:160]}")


def probe_big_r(jnp, jax, lax):
    """Does the rate keep climbing past 262k rows per gather?"""

    @functools.partial(jax.jit, static_argnames=("r",))
    def run(table, idx0, *, r):
        def body(i, idx):
            rows = table[idx]
            nxt = rows[:, 0].astype(jnp.int32)
            return jnp.abs(idx + nxt + i) % N

        idx = lax.fori_loop(0, ITERS, body, idx0)
        return jnp.sum(idx)

    rng = np.random.default_rng(0)
    table = _put(rng.standard_normal((N, W)).astype(np.float32))
    for r in (262144, 524288, 1048576):
        idx0 = _put(rng.integers(0, N, size=(r,)).astype(np.int32))
        try:
            np.asarray(run(table, idx0, r=r))
            sec = _t(lambda: run(table, idx0, r=r))
            report(
                f"xla gather R={r} (W={W})",
                sec / ITERS * 1e6, "us/iter",
                f"{r*ITERS/sec/1e6:.0f} Mrows/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"xla gather R={r}", float("nan"), "ERROR",
                   f"{type(e).__name__}: {str(e)[:160]}")


def probe_gather_body_overlap(jnp, jax, lax):
    """Two independent half-batches alternating in one while_loop:
    gather(A);pallas(A);gather(B);pallas(B) per iteration. If XLA/TPU
    overlaps gather DMAs with the Mosaic kernel, the pair costs less
    than 2x a single half-batch iteration."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = 131072
    subl = r // 128

    def vpu_kernel(rows_ref, idx_ref, o_ref):
        # ~24 elementwise ops over the gathered rows + index update —
        # a stand-in for the megakernel body at similar VPU weight.
        v = rows_ref[...]
        a = v * 1.0001 + 0.3
        for _ in range(6):
            b = jnp.maximum(a, v) * 0.5 + a * a * 0.25
            a = jnp.where(b > a, b - 0.125, a + 0.0625)
        s = jnp.sum(a, axis=0)  # (subl,128) reduce over W? keep simple
        o_ref[...] = (
            jnp.abs(idx_ref[...] + s.astype(jnp.int32)) % N
        )

    def body_one(table, idx):
        rows = table[idx]  # (r, 16) — modest width to keep VMEM sane
        rows3 = rows.reshape(subl, 128, 16).transpose(2, 0, 1)
        idx2 = idx.reshape(subl, 128)
        out = pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct((subl, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec((16, subl // 8, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((subl // 8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((subl // 8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            grid=(8,),
        )(rows3, idx2)
        return out.reshape(r)

    @functools.partial(jax.jit, static_argnames=("two",))
    def run(table, ia, ib, *, two):
        def body(i, carry):
            a, b = carry
            a = body_one(table, a)
            if two:
                b = body_one(table, b)
            return a, b

        a, b = lax.fori_loop(0, ITERS, body, (ia, ib))
        return jnp.sum(a) + jnp.sum(b)

    rng = np.random.default_rng(0)
    table = _put(rng.standard_normal((N, 16)).astype(np.float32))
    ia = _put(rng.integers(0, N, size=(r,)).astype(np.int32))
    ib = _put(rng.integers(0, N, size=(r,)).astype(np.int32))
    for two in (False, True):
        try:
            np.asarray(run(table, ia, ib, two=two))
            sec = _t(lambda: run(table, ia, ib, two=two))
            nbat = 2 if two else 1
            report(
                f"gather+pallas chain x{nbat} half-batches",
                sec / ITERS * 1e6, "us/iter",
                f"{r*nbat*ITERS/sec/1e6:.0f} Mrows/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"gather+pallas x{2 if two else 1}", float("nan"),
                   "ERROR", f"{type(e).__name__}: {str(e)[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"jax {jax.__version__} devices {jax.devices()}", flush=True)
    for name, fn in (
        ("split_gather", probe_split_gather),
        ("big_r", probe_big_r),
        ("overlap", probe_gather_body_overlap),
    ):
        t0 = time.time()
        fn(jnp, jax, lax)
        print(f"  [{name} done in {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
