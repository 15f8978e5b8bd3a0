"""Round-3 probes: can the row gather move INSIDE the Mosaic kernel?

Round 2 measured the XLA gather engine capping the megakernel at
~207M rows/s and a fixed while_loop sync per iteration; VERDICT.md says
the only credible path to the 500 Mrays/s target is fusing the row
fetch into the Pallas body.

Mosaic's gather lowering (jax 0.9.0, lowering.py:_gather_lowering_rule)
supports lax.gather ONLY as tpu.dynamic_gather with
idx.shape == table.shape == out.shape, 2-D, on either axis:
  axis 0 (sublanes): out[i,j] = table[idx[i,j], j]
  axis 1 (lanes):    out[i,j] = table[i, idx[i,j]]
The axis-1 form on a TRANSPOSED row bank (W, N) with cursor indices
broadcast across sublanes yields gathered rows directly in SoA
orientation — zero transposes — IF the hardware gathers across the
full N lanes. These probes measure which forms compile on the real
chip and at what rate.

Usage: python scripts/probe_r3.py [--cpu] [--only PATTERN]
"""

from __future__ import annotations

import argparse
import sys
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
    print(f"{name:<52s} {value:>12.3f} {unit:<12s} {detail}", flush=True)


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _run1(kernel, out_shape, *inputs):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)

    return run


# ------------------------------------------------------------------ 1 --
def probe_gather_sublane(jnp, jax, lax):
    """axis-0 (sublane) dynamic_gather, same-shape, CHAINED in a
    fori_loop (traversal-like dependency). out[i,j] = t[idx[i,j], j]."""
    pl, pltpu = _pl()
    ITERS = 256

    for n in (2048, 8192):
        def kernel(table_ref, idx_ref, o_ref, *, n=n):
            table = table_ref[:]

            def body(i, idx):
                rows = jnp.take_along_axis(table, idx, axis=0)
                return jnp.abs(idx + rows.astype(jnp.int32) + i) % n

            o_ref[:] = lax.fori_loop(0, ITERS, body, idx_ref[:])

        rng = np.random.default_rng(0)
        table = rng.standard_normal((n, 128)).astype(np.float32) * 3
        idx0 = rng.integers(0, n, size=(n, 128)).astype(np.int32)
        table, idx0 = _put(table, idx0)
        run = _run1(kernel, jax.ShapeDtypeStruct((n, 128), jnp.int32))
        try:
            np.asarray(run(table, idx0))
            sec = _t(lambda: run(table, idx0))
            report(
                f"pallas sublane-gather chained ({n},128)",
                sec / ITERS * 1e6, "us/iter",
                f"{n*128*ITERS/sec/1e9:.1f} Gelem/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"pallas sublane-gather ({n},128)", float("nan"),
                   "ERROR", f"{type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------------ 2 --
def probe_gather_lane(jnp, jax, lax):
    """axis-1 (lane) dynamic_gather: out[i,j] = t[i, idx[i,j]].
    First verify SEMANTICS compiled (vs numpy) at (8, 256) — does it
    gather across the full lane extent or only within 128-lane tiles?
    Then rate a chained (128, N) form with idx broadcast across
    sublanes (the SoA row-fetch shape)."""
    pl, pltpu = _pl()

    # -- semantics check at N=256 (two 128-lane tiles)
    n = 256

    def kcheck(table_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=1)

    rng = np.random.default_rng(0)
    table = rng.standard_normal((8, n)).astype(np.float32)
    idx0 = rng.integers(0, n, size=(8, n)).astype(np.int32)
    tab_d, idx_d = _put(table, idx0)
    run = _run1(kcheck, jax.ShapeDtypeStruct((8, n), jnp.float32))
    try:
        got = np.asarray(run(tab_d, idx_d))
        want = np.take_along_axis(table, idx0, axis=1)
        ok = np.array_equal(got, want)
        report(f"pallas lane-gather semantics (8,{n})",
               float(ok), "correct", "cross-tile OK" if ok else "WRONG VALUES")
    except Exception as e:  # noqa: BLE001
        report(f"pallas lane-gather (8,{n})", float("nan"), "ERROR",
               f"{type(e).__name__}: {str(e)[:160]}")
        return

    if not ok:
        return

    # -- rate: chained row-fetch shape (128 row-words, N lanes)
    ITERS = 256
    for n in (2048, 8192):
        def kernel(table_ref, idx_ref, o_ref, *, n=n):
            table = table_ref[:]  # (128, n) f32 — transposed bank

            def body(i, idx):
                # broadcast each lane's cursor across all 128 sublanes
                cur = jnp.broadcast_to(idx[:1, :], (128, n))
                rows = jnp.take_along_axis(table, cur, axis=1)  # (128, n)
                nxt = rows.astype(jnp.int32)
                return jnp.abs(idx + nxt + i) % n

            o_ref[:] = lax.fori_loop(0, ITERS, body, idx_ref[:])

        table = rng.standard_normal((128, n)).astype(np.float32) * 3
        idx0 = rng.integers(0, n, size=(128, n)).astype(np.int32)
        tab_d, idx_d = _put(table, idx0)
        run = _run1(kernel, jax.ShapeDtypeStruct((128, n), jnp.int32))
        try:
            np.asarray(run(tab_d, idx_d))
            sec = _t(lambda: run(tab_d, idx_d))
            report(
                f"pallas lane row-gather chained (128,{n})",
                sec / ITERS * 1e6, "us/iter",
                f"{n*ITERS/sec/1e6:.0f} Mrows(128w)/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"pallas lane row-gather (128,{n})", float("nan"),
                   "ERROR", f"{type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------------ 3 --
def probe_fori_floor(jnp, jax, lax):
    """Per-iteration floor of an in-kernel fori_loop with a REAL VPU
    body (~16 elementwise ops) — a resident megakernel needs this to be
    far below the 110 us/iter XLA while_loop floor."""
    pl, pltpu = _pl()
    ITERS = 512

    for (s, l) in ((32, 128), (128, 128)):
        def kernel(x_ref, o_ref):
            def body(i, v):
                a = v * 1.0001 + 0.3
                b = jnp.maximum(a, v) * a
                c = b - jnp.minimum(a, b) * 0.5
                d = c * c + a
                e = jnp.where(d > b, d, c)
                f = e * 0.9999 - a * 0.001
                g = jnp.maximum(f, -f)
                h = g + b * 0.25
                return h * 0.999

            o_ref[:] = lax.fori_loop(0, ITERS, body, x_ref[:])

        x = _put(np.ones((s, l), np.float32))
        run = _run1(kernel, jax.ShapeDtypeStruct((s, l), jnp.float32))
        try:
            np.asarray(run(x))
            sec = _t(lambda: run(x))
            report(
                f"pallas fori 16-op body ({s},{l})",
                sec / ITERS * 1e9, "ns/iter",
                f"{s*l*ITERS/sec/1e9:.1f} Gelem/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"pallas fori body ({s},{l})", float("nan"), "ERROR",
                   f"{type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------------ 4 --
def probe_while_loop(jnp, jax, lax):
    """In-kernel lax.while_loop with a data-dependent trip count — the
    control structure of a resident megakernel block."""
    pl, pltpu = _pl()

    def kernel(x_ref, o_ref):
        def cond(carry):
            i, v = carry
            return (i < 400) & (jnp.sum(v) > -1e30)

        def body(carry):
            i, v = carry
            return i + 1, v * 0.999 + 0.001

        i, v = lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        o_ref[:] = v + i.astype(jnp.float32)

    x = _put(np.ones((32, 128), np.float32))
    run = _run1(kernel, jax.ShapeDtypeStruct((32, 128), jnp.float32))
    try:
        np.asarray(run(x))
        sec = _t(lambda: run(x))
        report("pallas while_loop 400 trips (32,128)", sec / 400 * 1e9,
               "ns/iter", "(includes reduction in cond)")
    except Exception as e:  # noqa: BLE001
        report("pallas while_loop", float("nan"), "ERROR",
               f"{type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------------ 5 --
def probe_transpose(jnp, jax, lax):
    """(M,128) -> (128,M) in-kernel transpose rate (fallback plumbing if
    only the sublane gather works and rows land AoS)."""
    pl, pltpu = _pl()
    ITERS = 128
    m = 2048

    def kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[:].T

        o_ref[:] = lax.fori_loop(
            0, ITERS, body, jnp.zeros((128, m), jnp.float32)
        )

    x = _put(np.ones((m, 128), np.float32))
    run = _run1(kernel, jax.ShapeDtypeStruct((128, m), jnp.float32))
    try:
        np.asarray(run(x))
        sec = _t(lambda: run(x))
        report(f"pallas transpose ({m},128)", sec / ITERS * 1e6, "us/iter",
               f"{m*128*ITERS/sec/1e9:.1f} Gelem/s")
    except Exception as e:  # noqa: BLE001
        report("pallas transpose", float("nan"), "ERROR",
               f"{type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------------ 6 --
def probe_inkernel_dot(jnp, jax, lax):
    """MXU dot inside a Pallas fori_loop: (512,16)x(16,2048) — the
    dense-MXU megakernel's per-iteration Pluecker GEMM."""
    pl, pltpu = _pl()
    ITERS = 128

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(i, acc):
            return acc + jnp.dot(a, b, preferred_element_type=jnp.float32)

        o_ref[:] = lax.fori_loop(
            0, ITERS, body, jnp.zeros((512, 2048), jnp.float32)
        )

    a = _put(np.ones((512, 16), np.float32))
    b = _put(np.ones((16, 2048), np.float32))
    run = _run1(kernel, jax.ShapeDtypeStruct((512, 2048), jnp.float32))
    try:
        np.asarray(run(a, b))
        sec = _t(lambda: run(a, b))
        fl = 2 * 512 * 16 * 2048 * ITERS
        report("pallas in-kernel dot (512,16)x(16,2048)",
               sec / ITERS * 1e6, "us/iter", f"{fl/sec/1e12:.1f} TFLOP/s")
    except Exception as e:  # noqa: BLE001
        report("pallas in-kernel dot", float("nan"), "ERROR",
               f"{type(e).__name__}: {str(e)[:160]}")


PROBES = [
    ("gather_sublane", probe_gather_sublane),
    ("gather_lane", probe_gather_lane),
    ("fori_floor", probe_fori_floor),
    ("while_loop", probe_while_loop),
    ("transpose", probe_transpose),
    ("inkernel_dot", probe_inkernel_dot),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"jax {jax.__version__} devices {jax.devices()}", flush=True)
    for name, fn in PROBES:
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        fn(jnp, jax, lax)
        print(f"  [{name} done in {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
