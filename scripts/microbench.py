"""TPU primitive microbenchmarks that drive tpurt's engine design.

Measures the device physics the renderer architecture keys off. All
inputs are device_put BEFORE timing (the axon tunnel makes host->device
uploads catastrophically slow, so un-staged numpy args measure the
network, not the chip). The measured region ends with a host
materialisation of a tiny reduction, because block_until_ready can
return before work drains over the tunnel.

Usage: python scripts/microbench.py [--cpu] [--only PATTERN]
"""

from __future__ import annotations

import argparse
import functools
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
    """Median seconds for fn(*args) ending in host materialisation."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def report(name, value, unit, detail=""):
    print(f"{name:<46s} {value:>12.3f} {unit:<12s} {detail}", flush=True)


# ---------------------------------------------------------------- XLA --


def bench_gather(jnp, jax, lax):
    """Dependent-chain gathers inside a fori_loop (mimics traversal)."""
    ITERS = 64

    @functools.partial(jax.jit, static_argnames=("iters", "n"))
    def run(table, idx0, *, iters, n):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            acc = acc + rows[:, 0].astype(jnp.float32)
            nxt = lax.bitcast_convert_type(
                rows[:, 1].astype(jnp.float32), jnp.uint32
            )
            idx = ((idx.astype(jnp.uint32) + nxt) % jnp.uint32(n)).astype(
                jnp.int32
            )
            return idx, acc
        idx, acc = lax.fori_loop(
            0, iters, body, (idx0, jnp.zeros_like(idx0, jnp.float32))
        )
        return jnp.sum(acc) + jnp.sum(idx)

    rng = np.random.default_rng(0)
    for (n, w, r) in [
        (40960, 8, 65536),
        (40960, 40, 65536),
        (40960, 80, 65536),
        (40960, 160, 65536),
        (4096, 40, 65536),
        (512, 40, 65536),
        (512, 3840, 8192),
        (40960, 40, 16384),
        (40960, 40, 262144),
    ]:
        table = np.asarray(rng.standard_normal((n, w)), dtype=np.float32)
        idx0 = rng.integers(0, n, size=(r,)).astype(np.int32)
        table, idx0 = _put(table, idx0)
        run(table, idx0, iters=ITERS, n=n)  # warmup/compile
        sec = _t(lambda: run(table, idx0, iters=ITERS, n=n))
        rows_s = r * ITERS / sec
        report(
            f"gather N={n} W={w} R={r}",
            rows_s / 1e6, "Mrows/s",
            f"{rows_s * w * 4 / 1e9:.1f} GB/s  {sec / ITERS * 1e6:.0f} us/iter",
        )


def bench_while_overhead(jnp, jax, lax):
    ITERS = 256

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(state, *, iters):
        def cond(c):
            return c[0] < iters
        def body(c):
            i, s = c
            s = s * np.float32(0.9999) + np.float32(1e-6)
            return i + 1, s
        i, s = lax.while_loop(cond, body, (jnp.int32(0), state))
        return jnp.sum(s[:, 0])

    for r in (65536, 262144):
        state = _put(np.ones((r, 70), np.float32))
        run(state, iters=ITERS)
        sec = _t(lambda: run(state, iters=ITERS))
        report(
            f"while_loop 70xf32 state R={r}",
            sec / ITERS * 1e6, "us/iter",
            f"{r * 70 * 4 * 2 * ITERS / sec / 1e9:.0f} GB/s if state streamed",
        )


def bench_matmul(jnp, jax, lax):
    for (name, shape_a, shape_b, batched) in [
        ("gemm (65536,16)x(16,4096)", (65536, 16), (16, 4096), False),
        ("gemm (65536,128)x(128,4096)", (65536, 128), (128, 4096), False),
        ("gemm (8192,16)x(16,69632)", (8192, 16), (16, 69632), False),
        ("bgemm 64x(1024,16)x(16,512)", (64, 1024, 16), (64, 16, 512), True),
    ]:
        a = np.random.default_rng(0).standard_normal(shape_a).astype(np.float32)
        b = np.random.default_rng(1).standard_normal(shape_b).astype(np.float32)
        a, b = _put(a, b)
        for prec in ("default", "high", "highest"):
            @functools.partial(jax.jit, static_argnames=("p", "reps"))
            def run(a, b, *, p, reps):
                def body(i, acc):
                    if batched:
                        o = lax.dot_general(
                            a + i.astype(jnp.float32) * np.float32(1e-9), b,
                            (((2,), (1,)), ((0,), (0,))), precision=p,
                        )
                    else:
                        o = jnp.dot(
                            a + i.astype(jnp.float32) * np.float32(1e-9), b,
                            precision=p,
                        )
                    return acc + jnp.sum(o[..., 0])
                return lax.fori_loop(0, reps, body, jnp.float32(0.0))

            REPS = 32
            run(a, b, p=prec, reps=REPS)
            sec = _t(lambda: run(a, b, p=prec, reps=REPS))
            if batched:
                flops = shape_a[0] * shape_a[1] * shape_a[2] * shape_b[2] * 2
                pairs = shape_a[0] * shape_a[1] * shape_b[2]
            else:
                flops = shape_a[0] * shape_a[1] * shape_b[1] * 2
                pairs = shape_a[0] * shape_b[1]
            report(
                f"{name} {prec}",
                flops * REPS / sec / 1e12, "TFLOP/s",
                f"{sec / REPS * 1e6:.0f} us/call "
                f"({pairs / (sec / REPS) / 1e9:.1f} G outsets/s)",
            )


def bench_mt_broadcast(jnp, jax, lax):
    from tpurt.render.intersect import _mt_sweep, _TriTable, _LocalBest

    R, C = 65536, 2048
    rng = np.random.default_rng(0)
    ro = rng.standard_normal((R, 3)).astype(np.float32)
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    tri = rng.standard_normal((C, 3, 3)).astype(np.float32) * 100

    @jax.jit
    def run(ro, rd, pa, pb, pc):
        t = _TriTable(pa=pa, pb=pb, pc=pc, na=pa, nb=pb, nc=pc,
                      cull=jnp.ones((pa.shape[0],), bool))
        best = _LocalBest(
            t=jnp.full((ro.shape[0],), np.float32(np.inf), jnp.float32),
            tri=jnp.full((ro.shape[0],), -1, jnp.int32),
        )
        out = _mt_sweep(ro, rd, t, best, jnp.int32(0))
        return jnp.sum(out.t) + jnp.sum(out.tri)

    ro, rd, pa, pb, pc = _put(ro, rd, tri[:, 0], tri[:, 1], tri[:, 2])
    run(ro, rd, pa, pb, pc)
    sec = _t(lambda: run(ro, rd, pa, pb, pc))
    report(
        f"mt_broadcast R={R} C={C}",
        R * C / sec / 1e9, "Gpairs/s",
        f"{sec * 1e3:.1f} ms/sweep",
    )


def bench_sort(jnp, jax, lax):
    R = 65536
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**20, size=(R,)).astype(np.uint32)
    state = rng.standard_normal((R, 70)).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_sort(keys, *, reps):
        def body(i, acc):
            s = jnp.sort(keys + i.astype(jnp.uint32))
            return acc + s[0]
        return lax.fori_loop(0, reps, body, jnp.uint32(0))

    @jax.jit
    def run_argsort_reorder(keys, state):
        order = jnp.argsort(keys)
        return jnp.sum(state[order][:, 0]) + jnp.sum(order)

    keys, state = _put(keys, state)
    REPS = 8
    run_sort(keys, reps=REPS)
    sec = _t(lambda: run_sort(keys, reps=REPS)) / REPS
    report(f"sort u32 R={R}", R / sec / 1e6, "Mkeys/s", f"{sec*1e3:.2f} ms")
    run_argsort_reorder(keys, state)
    sec = _t(lambda: run_argsort_reorder(keys, state))
    report(
        f"argsort+reorder 70xf32 R={R}", R / sec / 1e6, "Mkeys/s",
        f"{sec*1e3:.2f} ms",
    )


# ------------------------------------------------------------- Pallas --


def bench_pallas_trivial(jnp, jax, lax):
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = _put(np.ones((256, 256), np.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    out = np.asarray(run(x))
    ok = bool(np.all(out == 2.0))
    report("pallas trivial kernel", 1.0 if ok else 0.0, "ok", "compiled+ran")


def bench_pallas_while(jnp, jax, lax):
    """In-kernel fori_loop over VMEM state: iteration rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 4096

    def kernel(x_ref, o_ref):
        def body(i, s):
            return s * np.float32(0.9999) + np.float32(1e-6)
        o_ref[:] = lax.fori_loop(0, ITERS, body, x_ref[:])

    for shape in ((64, 128), (512, 128), (64, 8192)):
        x = _put(np.ones(shape, np.float32))

        @jax.jit
        def run(x):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            return jnp.sum(out[0])

        run(x)
        sec = _t(lambda: run(x))
        n = shape[0] * shape[1]
        report(
            f"pallas fori_loop vmem {shape}",
            sec / ITERS * 1e9, "ns/iter",
            f"{n * ITERS / sec / 1e9:.1f} Gelem/s",
        )


def bench_pallas_dynamic_gather(jnp, jax, lax):
    """tpu.dynamic_gather via take_along_axis: per-lane row lookup from
    a lane-replicated table, chained (traversal-like)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 512

    for n in (512, 2048, 8192):
        def kernel(table_ref, idx_ref, o_ref, *, n=n):
            table = table_ref[:]  # (n, 128) f32

            def body(i, idx):
                # idx (n,128) i32 — gather x[idx[i,j], j]
                rows = jnp.take_along_axis(table, idx, axis=0)
                nxt = rows.astype(jnp.int32)
                return jnp.abs(idx + nxt) % n

            idx = lax.fori_loop(0, ITERS, body, idx_ref[:])
            o_ref[:] = idx

        rng = np.random.default_rng(0)
        table = rng.standard_normal((n, 128)).astype(np.float32) * 3
        idx0 = rng.integers(0, n, size=(n, 128)).astype(np.int32)
        table, idx0 = _put(table, idx0)

        @jax.jit
        def run(table, idx0):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx0)
            return jnp.sum(out[0])

        try:
            run(table, idx0)
            sec = _t(lambda: run(table, idx0))
            report(
                f"pallas dynamic_gather N={n} (full-table)",
                n * 128 * ITERS / sec / 1e9, "Gelem/s",
                f"{sec / ITERS * 1e6:.1f} us/gather of ({n},128)",
            )
        except Exception as e:  # noqa: BLE001
            report(
                f"pallas dynamic_gather N={n}", float("nan"), "ERROR",
                f"{type(e).__name__}: {str(e)[:140]}",
            )


def bench_pallas_scalar_fetch(jnp, jax, lax):
    """Scalar-indexed dynamic row fetch from a big VMEM table (packet /
    cluster fetch primitive), chained."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 2048
    N, W = 512, 128  # rows of (8, W) blocks -> table (N*8, W)

    def kernel(table_ref, o_ref):
        def body(i, carry):
            idx, acc = carry
            blk = table_ref[pl.ds(idx * 8, 8), :]  # (8, W)
            acc = acc + blk
            nxt = jnp.sum(blk[0, 0:1]).astype(jnp.int32)
            idx = jnp.abs(idx + 1 + nxt) % N
            return idx, acc

        idx, acc = lax.fori_loop(
            0, ITERS, body, (jnp.int32(0), jnp.zeros((8, W), jnp.float32))
        )
        o_ref[:] = acc

    rng = np.random.default_rng(0)
    table = _put(rng.standard_normal((N * 8, W)).astype(np.float32))

    @jax.jit
    def run(table):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table)
        return jnp.sum(out)

    try:
        run(table)
        sec = _t(lambda: run(table))
        report(
            "pallas scalar dyn fetch (8,128) chain",
            sec / ITERS * 1e9, "ns/fetch", "",
        )
    except Exception as e:  # noqa: BLE001
        report(
            "pallas scalar dyn fetch", float("nan"), "ERROR",
            f"{type(e).__name__}: {str(e)[:140]}",
        )


def bench_pallas_mt_dense(jnp, jax, lax):
    """Dense VPU Möller-Trumbore inside a kernel: rays as (8,128) vregs
    vs T VMEM-resident triangles, fori_loop over triangle blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, T = 1024, 4096  # rays laid out (8,128); tris in (T, 9) f32

    def kernel(rox, roy, roz, rdx, rdy, rdz, tri_ref, o_ref):
        ro = (rox[:], roy[:], roz[:])
        rd = (rdx[:], rdy[:], rdz[:])
        tbest = jnp.full((8, 128), np.float32(np.inf), jnp.float32)

        def body(k, tbest):
            row = tri_ref[pl.ds(k, 1), :]  # (1, 9)
            pa = (row[0, 0], row[0, 1], row[0, 2])
            e1 = (row[0, 3], row[0, 4], row[0, 5])
            e2 = (row[0, 6], row[0, 7], row[0, 8])
            # h = rd x e2
            hx = rd[1] * e2[2] - rd[2] * e2[1]
            hy = rd[2] * e2[0] - rd[0] * e2[2]
            hz = rd[0] * e2[1] - rd[1] * e2[0]
            det = e1[0] * hx + e1[1] * hy + e1[2] * hz
            f = 1.0 / det
            sx, sy, sz = ro[0] - pa[0], ro[1] - pa[1], ro[2] - pa[2]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1[2] - sz * e1[1]
            qy = sz * e1[0] - sx * e1[2]
            qz = sx * e1[1] - sy * e1[0]
            v = f * (rd[0] * qx + rd[1] * qy + rd[2] * qz)
            t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
            ok = (
                (jnp.abs(det) >= np.float32(1e-6))
                & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                & (t > np.float32(1e-6))
            )
            return jnp.where(ok & (t < tbest), t, tbest)

        o_ref[:] = lax.fori_loop(0, T, body, tbest)

    rng = np.random.default_rng(0)
    rays = [rng.standard_normal((8, 128)).astype(np.float32) for _ in range(6)]
    tris = rng.standard_normal((T, 9)).astype(np.float32) * 50
    args = _put(*rays, tris)

    @jax.jit
    def run(*a):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
        return jnp.sum(out)

    try:
        run(*args)
        sec = _t(lambda: run(*args))
        report(
            f"pallas dense MT scalar-tri R={R} T={T}",
            R * T / sec / 1e9, "Gpairs/s",
            f"{sec * 1e3:.2f} ms",
        )
    except Exception as e:  # noqa: BLE001
        report(
            "pallas dense MT", float("nan"), "ERROR",
            f"{type(e).__name__}: {str(e)[:140]}",
        )


def bench_pallas_mxu(jnp, jax, lax):
    """In-kernel MXU: (1024,16)x(16,512) chained."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 512
    M, K, N = 1024, 16, 512

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(i, acc):
            o = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return acc + o[:, 0:1] * np.float32(1e-9)

        o_ref[:] = lax.fori_loop(0, ITERS, body, jnp.zeros((M, 1), jnp.float32))

    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, K)).astype(np.float32)
    b = rng.standard_normal((K, N)).astype(np.float32)
    a, b = _put(a, b)

    @jax.jit
    def run(a, b):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.sum(out)

    try:
        run(a, b)
        sec = _t(lambda: run(a, b))
        flops = 2 * M * K * N * ITERS
        report(
            f"pallas mxu ({M},{K})x({K},{N}) f32",
            flops / sec / 1e12, "TFLOP/s",
            f"{sec / ITERS * 1e6:.1f} us/mm",
        )
    except Exception as e:  # noqa: BLE001
        report(
            "pallas mxu", float("nan"), "ERROR",
            f"{type(e).__name__}: {str(e)[:140]}",
        )


BENCHES = [
    ("pallas_trivial", bench_pallas_trivial),
    ("pallas_while", bench_pallas_while),
    ("pallas_gather", bench_pallas_dynamic_gather),
    ("pallas_fetch", bench_pallas_scalar_fetch),
    ("pallas_mt", bench_pallas_mt_dense),
    ("pallas_mxu", bench_pallas_mxu),
    ("gather", bench_gather),
    ("while", bench_while_overhead),
    ("matmul", bench_matmul),
    ("mt_broadcast", bench_mt_broadcast),
    ("sort", bench_sort),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for name, fn in BENCHES:
        if args.only and args.only not in name:
            continue
        try:
            fn(jnp, jax, lax)
        except Exception as e:  # noqa: BLE001
            report(name, float("nan"), "ERROR", f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
