"""Round-3 probe v2: grid-chunked in-kernel Pluecker GEMM.

probe_r3c's single-block design (one big VMEM coeff table + in-kernel
chunk loop + concatenate) crashed the Mosaic remote compiler at
BL>=512 and scalarised at BL=256 (28 s/sweep). This version uses the
standard Pallas matmul structure instead: a 2-D grid over
(lane blocks, triangle chunks) with the coefficient table PRE-CHUNKED
on the host to (n_chunks*16, 4*TC) so each grid step's BlockSpec
delivers one (16, 4*TC) tile — no in-kernel slicing or concatenation —
and the running (t_best, id_best) fold lives in the revisited output
block (sequential minor grid dim).

Measures (a) the bare dot rate in this structure, (b) dot + fused
accept/min epilogue.

Usage: python scripts/probe_r3d.py [--cpu]
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


R = 262144
T = 6144


def probe(jnp, jax, lax, BL, TC, epilogue):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunk = T // TC
    rng = np.random.default_rng(0)
    # Pre-chunked: chunk c's component-major tile at rows [c*16,(c+1)*16).
    coeffs_np = (rng.standard_normal((n_chunk * 16, 4 * TC)) * 0.1).astype(
        np.float32
    )
    feats_np = rng.standard_normal((R, 16)).astype(np.float32)

    if epilogue:
        def kernel(feats_ref, coeffs_ref, t_ref, i_ref):
            c = pl.program_id(1)
            out = jnp.dot(feats_ref[...], coeffs_ref[...],
                          preferred_element_type=jnp.float32)
            det = out[:, 0 * TC:1 * TC]
            u_num = out[:, 1 * TC:2 * TC]
            v_num = out[:, 2 * TC:3 * TC]
            t_num = out[:, 3 * TC:4 * TC]
            inv = 1.0 / det
            u = u_num * inv
            v = v_num * inv
            t = t_num * inv
            ok = jnp.abs(det) >= 1e-6
            ok &= (u >= 0.0) & (u <= 1.0)
            ok &= (v >= 0.0) & (u + v <= 1.0)
            ok &= t > 1e-6
            t = jnp.where(ok, t, np.float32(np.inf))
            tm = jnp.min(t, axis=1, keepdims=True)  # (BL, 1)
            iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)
            im = jnp.min(
                jnp.where(t == tm, iota, np.int32(2**30)),
                axis=1, keepdims=True,
            ) + c * TC

            @pl.when(c == 0)
            def _():
                t_ref[...] = jnp.broadcast_to(tm, t_ref.shape)
                i_ref[...] = jnp.broadcast_to(im, i_ref.shape)

            @pl.when(c != 0)
            def _():
                tb = t_ref[:, :1]
                closer = tm < tb
                t_ref[...] = jnp.broadcast_to(
                    jnp.where(closer, tm, tb), t_ref.shape)
                ib = i_ref[:, :1]
                i_ref[...] = jnp.broadcast_to(
                    jnp.where(closer, im, ib), i_ref.shape)
    else:
        def kernel(feats_ref, coeffs_ref, t_ref, i_ref):
            c = pl.program_id(1)
            out = jnp.dot(feats_ref[...], coeffs_ref[...],
                          preferred_element_type=jnp.float32)
            part = jnp.min(out[:, :128], axis=1, keepdims=True)

            @pl.when(c == 0)
            def _():
                t_ref[...] = jnp.broadcast_to(part, t_ref.shape)
                i_ref[...] = jnp.zeros_like(i_ref)

            @pl.when(c != 0)
            def _():
                t_ref[...] = jnp.minimum(
                    t_ref[...], jnp.broadcast_to(part, t_ref.shape))

    @jax.jit
    def run(feats, coeffs):
        return pl.pallas_call(
            kernel,
            grid=(R // BL, n_chunk),
            in_specs=[
                pl.BlockSpec((BL, 16), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 4 * TC), lambda i, c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BL, 128), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BL, 128), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, 128), jnp.float32),
                jax.ShapeDtypeStruct((R, 128), jnp.int32),
            ],
        )(feats, coeffs)

    feats, coeffs = _put(feats_np, coeffs_np)
    tag = "dot+epi" if epilogue else "dot-only"
    try:
        np.asarray(run(feats, coeffs)[0])
        sec = _t(lambda: run(feats, coeffs))
        pairs = R * T
        report(
            f"grid sweep {tag} BL={BL} TC={TC}",
            sec * 1e3, "ms/sweep",
            f"{pairs/sec/1e9:.0f} Gpairs/s {2*pairs*16/sec/1e12:.1f} TFLOP/s",
        )
    except Exception as e:  # noqa: BLE001
        report(f"grid sweep {tag} BL={BL} TC={TC}", float("nan"), "ERROR",
               f"{type(e).__name__}: {str(e)[:160]}")


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
    for BL, TC in ((512, 2048), (2048, 512), (1024, 1024)):
        probe(jnp, jax, lax, BL, TC, epilogue=False)
        probe(jnp, jax, lax, BL, TC, epilogue=True)


if __name__ == "__main__":
    main()
