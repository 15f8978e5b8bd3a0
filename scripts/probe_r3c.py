"""Round-3 probes: dense-MXU megakernel core loop feasibility.

The dense-MXU megakernel mode (VERDICT.md round-2 item 2) replaces BVH
traversal with one Pluecker GEMM per path segment: per lane block,
dot (BL, 16) x (16, 4T) against the scene's coefficient table with the
accept/min epilogue FUSED in VMEM (the XLA plucker_sweep's (R, 4T)
epilogue streams HBM and caps end-to-end at ~25 Gpairs/s; the GEMM
alone measured ~180 Gpairs/s, notes/tpu_measurements.md).

These probes measure the fused in-kernel rate at VMEM-feasible shapes:
grid over lane blocks, static chunk loop over triangle columns,
running-min fold — the exact compute shape of the future mode.

Usage: python scripts/probe_r3c.py [--cpu]
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


def probe_fused_sweep(jnp, jax, lax):
    """Grid over lane blocks; per block: chunked dot + fused epilogue
    (accept tests, running min over tris). R total lanes, T tris."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 262144
    T = 6144  # teapot-class
    CPAD = 4 * T  # component-major columns

    rng = np.random.default_rng(0)
    coeffs_np = (rng.standard_normal((16, CPAD)) * 0.1).astype(np.float32)

    for BL, CHUNK in ((512, 2048), (1024, 2048), (512, 4096), (256, 2048)):
        n_chunk = T * 4 // (CHUNK * 4) * 4  # chunks of CHUNK cols... use cols
        # chunk in TRIANGLES: TC tris -> 4*TC cols read as 4 slices
        TC = CHUNK // 4 * 4
        TC = CHUNK  # interpret CHUNK as tris per chunk
        n_chunk = T // TC
        if n_chunk * TC != T:
            continue

        def kernel(feats_ref, coeffs_ref, tmin_ref, id_ref, *, TC=TC,
                   n_chunk=n_chunk):
            f = feats_ref[...]  # (BL, 16)
            tbest = jnp.full((f.shape[0], 1), np.float32(np.inf))
            ibest = jnp.zeros((f.shape[0], 1), jnp.int32)
            for c in range(n_chunk):
                # component-major groups: det | u | v | t, each (16, T)
                cols = [
                    coeffs_ref[:, k * T + c * TC:(k * T + (c + 1) * TC)]
                    for k in range(4)
                ]
                block = jnp.concatenate(cols, axis=1)  # (16, 4*TC)
                out = jnp.dot(f, block, preferred_element_type=jnp.float32)
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
                tm = jnp.min(t, axis=1, keepdims=True)
                iota = lax.broadcasted_iota(jnp.int32, t.shape, 1)
                im = jnp.min(
                    jnp.where(t == tm, iota + c * TC, np.int32(2**30)),
                    axis=1, keepdims=True,
                )
                closer = tm < tbest
                tbest = jnp.where(closer, tm, tbest)
                ibest = jnp.where(closer, im, ibest)
            tmin_ref[...] = jnp.broadcast_to(tbest, tmin_ref.shape)
            id_ref[...] = jnp.broadcast_to(ibest, id_ref.shape)

        @jax.jit
        def run(feats, coeffs):
            grid = R // BL
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((BL, 16), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, CPAD), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((BL, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BL, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((R, 128), jnp.float32),
                    jax.ShapeDtypeStruct((R, 128), jnp.int32),
                ],
            )(feats, coeffs)

        feats = _put(rng.standard_normal((R, 16)).astype(np.float32))
        coeffs = _put(coeffs_np)
        try:
            np.asarray(run(feats, coeffs)[0])
            sec = _t(lambda: run(feats, coeffs))
            pairs = R * T
            report(
                f"fused sweep BL={BL} TC={TC} (R=262k, T=6144)",
                sec * 1e3, "ms/sweep",
                f"{pairs/sec/1e9:.0f} Gpairs/s "
                f"{2*pairs*16/sec/1e12:.1f} TFLOP/s",
            )
        except Exception as e:  # noqa: BLE001
            report(f"fused sweep BL={BL} TC={TC}", float("nan"), "ERROR",
                   f"{type(e).__name__}: {str(e)[:200]}")


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
    probe_fused_sweep(jnp, jax, lax)


if __name__ == "__main__":
    main()
