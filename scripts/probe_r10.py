"""Round-3 probe 10 (v5e): fused Plücker sweep in Pallas vs XLA.

Config 2 (teapot brute force) physics: the XLA path's (R,16)x(16,4T)
GEMM measured ~180 Gpairs/s bare, but the accept/min epilogue does not
fuse into the dot on TPU (XLA materialises dot outputs), so end-to-end
is HBM-round-trip-bound at ~25 Gpairs/s (32 B/pair). probe_r3c/r3d
showed a K=16 dot INSIDE a Mosaic kernel scalarises — but K zero-padded
to 128 is the MXU's native contraction and should lower cleanly.

Measured here, teapot shapes (R=262144, Tpad=6144):
1. xla-chunked    — today's plucker_sweep inner loop, one jit.
2. pallas-f32     — grid (R/RB, T/TC), 4 dots (RB,128)x(128,TC) with
                    fp32 accumulate + in-kernel epilogue + running
                    (t, id) fold in VMEM scratch. No HBM round trip.
3. pallas-bf16    — same kernel, bf16 inputs (accept-precision probe
                    for a future coarse+refine split; NOT production).

Usage: python scripts/probe_r10.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

print("devices:", jax.devices(), flush=True)

EPS = np.float32(1e-7)
INF = np.float32(np.inf)
R, T = 262144, 6144
RB, TC = 256, 1024
KP = 128  # padded contraction


def make_inputs(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    feats = np.zeros((R, KP), np.float32)
    feats[:, :16] = rng.standard_normal((R, 16)).astype(np.float32)
    coeffs = np.zeros((4, KP, T), np.float32)
    coeffs[:, :16, :] = rng.standard_normal((4, 16, T)).astype(np.float32)
    ids = np.arange(T, dtype=np.int32).reshape(1, T)
    return (jnp.asarray(feats, dtype), jnp.asarray(coeffs, dtype),
            jnp.asarray(ids))


def _epilogue(det, u_num, v_num, t_num, ids_b):
    f = 1.0 / det
    u = f * u_num
    v = f * v_num
    t = f * t_num
    ok = jnp.abs(det) >= EPS
    ok &= (u >= 0.0) & (u <= 1.0)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    ok &= t > EPS
    ok &= ids_b >= 0
    return jnp.where(ok, t, INF)


# ---------------------------------------------------------------- XLA
@jax.jit
def xla_sweep(feats, coeffs, ids):
    t_best = jnp.full((R,), INF)
    i_best = jnp.full((R,), -1, jnp.int32)
    f16 = feats[:, :16].astype(jnp.float32)
    for c0 in range(0, T, TC):
        cols = jnp.concatenate(
            [coeffs[k, :16, c0 : c0 + TC].astype(jnp.float32)
             for k in range(4)], axis=1
        )  # (16, 4*TC)
        out = jnp.dot(f16, cols, precision="highest")
        det = out[:, 0 * TC : 1 * TC]
        u_num = out[:, 1 * TC : 2 * TC]
        v_num = out[:, 2 * TC : 3 * TC]
        t_num = out[:, 3 * TC : 4 * TC]
        ids_b = ids[:, c0 : c0 + TC]
        t = _epilogue(det, u_num, v_num, t_num, ids_b)
        j = jnp.argmin(t, axis=-1)
        t_min = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        id_min = ids[0, c0 + j]
        closer = t_min < t_best
        t_best = jnp.where(closer, t_min, t_best)
        i_best = jnp.where(closer, id_min, i_best)
    return t_best, i_best


# ------------------------------------------------------------- Pallas
def _kernel(feats_ref, coeffs_ref, ids_ref, tb_ref, ib_ref, tacc, iacc):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        tacc[:] = jnp.full((RB, 1), INF, jnp.float32)
        iacc[:] = jnp.full((RB, 1), -1, jnp.int32)

    feats = feats_ref[:]  # (RB, KP)
    planes = [
        jnp.dot(feats, coeffs_ref[k], preferred_element_type=jnp.float32)
        for k in range(4)
    ]  # 4 x (RB, TC)
    ids_b = ids_ref[:]  # (1, TC) i32
    t = _epilogue(planes[0], planes[1], planes[2], planes[3], ids_b)
    t_min = jnp.min(t, axis=1, keepdims=True)  # (RB, 1)
    # argmin without a gather: min id among columns equal to the min
    big = jnp.int32(2**30)
    id_min = jnp.min(
        jnp.where(t == t_min, jnp.broadcast_to(ids_b, t.shape), big),
        axis=1, keepdims=True,
    )
    closer = t_min < tacc[:]
    tacc[:] = jnp.where(closer, t_min, tacc[:])
    iacc[:] = jnp.where(closer, id_min, iacc[:])

    @pl.when(j == nt - 1)
    def _out():
        tb_ref[:] = tacc[:]
        ib_ref[:] = iacc[:]


@jax.jit
def pallas_sweep(feats, coeffs, ids):
    grid = (R // RB, T // TC)
    tb, ib = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, KP), lambda i, j: (i, 0)),
            pl.BlockSpec((4, KP, TC), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, TC), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RB, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, 1), jnp.float32),
            pltpu.VMEM((RB, 1), jnp.int32),
        ],
    )(feats, coeffs, ids)
    return tb[:, 0], ib[:, 0]


def bench(name, fn, *args, reps=3):
    try:
        t0 = time.time()
        out = fn(*args)
        tb = np.asarray(out[0])
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        res = dict(name=name, ms=dt * 1e3,
                   gpairs_s=R * T / dt / 1e9, compile_s=round(compile_s, 1),
                   hits=int((tb < INF).sum()))
        print(json.dumps(res), flush=True)
        return res, tb
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        return dict(name=name, error=f"{type(e).__name__}: {e}"), None


results = []
feats, coeffs, ids = make_inputs()
r1, tb_xla = bench("xla-chunked", xla_sweep, feats, coeffs, ids)
results.append(r1)
r2, tb_pal = bench("pallas-f32", pallas_sweep, feats, coeffs, ids)
results.append(r2)
if tb_xla is not None and tb_pal is not None:
    finite = np.isfinite(tb_xla)
    close = bool(np.allclose(tb_xla[finite], tb_pal[finite],
                             rtol=3e-4, atol=1e-5))
    agree = float((np.isfinite(tb_pal) == finite).mean())
    print(f"agreement: finite-match {agree:.4f} t-close {close}", flush=True)
    results.append(dict(name="agreement", finite_match=agree, t_close=close))

fb, cb = make_inputs(jnp.bfloat16)[:2]
r3, _ = bench("pallas-bf16", pallas_sweep, fb, cb, ids)
results.append(r3)

with open("/tmp/probe_r10.json", "w") as f:
    json.dump(results, f, indent=1)
