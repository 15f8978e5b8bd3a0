"""Round-3 probe 8 (v5e): paired-row gather physics + the 524k anomaly.

Two questions that gate the round-3 traversal redesign:

1. PAIRED ROWS: the gather engine is row-count-bound at <=160 f32
   (207 Mrows/s at 262k lanes = 132 GB/s, under the ~200 GB/s byte
   bound). A 208-wide row carries TWO 104-word nodes — if W=208 fetches
   at the same rows/s as W=160, every consumed second node is free
   traversal progress. Measure the chained-gather rate at
   W in {160, 208, 256, 320} x R in {262144, 1048576}.

2. 524k ANOMALY: the full megakernel ran 20 ns/lane-iter at R=524288
   vs 8.8 at 262k and ~10.7 at 1M (probe_r4/r5) — but the bare gather
   microbench measured 524k FASTER (240 vs 161 Mrows/s). Is the
   production TRANSPOSED gather form (rows_t[:, idx] -> (W, R)) the
   difference? Measure both forms at 262k/524k/1M.

Usage: python scripts/probe_r8.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

print("devices:", jax.devices(), flush=True)

ITERS = 32
N = 16384  # ~bunny-bank row count


@functools.partial(jax.jit, static_argnames=("w",))
def run_rowmajor(table, idx0, *, w):
    """Chained table[idx] -> (R, W); next idx depends on fetched data."""

    def body(i, idx):
        rows = table[idx]  # (R, W)
        nxt = rows[:, 0].astype(jnp.int32)
        return jnp.abs(idx + nxt + i) % N

    return jnp.sum(lax.fori_loop(0, ITERS, body, idx0))


@functools.partial(jax.jit, static_argnames=("w",))
def run_transposed(table_t, idx0, *, w):
    """Chained rows_t[:, idx] -> (W, R) — the production megakernel
    form (megakernel.py:_gather)."""

    def body(i, idx):
        rows = table_t[:, idx]  # (W, R)
        nxt = rows[0].astype(jnp.int32)
        return jnp.abs(idx + nxt + i) % N

    return jnp.sum(lax.fori_loop(0, ITERS, body, idx0))


def measure(fn, table, r, w, reps=3):
    rng = np.random.default_rng(0)
    idx0 = jax.device_put(rng.integers(0, N, size=r).astype(np.int32))
    idx0.block_until_ready()
    out = fn(table, idx0, w=w)  # compile + warm
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(table, idx0, w=w))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rows = ITERS * r
    return dict(us_per_iter=dt / ITERS * 1e6, mrows_s=rows / dt / 1e6,
                gb_s=rows * w * 4 / dt / 1e9)


results = []
rng = np.random.default_rng(1)

# --- Q1: width curve, row-major form ---------------------------------
for w in (160, 208, 256, 320):
    tab = rng.random((N, w), np.float32) * 7
    table = jax.device_put(tab)
    table.block_until_ready()
    for r in (262144, 1048576):
        res = dict(form="rowmajor", w=w, r=r, **measure(run_rowmajor, table, r, w))
        results.append(res)
        print(json.dumps(res), flush=True)

# --- Q2: transposed (production) form, incl. 524k --------------------
for w in (160, 208):
    tab = rng.random((w, N), np.float32) * 7
    table_t = jax.device_put(tab)
    table_t.block_until_ready()
    for r in (262144, 524288, 1048576):
        res = dict(form="transposed", w=w, r=r,
                   **measure(run_transposed, table_t, r, w))
        results.append(res)
        print(json.dumps(res), flush=True)

# row-major at 524k closes the anomaly triangle
tab = rng.random((N, 160), np.float32) * 7
table = jax.device_put(tab)
table.block_until_ready()
res = dict(form="rowmajor", w=160, r=524288,
           **measure(run_rowmajor, table, 524288, 160))
results.append(res)
print(json.dumps(res), flush=True)

with open("/tmp/probe_r8.json", "w") as f:
    json.dump(results, f, indent=1)
