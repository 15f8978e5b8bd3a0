"""Round-3 probe 27 (v5e): two row-DMAs in flight ("pair2") and a
dynamic_gather retry.

The headline iteration is gather-bound: 262k rows/iter at the engine's
161-207 Mrows/s descriptor rate is ~1.3-1.6 ms of the ~2.2 ms/iter.
probe_r3b measured the bare-chain engine +20% with TWO independent
gathers per step (193 vs 161 Mrows/s). The inline interleave schedule
never has two DMAs in flight (gather_j waits on body_{j-1}'s lanes,
serialised g0 b0 g1 b1). "pair2" at interleave=4 emits gathers in
pairs: g0 g1 b0 b1 g2 g3 b2 b3 — two 65k-row DMAs overlap, and each
pair's bodies cover the next pair's DMAs.

Grid: headline frame staged, {il2-inline (baseline), il4-inline
(width control), il4-pair2}, plus a one-shot tpu.dynamic_gather lower
test (notes/tpu_measurements.md recorded it failing with HTTP 500 on
the round-2 toolchain; if it lowers now, a VMEM-resident bank —
13076 x 160 f32 = 8.4 MB for the bunny — unlocks the fully fused
persistent kernel).

Usage: python scripts/probe_r27.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import importlib.util

spec = importlib.util.spec_from_file_location("benchmod", "bench.py")
bm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bm)

import numpy as np

import tpurt.config as C
from tpurt.config import RenderConfig
from tpurt.render import renderer as R
from tpurt.render.renderer import _tonemap_dev, render_batch_flat

print("devices:", jax.devices(), flush=True)

results = []


def dynamic_gather_retry():
    """Does a per-lane VMEM gather lower on the current toolchain?"""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    table = jnp.arange(512 * 8, dtype=jnp.float32).reshape(512, 8)
    idx = jnp.arange(1024, dtype=jnp.int32) % 512

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1024, 8), jnp.float32),
        )(table, idx)
        ok = bool(np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)]))
        return {"name": "dynamic_gather", "lowers": True, "correct": ok}
    except Exception as e:  # noqa: BLE001 - probe records the failure mode
        return {"name": "dynamic_gather", "lowers": False,
                "err": type(e).__name__ + ": " + str(e)[:200]}


def run(tag, interleave, schedule, floor):
    C.MEGA_INTERLEAVE_FLOOR = floor
    R._SCHED_TRACES.clear()
    R._RETIRE_CURVES.clear()
    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, seed_mode="reference", tile_size=256,
                       rays_per_batch=262144, pixels_per_lane=8,
                       mega_interleave=interleave, mega_schedule=schedule)
    scene, cam = bm.build_scene("bunny", cfg)
    total = cfg.width * cfg.height
    b = cfg.rays_per_batch * cfg.pixels_per_lane
    n = -(-total // b)
    for _ in range(2):
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        segs = 0.0
        outs = []
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            segs += float(s)
            outs.append(m)
        for m in outs:
            np.asarray(_tonemap_dev(m))
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, segs)
    dt, segs = best
    out = dict(name=tag, seconds=round(dt, 3), mrays=round(segs / dt / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r27.json", "w") as f:
        json.dump(results, f, indent=1)


results.append(dynamic_gather_retry())
print(json.dumps(results[-1]), flush=True)

run("il2-inline", 2, "inline", 131072)
run("il4-inline", 4, "inline", 65536)
run("il4-pair2", 4, "pair2", 65536)
