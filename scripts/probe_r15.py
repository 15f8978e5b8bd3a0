"""Round-3 probe 15 (v5e): per-batch breakdown of the warm 4K frame.

probe_r14 cleared the suspects probe_r13 pointed at: the all-miss
batch0 finishes its capped stage in 32 iterations / 0.11s, the mid
batch stage0 in 0.45s — yet the WARM full frame measures 24s
(run_config best-of-2). This times every render_batch_flat call and
the final tonemap D2H separately after two full warm passes.

Usage: python scripts/probe_r15.py
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

from tpurt.config import RenderConfig
from tpurt.render.renderer import _tonemap_dev, render_batch_flat

print("devices:", jax.devices(), flush=True)

cfg = RenderConfig(width=3840, height=2160, rays_per_pixel=4, max_bounces=4,
                   seed_mode="reference", tile_size=256, rays_per_batch=262144,
                   pixels_per_lane=8, mega_interleave=2)
scene, cam = bm.build_scene("bunny", cfg)
b = 262144 * 8
n_batches = 4
results = []

# Two full warm passes (compile everything, absorb async compile waits).
for w in range(2):
    t0 = time.perf_counter()
    outs = []
    for i in range(n_batches):
        m, s, _ = render_batch_flat(scene, cam, cfg, i * b)
        outs.append(m)
    for m in outs:
        np.asarray(_tonemap_dev(m))
    print(f"warm pass {w}: {time.perf_counter() - t0:.2f}s", flush=True)

# Timed pass, per-batch walls (dispatch+drain per call: each batch's
# render_batch_flat already syncs internally at stage boundaries).
for trial in range(2):
    per = []
    t0 = time.perf_counter()
    outs = []
    for i in range(n_batches):
        tb = time.perf_counter()
        stats = []
        m, s, _ = render_batch_flat(scene, cam, cfg, i * b, stage_stats=stats)
        outs.append(m)
        per.append(dict(batch=i, wall_s=round(time.perf_counter() - tb, 3),
                        segs=float(s), stages=stats))
    td = time.perf_counter()
    for m in outs:
        np.asarray(_tonemap_dev(m))
    d2h = time.perf_counter() - td
    total = time.perf_counter() - t0
    out = dict(name=f"4k-frame-trial{trial}", total_s=round(total, 3),
               d2h_s=round(d2h, 3), batches=per)
    results.append(out)
    print(json.dumps(out), flush=True)

with open("/tmp/probe_r15.json", "w") as f:
    json.dump(results, f, indent=1)
