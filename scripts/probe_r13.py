"""Round-3 probe 13 (v5e): why is the 4K anim row 2.7 Mrays/s when the
1080p headline (same batch shape: 262144 lanes, P=8, il2, staged) runs
30.5? Isolate the two differences — spp (4 vs 8) and the frame size
(4 batches, padded tail) — and pull per-stage telemetry on a 4K batch.

Usage: python scripts/probe_r13.py
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
from tpurt.render.renderer import render_batch_flat

print("devices:", jax.devices(), flush=True)

results = []

# 1. 1080p at spp=4 — same geometry as the headline, only spp differs.
cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=4, max_bounces=4,
                   seed_mode="reference", tile_size=256, rays_per_batch=262144,
                   pixels_per_lane=8, mega_interleave=2)
t0 = time.time()
res = bm.run_config("bunny-1080p-spp4-staged", "bunny", cfg, repeats=2)
res["compile_s"] = round(time.time() - t0 - 2 * res["seconds"], 1)
results.append(res)
print(json.dumps(res), flush=True)

# 2. 4K single frame through the standard timed path (reports batches).
cfg4k = cfg.replace(width=3840, height=2160)
t0 = time.time()
res = bm.run_config("bunny-4k-spp4-staged", "bunny", cfg4k, repeats=2)
res["compile_s"] = round(time.time() - t0 - 2 * res["seconds"], 1)
results.append(res)
print(json.dumps(res), flush=True)

# 3. Per-stage telemetry on 4K batches 0 and 3 (3 is the padded tail).
scene, cam = bm.build_scene("bunny", cfg4k)
b = 262144 * 8
for batch in (0, 3):
    stats = []
    t0 = time.perf_counter()
    mean, segs, _ = render_batch_flat(scene, cam, cfg4k, batch * b,
                                      stage_stats=stats)
    mean.block_until_ready()
    wall = time.perf_counter() - t0
    out = dict(name=f"4k-batch{batch}-stages", wall_s=wall,
               segs=float(segs), stages=stats)
    results.append(out)
    print(json.dumps(out), flush=True)

with open("/tmp/probe_r13.json", "w") as f:
    json.dump(results, f, indent=1)
