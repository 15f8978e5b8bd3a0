"""Round-3 probe 11 (v5e): teapot 720p brute force through the DENSE
megakernel (mega_dense=True — fused Plücker sweep per segment,
render/plucker_fused.py) vs the modular plucker engine (today's
BASELINE config-2 row, 1.8 Mrays/s).

Estimate from probe_r10 (fused sweep 22.6 Gpairs/s at teapot shapes):
~3.5-4 Mrays/s — the modular row's ceiling is its AoS glue
(~0.57 us/segment), which the persistent-lane loop replaces.

Usage: python scripts/probe_r11.py
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

from tpurt.config import RenderConfig

print("devices:", jax.devices(), flush=True)

BASE = dict(width=1280, height=720, rays_per_pixel=8, max_bounces=4,
            seed_mode="reference", tile_size=256)

RUNS = [
    # name, extra config
    ("teapot-720p-dense-mega-plain",
     dict(mega_dense=True, rays_per_batch=230400, pixels_per_lane=4,
          compaction_threshold=0)),
    ("teapot-720p-dense-mega-staged",
     dict(mega_dense=True, rays_per_batch=230400, pixels_per_lane=4,
          compaction_threshold=32768)),
    ("teapot-720p-modular-plucker",
     dict(engine="modular", dense_engine="plucker",
          bruteforce_threshold=1 << 30)),
]

results = []
for name, extra in RUNS:
    cfg = RenderConfig(**BASE, **extra)
    t0 = time.time()
    try:
        res = bm.run_config(name, "teapot", cfg, repeats=2)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    res["compile_s"] = round(time.time() - t0 - 2 * res["seconds"], 1)
    results.append(res)
    print(json.dumps(res), flush=True)

with open("/tmp/probe_r11.json", "w") as f:
    json.dump(results, f, indent=1)
