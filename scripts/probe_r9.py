"""Round-3 probe 9 (v5e): confirm the restored "inline" interleave
schedule and size the big-batch candidate.

probe_r6 (inline-era code) measured staged 262k P=8 il2+floor at
30.4-34.4 Mrays/s; the gfirst refactor regressed that to 2.9 and carry
only recovers 19.3 (probe_r7). With "inline" restored as the default:

1. staged-262k-p8-il2-inline — the headline config. Expect ~30-34.
2. staged-1m-p2-il2-inline — the gather engine runs 300 vs 207 Mrows/s
   at 1M lanes (notes), IF the staged fold ladder (262k, 65k) controls
   the straggler idle that made plain 1M batches 12.5 iters/seg.
3. staged-524k-p4-il2-inline — the middle point; also re-tests the
   524k per-iteration anomaly (probe_r4/r5) under the inline schedule.

Usage: python scripts/probe_r9.py
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

BASE = dict(width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
            seed_mode="reference", tile_size=256)

RUNS = [
    # name, rays_per_batch, P, interleave
    ("staged-262k-p8-il2-inline", 262144, 8, 2),
    ("staged-1m-p2-il2-inline", 1048576, 2, 2),
    ("staged-524k-p4-il2-inline", 524288, 4, 2),
]

results = []
for name, r, p, il in RUNS:
    cfg = RenderConfig(
        **BASE, rays_per_batch=r, pixels_per_lane=p, mega_interleave=il,
        mega_schedule="inline", compaction_threshold=32768,
    )
    t0 = time.time()
    try:
        res = bm.run_config(name, "bunny", cfg, repeats=3)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    res["compile_s"] = round(time.time() - t0 - 3 * res["seconds"], 1)
    results.append(res)
    print(json.dumps(res), flush=True)

with open("/tmp/probe_r9.json", "w") as f:
    json.dump(results, f, indent=1)
