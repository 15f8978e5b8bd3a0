"""Round-3 probe 5 (v5e): interleave-floor headline check + the 524k
batch blowup diagnosis.

Questions:
1. Does the MEGA_INTERLEAVE_FLOOR fix restore the staged headline?
   (staged il=2 measured 27.4 vs il=1's 30.9 because the 65k tail
   stage ran 32k sub-gathers; with the floor the tail reverts to il=1
   while the full-width stages keep the overlap win.)
2. Is the r=524288 collapse (23 ms/iter vs the expected ~2x262k cost,
   probe_r4) a property of the interleave split, the Mosaic body, or
   the surrounding XLA graph at that size? Probe il=1 and body=xla.
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
    # name, rays_per_batch, P, interleave, body, staged
    ("staged-262k-p8-il1", 262144, 8, 1, "auto", True),   # round-2 exact
    ("staged-262k-p8-il2-floor", 262144, 8, 2, "auto", True),  # the fix
    ("plain-524k-p4-il1", 524288, 4, 1, "auto", False),   # blowup: split?
    ("plain-524k-p4-il1-xla", 524288, 4, 1, "xla", False),  # blowup: body?
]

results = []
for name, r, p, il, body, staged in RUNS:
    cfg = RenderConfig(
        **BASE, rays_per_batch=r, pixels_per_lane=p, mega_interleave=il,
        mega_body=body,
        compaction_threshold=(32768 if staged else 0),
    )
    t0 = time.time()
    try:
        res = bm.run_config(name, "bunny", cfg, repeats=2)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    res["compile_s"] = round(time.time() - t0 - 2 * res["seconds"], 1)
    results.append(res)
    print(json.dumps(res), flush=True)

with open("/tmp/probe_r5.json", "w") as f:
    json.dump(results, f, indent=1)
