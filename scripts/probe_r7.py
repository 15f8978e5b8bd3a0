"""Round-3 probe 7 (v5e): bisect the post-refactor staged regression.

probe_r6 (pre gfirst/skip refactor): staged 262k P=8 il2+floor ran
30.4-34.4 Mrays/s. probe_r5 (post): staged il1 27.0, staged il2 2.9.
Questions, each answered by one run group (separate processes because
MEGA_SKIP_CAP is baked at trace time and the in-process jit cache would
alias patched variants):

  main:  does schedule="carry" fix the il2 pathology (gfirst suspected),
         and what do plain il2 gfirst/carry cost at tail_passes=1?
  skip0: is the staged il1 27.0-vs-30.9 delta the chain-skip unroll?
         (MEGA_SKIP_CAP=0 restores the pre-refactor one-entry fold.)

Usage: python scripts/probe_r7.py {main|skip0}
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

mode = sys.argv[1] if len(sys.argv) > 1 else "main"
print("devices:", jax.devices(), "mode:", mode, flush=True)

BASE = dict(width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
            seed_mode="reference", tile_size=256, rays_per_batch=262144,
            pixels_per_lane=8)

if mode == "skip0":
    import tpurt.config as config_mod

    config_mod.MEGA_SKIP_CAP = 0
    RUNS = [
        # name, interleave, schedule, staged
        ("staged-262k-p8-il1-skip0", 1, "gfirst", True),
        ("plain-262k-p8-il1-skip0", 1, "gfirst", False),
    ]
else:
    RUNS = [
        ("staged-262k-p8-il1", 1, "gfirst", True),          # cached baseline
        ("staged-262k-p8-il2-carry", 2, "carry", True),     # the candidate fix
        ("plain-262k-p8-il2-carry", 2, "carry", False),
        ("plain-262k-p8-il2-gfirst", 2, "gfirst", False),
    ]

results = []
for name, il, sched, staged in RUNS:
    cfg = RenderConfig(
        **BASE, mega_interleave=il, mega_schedule=sched,
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

with open(f"/tmp/probe_r7_{mode}.json", "w") as f:
    json.dump(results, f, indent=1)
