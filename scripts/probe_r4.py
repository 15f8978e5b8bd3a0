"""Round-4 engine sweep: tail_passes x rays_per_batch x interleave on
the real chip (bunny-class 1080p ladder, the BASELINE config-3 scene).

Motivation (measured, notes/tpu_measurements.md):
- The XLA gather engine's row rate climbs with batch size: 161-169
  Mrows/s at 262k lanes, 240 at 524k, 300 at 1M — the engine currently
  runs 262k-lane batches, i.e. at ~55% of the 1M-lane rate.
- 0.9 of the 2.14 live lane-iterations/segment are non-gathering
  bubbles (cache-replay shades + pretest-fail enters) that
  mega_tail_passes=2 collapses.

Frame coverage at 1080p (2.07M pixels): (262144, P=8), (524288, P=4),
(1048576, P=2) all cover the frame in one launch.
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
    # name, rays_per_batch, pixels_per_lane, interleave, tail_passes, staged
    ("r262k-p8-il2-t2",  262144,  8, 2, 2, False),
    ("r262k-p8-il2-t2-staged", 262144, 8, 2, 2, True),
    ("r524k-p4-il2-t2",  524288,  4, 2, 2, False),
    ("r1m-p2-il2-t2",   1048576,  2, 2, 2, False),
    ("r1m-p2-il4-t2",   1048576,  2, 4, 2, False),
    ("r524k-p4-il2-t2-staged", 524288, 4, 2, 2, True),
    ("r1m-p2-il2-t2-staged", 1048576, 2, 2, 2, True),
]

results = []
for name, r, p, il, tp, staged in RUNS:
    cfg = RenderConfig(
        **BASE, rays_per_batch=r, pixels_per_lane=p, mega_interleave=il,
        mega_tail_passes=tp,
        compaction_threshold=(32768 if staged else 0),
    )
    scene, cam = bm.build_scene("bunny", cfg)
    t0 = time.time()
    try:
        res = bm.run_config(name, "bunny", cfg, repeats=2)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    res["compile_s"] = round(time.time() - t0 - 2 * res["seconds"], 1)
    results.append(res)
    print(json.dumps(res), flush=True)

with open("/tmp/probe_r4.json", "w") as f:
    json.dump(results, f, indent=1)
print("BEST:", max(results, key=lambda x: x["mrays"])["name"] if results
      else "none", flush=True)
