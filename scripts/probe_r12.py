"""Round-3 probe 12 (v5e): two cheap ladder tunings.

1. 4K anim sweep (BASELINE config 5) quota depth: P=16 halves the
   launches per frame (8.3M pixels / (262144*P)) and deepens the quota
   smoothing; measured against the current P=8 row.
2. Headline staged schedule with stage cap 512 instead of 384 (fewer
   host round-trips per batch; the 384 grid was tuned at il=1 before
   the inline il=2 overlap landed). Separate process-group from (1)
   because _MEGA_STAGE_ITERS is read at stage-launch time.

Usage: python scripts/probe_r12.py {anim|cap512}
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

mode = sys.argv[1] if len(sys.argv) > 1 else "anim"
print("devices:", jax.devices(), "mode:", mode, flush=True)

results = []
if mode == "anim":
    for p in (8, 16):
        cfg = RenderConfig(
            width=3840, height=2160, rays_per_pixel=4, max_bounces=4,
            seed_mode="reference", tile_size=256, rays_per_batch=262144,
            pixels_per_lane=p, mega_interleave=2,
        )
        t0 = time.time()
        res = bm.run_config_anim(f"4k-anim-p{p}", "bunny", cfg, frames=2)
        res["compile_s"] = round(time.time() - t0, 1)
        results.append(res)
        print(json.dumps(res), flush=True)
else:
    import tpurt.render.renderer as rmod

    rmod._MEGA_STAGE_ITERS = 512
    cfg = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        seed_mode="reference", tile_size=256, rays_per_batch=262144,
        pixels_per_lane=8, mega_interleave=2, compaction_threshold=32768,
    )
    t0 = time.time()
    res = bm.run_config("staged-262k-p8-il2-cap512", "bunny", cfg, repeats=3)
    res["compile_s"] = round(time.time() - t0 - 3 * res["seconds"], 1)
    results.append(res)
    print(json.dumps(res), flush=True)

with open(f"/tmp/probe_r12_{mode}.json", "w") as f:
    json.dump(results, f, indent=1)
