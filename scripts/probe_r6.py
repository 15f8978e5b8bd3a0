"""Round-3 probe 6 (v5e): where does the staged headline's time go?

Per-stage wall/iters/actives for the bunny 1080p staged schedule
(262k lanes, P=8, il=2+floor), plus the quota-progress histogram of the
lanes that survive into the fold — the pixels a work-stealing schedule
could re-balance. Sizes the upside of quota stealing before building it.
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
from tpurt.render.renderer import render_batch_flat

print("devices:", jax.devices(), flush=True)

cfg = RenderConfig(
    width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
    seed_mode="reference", tile_size=256, rays_per_batch=262144,
    pixels_per_lane=8, mega_interleave=2, compaction_threshold=32768,
)
scene, cam = bm.build_scene("bunny", cfg)
print("mega_rows:", scene.mega_rows.shape, flush=True)

# Warm (compile) pass, then two measured passes with telemetry.
t0 = time.time()
mean, segs, _ = render_batch_flat(scene, cam, cfg, 0)
mean.block_until_ready()
print(f"warm+compile {time.time()-t0:.1f}s", flush=True)

out = {"runs": []}
for rep in range(2):
    stats = []
    t0 = time.perf_counter()
    mean, segs, _ = render_batch_flat(scene, cam, cfg, 0, stage_stats=stats)
    mean.block_until_ready()
    wall = time.perf_counter() - t0
    segsf = float(segs)
    out["runs"].append(dict(wall_s=wall, mrays=segsf / wall / 1e6,
                            stages=stats))
    print(json.dumps(out["runs"][-1]), flush=True)

with open("/tmp/probe_r6.json", "w") as f:
    json.dump(out, f, indent=1)
