"""Round-3 probe 14 (v5e): decompose the 4K batch0 anomaly.

probe_r13 showed the all-miss top-quarter batch of the 4K frame takes
21.6s on TPU (vs 1.4s for the 3x-more-segments tail batch) while its
lanes all retire within the first 384-cap stage. Same batch content is
fast on CPU. This probe pulls iters/active/wall for the capped first
stage on the all-miss batch vs a mid-frame batch, then bisects caps.

Usage: python scripts/probe_r14.py
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

import jax.numpy as jnp
import numpy as np

from tpurt.config import RenderConfig
from tpurt.render import renderer as R

print("devices:", jax.devices(), flush=True)

cfg = RenderConfig(width=3840, height=2160, rays_per_pixel=4, max_bounces=4,
                   seed_mode="reference", tile_size=256, rays_per_batch=262144,
                   pixels_per_lane=8, mega_interleave=2)
scene, cam = bm.build_scene("bunny", cfg)

b = 262144
statics = R._mega_statics(cfg, cfg.width, cfg.height)
results = []


def stage0(start, cap, tag):
    coords = jnp.asarray([start, 0, 0, cap], jnp.int32)
    t0 = time.perf_counter()
    state, active = R._mega_flat_start(
        scene, cam, coords, batch=b, pixels_per_lane=8, **statics
    )
    active = int(active)
    iters = int(state.iters)
    wall = time.perf_counter() - t0
    out = dict(name=tag, start=start, cap=cap, wall_s=round(wall, 3),
               iters=iters, active=active,
               us_per_iter=round(wall / max(iters, 1) * 1e6, 1))
    results.append(out)
    print(json.dumps(out), flush=True)
    return out


px_per_batch = b * 8
# warmup/compile on the mid batch (batch1: mixed content)
stage0(px_per_batch, 384, "warmup-mid")
stage0(px_per_batch, 384, "mid-384")
stage0(0, 384, "allmiss-384")
stage0(0, 384, "allmiss-384-again")
stage0(0, 32, "allmiss-32")
stage0(px_per_batch, 32, "mid-32")
stage0(0, 160, "allmiss-160")

with open("/tmp/probe_r14.json", "w") as f:
    json.dump(results, f, indent=1)
