"""Round-3 probe 17 (v5e): respread tail A/B + big-batch 4K.

1. bunny-1080p staged headline, respread ON vs OFF (expected: the
   uncapped 65536-wide tail — ~0.25s at ~3% occupancy — becomes a
   ~2-4k dense P=1 batch).
2. 4K frame, 262k-P8 (4 batches) respread ON, and 524k-P8 (2 batches):
   the gather engine measures 161->200+ Mrows/s going 262k->524k and
   fewer batches mean fewer tails.

Usage: python scripts/probe_r17.py
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

results = []


def run(tag, width, height, spp, **kw):
    cfg = RenderConfig(width=width, height=height, rays_per_pixel=spp,
                       max_bounces=4, seed_mode="reference", tile_size=256,
                       mega_interleave=2, **kw)
    scene, cam = bm.build_scene("bunny", cfg)
    total = cfg.width * cfg.height
    b = cfg.rays_per_batch * cfg.pixels_per_lane
    n = -(-total // b)
    for _ in range(2):
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        segs = 0.0
        outs = []
        for i in range(n):
            m, s, _ = render_batch_flat(scene, cam, cfg, i * b)
            segs += float(s)
            outs.append(m)
        for m in outs:
            np.asarray(_tonemap_dev(m))
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, segs)
    dt, segs = best
    out = dict(name=tag, seconds=round(dt, 3),
               mrays=round(segs / dt / 1e6, 2), batches=n)
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r17.json", "w") as f:
        json.dump(results, f, indent=1)


run("1080p-respread", 1920, 1080, 8, rays_per_batch=262144,
    pixels_per_lane=8)
run("1080p-respread-off", 1920, 1080, 8, rays_per_batch=262144,
    pixels_per_lane=8, mega_tail_respread=False)
run("4k-262k-respread", 3840, 2160, 4, rays_per_batch=262144,
    pixels_per_lane=8)
run("4k-524k-respread", 3840, 2160, 4, rays_per_batch=524288,
    pixels_per_lane=8)
