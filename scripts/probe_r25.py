"""Round-3 probe 25 (v5e): is the 4K anim row (23.6 Mrays/s) spp-bound
or resolution-bound?

The 4K BASELINE row runs 4 spp (the headline runs 8). At 4 spp a lane's
task halves while the batch's fixed costs (stage0 iterations that the
retirement curve needs, syncs, cascade levels, collect) stay similar —
so Mrays/s should fall well below the 8-spp headline at ANY resolution.
Test: the same 1080p frame at spp 4 / 8 / 16 (one batch, identical
Mosaic shapes — spp is a dynamic arg of the sample loop), plus 4K at
8 spp (4 batches, the anim row's shape at headline spp).

Usage: python scripts/probe_r25.py
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


def run(tag, width, height, spp):
    cfg = RenderConfig(width=width, height=height, rays_per_pixel=spp,
                       max_bounces=4, seed_mode="reference", tile_size=256,
                       rays_per_batch=262144, pixels_per_lane=8,
                       mega_interleave=2)
    scene, cam = bm.build_scene("bunny", cfg)
    total = cfg.width * cfg.height
    b = cfg.rays_per_batch * cfg.pixels_per_lane
    n = -(-total // b)
    for _ in range(2):
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        segs = 0.0
        outs = []
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            segs += float(s)
            outs.append(m)
        for m in outs:
            np.asarray(_tonemap_dev(m))
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, segs)
    dt, segs = best
    out = dict(name=tag, seconds=round(dt, 3),
               mrays=round(segs / dt / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r25.json", "w") as f:
        json.dump(results, f, indent=1)


run("1080p-spp4", 1920, 1080, 4)
run("1080p-spp8", 1920, 1080, 8)
run("1080p-spp16", 1920, 1080, 16)
run("4k-spp8", 3840, 2160, 8)
