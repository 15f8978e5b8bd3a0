"""Round-3 probe 26 (v5e): scale the cascade stage0 cap with per-lane
work.

probe_r25 showed the ladder's low-spp rows are bound by the FIXED
stage0 cap (288, tuned at P=8 x 8 spp): at 4 spp lanes retire ~2x
sooner, the activation crossing happens near iteration ~150, and the
batch grinds the remaining ~140 iterations at collapsing occupancy
before the first boundary even looks. Hypothesis: cap0 should scale
with per-lane work (P x spp), i.e. cap0 ~ 288 * (P*spp)/64, clamped to
[96, 384].

Grid: 1080p at spp {4, 16} x stage0 {scaled, 288}, then 4K spp4 (the
anim row's real shape) at {scaled, 288}.

Usage: python scripts/probe_r26.py
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
from tpurt.render import renderer as R
from tpurt.render.renderer import _tonemap_dev, render_batch_flat

print("devices:", jax.devices(), flush=True)

results = []


def run(tag, width, height, spp, stage0):
    R._CASCADE_STAGE0 = stage0
    R._SCHED_TRACES.clear()
    R._RETIRE_CURVES.clear()
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
    out = dict(name=tag, stage0=stage0, seconds=round(dt, 3),
               mrays=round(segs / dt / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r26.json", "w") as f:
        json.dump(results, f, indent=1)


run("1080p-spp4-s144", 1920, 1080, 4, 144)
run("1080p-spp4-s96", 1920, 1080, 4, 96)
run("1080p-spp16-s384", 1920, 1080, 16, 384)
run("1080p-spp16-s288", 1920, 1080, 16, 288)
run("4k-spp4-s144", 3840, 2160, 4, 144)
run("4k-spp4-s288", 3840, 2160, 4, 288)
