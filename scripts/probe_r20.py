"""Round-3 probe 20 (v5e): idle reduction in the staged schedule.

The staged headline's effective rows/segment (~3.3) sits ~2x above the
live lane-iterations/segment (~1.6-1.7 post-chain-skip), and most of
that idle accrues BEFORE the first compaction: the ladder for a 262144
batch is [65536] only, so lanes that retire early idle at full width
until active < 65536. Candidates:

A. r/2 ladder level: widths [131072, 65536] — halves the idle width
   through the mid-retirement phase for one extra compact/fold +
   Mosaic shape. (The old "deeper ladders lose" measurement tested
   NARROWER levels, r/16 and r/64, never r/2.)
B. tail_passes=2 under the respread tail: the old probe_r4 loss
   (body +30%, iters only -8%) predates respread — stragglers now
   leave the batch early, so the bubble-collapsing tail pass gets a
   second chance at paying for itself on the main stages.
C. A+B if either wins alone.

Usage: python scripts/probe_r20.py
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


def run(tag, widths=None, **kw):
    R._STAGE_WIDTHS_OVERRIDE = widths
    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, seed_mode="reference", tile_size=256,
                       rays_per_batch=262144, pixels_per_lane=8,
                       mega_interleave=2, **kw)
    scene, cam = bm.build_scene("bunny", cfg)

    def once():
        t0 = time.perf_counter()
        m, s, _ = render_batch_flat(scene, cam, cfg, 0)
        segs = float(s)
        np.asarray(_tonemap_dev(m))
        return time.perf_counter() - t0, segs

    prev = None
    for i in range(10):  # warm to convergence (async compiles)
        dt, _ = once()
        if i >= 2 and prev is not None and abs(dt - prev) / prev < 0.07:
            break
        prev = dt
    best = segs = None
    for _ in range(2):
        dt, s = once()
        if best is None or dt < best:
            best, segs = dt, s
    out = dict(name=tag, seconds=round(best, 3),
               mrays=round(segs / best / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r20.json", "w") as f:
        json.dump(results, f, indent=1)


run("base")
run("ladder-r2", widths=[131072, 65536])
run("tp2", mega_tail_passes=2)
run("ladder-r2-tp2", widths=[131072, 65536], mega_tail_passes=2)
R._STAGE_WIDTHS_OVERRIDE = None
