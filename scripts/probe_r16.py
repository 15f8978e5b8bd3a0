"""Round-3 probe 16 (v5e): bisect the >=524k-lane while_loop cliff.

Measured round 3: bare chained gathers scale 161 -> 200 -> 237 Mrows/s
at 262k/524k/1M lanes, but the PRODUCTION staged run collapses
(staged-524k-p4-il2 = 13.9 vs 262k-p8's 30.5 Mrays/s) — per-lane
iteration cost jumps ~4.5x somewhere outside the gather. If big
batches worked, the gather engine's better rate at 524k-1M lanes is
worth ~+15-45% headline by itself.

All configs cover the same 1920x1080 frame (b x P = 2.07M pixels):
  A  b=262144 P8 il2 staged   — the headline config (baseline ~30.5)
  B  b=524288 P4 il2 staged   — the measured cliff (13.9)
  C  b=262144 P8 il2 plain    — no staging
  D  b=524288 P4 il2 plain    — no staging, big batch
  E  b=524288 P4 il1 plain    — no interleave either
  F  b=524288 P4 il1 plain xla-body — no Mosaic in the loop

Usage: python scripts/probe_r16.py
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


def run(tag, **kw):
    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, seed_mode="reference", tile_size=256,
                       **kw)
    scene, cam = bm.build_scene("bunny", cfg)
    total = cfg.width * cfg.height
    b = cfg.rays_per_batch * cfg.pixels_per_lane
    n = -(-total // b)
    for _ in range(2):  # warm all batches twice (async compiles)
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        segs, iters = 0.0, 0
        outs = []
        for i in range(n):
            m, s, it = render_batch_flat(scene, cam, cfg, i * b)
            segs += float(s)
            iters += int(it) if it is not None else 0
            outs.append(m)
        for m in outs:
            np.asarray(_tonemap_dev(m))
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, segs, iters)
    dt, segs, iters = best
    out = dict(name=tag, seconds=round(dt, 3), mrays=round(segs / dt / 1e6, 2),
               iters=iters,
               us_per_iter=round(dt / iters * 1e6, 1) if iters else None,
               ns_per_lane_iter=round(dt / (iters * cfg.rays_per_batch) * 1e9, 2)
               if iters else None)
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r16.json", "w") as f:
        json.dump(results, f, indent=1)


run("C-262k-p8-il2-plain", rays_per_batch=262144, pixels_per_lane=8,
    mega_interleave=2, compaction_threshold=0)
run("A-262k-p8-il2-staged", rays_per_batch=262144, pixels_per_lane=8,
    mega_interleave=2)
run("D-524k-p4-il2-plain", rays_per_batch=524288, pixels_per_lane=4,
    mega_interleave=2, compaction_threshold=0)
run("B-524k-p4-il2-staged", rays_per_batch=524288, pixels_per_lane=4,
    mega_interleave=2)
run("E-524k-p4-il1-plain", rays_per_batch=524288, pixels_per_lane=4,
    mega_interleave=1, compaction_threshold=0)
run("F-524k-p4-il1-plain-xla", rays_per_batch=524288, pixels_per_lane=4,
    mega_interleave=1, compaction_threshold=0, mega_body="xla")
