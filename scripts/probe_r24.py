"""Round-3 probe 24 (v5e): cascade knob sweep with the probe-stage fix.

probe_r22/session-2 swept _CASCADE_STAGE0 BEFORE _CASCADE_PROBE landed:
the 256/240 collapse (~25 Mrays/s) was the next stage's 384-cap
overshooting the activation crossing, which the 96-iteration probe
stages now prevent. Re-sweep stage0 (and the probe cap itself) with the
fix in place — all these caps ride in the dynamic coords vector, so the
sweep reuses one executable set (no Mosaic recompiles).

Grid: stage0 in {224, 256, 288, 320} x probe in {64, 96, 128}, headline
frame (bunny 1080p 8spp, 262k x P8 il2 staged+cascade+replay). Schedule
caches reset per config so stale plans/curves never leak across knobs.

Usage: python scripts/probe_r24.py [stage0:probe ...]
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

CFG = dict(width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
           seed_mode="reference", tile_size=256, rays_per_batch=262144,
           pixels_per_lane=8, mega_interleave=2)

results = []


def run(stage0, probe):
    R._CASCADE_STAGE0 = stage0
    R._CASCADE_PROBE = probe
    R._SCHED_TRACES.clear()
    R._RETIRE_CURVES.clear()
    cfg = RenderConfig(**CFG)
    scene, cam = bm.build_scene("bunny", cfg)
    total = cfg.width * cfg.height
    b = cfg.rays_per_batch * cfg.pixels_per_lane
    n = -(-total // b)
    for _ in range(2):  # warm both the blocking and the replay frame
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
    out = dict(stage0=stage0, probe=probe, seconds=round(dt, 3),
               mrays=round(segs / dt / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r24.json", "w") as f:
        json.dump(results, f, indent=1)


if sys.argv[1:]:
    grid = [tuple(map(int, a.split(":"))) for a in sys.argv[1:]]
else:
    grid = [(288, 96), (256, 96), (224, 96), (320, 96),
            (256, 64), (256, 128), (288, 64)]
for s0, pr in grid:
    run(s0, pr)
