"""Round-3 probe 23 (v5e): do big lane batches win WITH the cascade?

Pre-cascade, big batches lost badly (probe_r16: staged 524k-P4 = 20.9
vs 262k-P8 = 36.6 Mrays/s) even though per-LANE-iteration cost is
scale-flat (8.1-8.3 ns) and the bare gather engine keeps improving
(161 -> 200 -> 237 Mrows/s at 262k/524k/1M). The loss was idle: a
shallower quota averages straggler variance worse, widening the
decaying-occupancy tail. The cascade respread exists precisely to
redistribute that tail at full occupancy — so re-measure the shape
ladder with mega_cascade on.

All configs cover the same 1920x1080 x 8spp frame (b x P = 2.07M px):
  A  b=262144 P8  il2 staged+cascade  — committed headline shape
  B  b=524288 P4  il2 staged+cascade  — gather rate +25% vs A
  C  b=1048576 P2 il2 staged+cascade  — gather rate +85% vs A

Each config is timed twice per process pass (speculative replay means
frame 2+ runs the cached schedule); report both the blocking and the
replayed frame.

Usage: python scripts/probe_r23.py [shapes...]
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
    for _ in range(3):
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
               iters=iters)
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r23.json", "w") as f:
        json.dump(results, f, indent=1)


SHAPES = dict(
    A=dict(rays_per_batch=262144, pixels_per_lane=8, mega_interleave=2),
    B=dict(rays_per_batch=524288, pixels_per_lane=4, mega_interleave=2),
    C=dict(rays_per_batch=1048576, pixels_per_lane=2, mega_interleave=2),
)

want = sys.argv[1:] or list(SHAPES)
for key in want:
    kw = SHAPES[key]
    run(f"{key}-{kw['rays_per_batch']//1024}k-p{kw['pixels_per_lane']}"
        "-il2-staged-cascade", **kw)
