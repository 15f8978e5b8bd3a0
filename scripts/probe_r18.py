"""Round-3 probe 18 (v5e): staging knobs under the respread tail.

With the deep tail now a dense re-trace batch (probe_r17: +12.6%
headline), the fixed-384 stage cap and the respread activation
threshold (_TAIL_RESPREAD_MAX = active*P bound) may sit elsewhere:
- a smaller cap checks/compacts more often (the old measurement said
  384 > 256 when the tail was expensive);
- a higher threshold respreads EARLIER (more lanes' remaining pixels
  re-traced densely instead of grinding capped stages at shrinking
  occupancy), at the cost of re-tracing more partial pixels and a
  wider tail batch.

Usage: python scripts/probe_r18.py
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

cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
                   seed_mode="reference", tile_size=256,
                   rays_per_batch=262144, pixels_per_lane=8,
                   mega_interleave=2)
scene, cam = bm.build_scene("bunny", cfg)


def run(tag, cap, thresh):
    R._MEGA_STAGE_ITERS = cap
    R._TAIL_RESPREAD_MAX = thresh
    for _ in range(2):
        m, s, _ = render_batch_flat(scene, cam, cfg, 0)
        _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        m, s, _ = render_batch_flat(scene, cam, cfg, 0)
        segs = float(s)
        np.asarray(_tonemap_dev(m))
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    out = dict(name=tag, cap=cap, thresh=thresh, seconds=round(best, 3),
               mrays=round(segs / best / 1e6, 2))
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r18.json", "w") as f:
        json.dump(results, f, indent=1)


run("base-384-64k", 384, 65536)
run("cap256", 256, 65536)
run("cap192", 192, 65536)
run("thresh128k", 384, 131072)
run("thresh32k", 384, 32768)
run("cap256-thresh128k", 256, 131072)
