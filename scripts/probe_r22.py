"""Round-3 probe 22 (v5e): EARLY respread — trade re-traced in-flight
pixels for cutting the full-width stage short.

probe_r21 anatomy of the 1.016s headline frame: stage0 = 384 full-width
iterations (~0.83s) whose late occupancy decays (active is already
6559/262144 at the boundary), + 0.1s respread, + ~0.1s of host syncs.
A shorter stage0 with a WIDER respread threshold re-traces every
unfinished pixel densely at near-full occupancy instead of grinding
the decayed stage: waste is only the in-flight pixels' partial samples
(~active lanes x half a pixel), a percent-level cost.

Grid: cap0 x _TAIL_RESPREAD_MAX. The respread tail currently runs
UNSTAGED to completion (_mega_tail_full) — at 32-64k widths its own
stragglers grind, so this probe brackets whether a staged tail is
needed before building it.

Usage: python scripts/probe_r22.py
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
    R._RETIRE_CURVES.clear()

    def once(stats=None):
        t0 = time.perf_counter()
        m, s, _ = render_batch_flat(scene, cam, cfg, 0, stage_stats=stats)
        segs = float(s)
        np.asarray(_tonemap_dev(m))
        return time.perf_counter() - t0, segs

    prev = None
    for i in range(10):
        dt, _ = once()
        if i >= 2 and prev is not None and abs(dt - prev) / prev < 0.07:
            break
        prev = dt
    best = segs = None
    for _ in range(2):
        dt, s = once()
        if best is None or dt < best:
            best, segs = dt, s
    stats = []
    once(stats)
    out = dict(name=tag, cap=cap, thresh=thresh, seconds=round(best, 3),
               mrays=round(segs / best / 1e6, 2),
               stages=[{k: (round(v, 4) if isinstance(v, float) else v)
                        for k, v in st.items() if k != "pixno_hist"}
                       for st in stats])
    results.append(out)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r22.json", "w") as f:
        json.dump(results, f, indent=1)


run("base-384-64k", 384, 65536)
run("c288-t256k", 288, 262144)
run("c256-t256k", 256, 262144)
run("c320-t256k", 320, 262144)
run("c256-t512k", 256, 524288)
run("c192-t512k", 192, 524288)
