"""Round-3 probe 21 (v5e): host-sync (tunnel RTT) share of the staged
schedule.

The staged driver blocks the host on int(active) at every stage
boundary; over the axon tunnel that round trip could idle the device.
Measures:
1. Raw scalar-readback RTT: float() of a tiny READY device array, and
   of a freshly dispatched trivial computation.
2. The headline frame with stage_stats: per-stage wall next to the
   total, so the sum of stage walls vs the frame wall bounds what
   batch-level pipelining could recover.

Usage: python scripts/probe_r21.py
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
from tpurt.render.renderer import _tonemap_dev, render_batch_flat

print("devices:", jax.devices(), flush=True)

# --- 1. scalar readback RTT ------------------------------------------
x = jnp.arange(256, dtype=jnp.int32)
x.block_until_ready()
s = jnp.sum(x)
s.block_until_ready()
for tag, fn in [
    ("ready-scalar-float", lambda: float(s)),
    ("dispatch+readback", lambda: float(jnp.sum(x))),
]:
    fn()
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"name": tag, "ms": round(dt * 1e3, 3)}), flush=True)

# --- 2. headline frame with per-stage telemetry ----------------------
cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
                   seed_mode="reference", tile_size=256,
                   rays_per_batch=262144, pixels_per_lane=8,
                   mega_interleave=2)
scene, cam = bm.build_scene("bunny", cfg)


def once(stats=None):
    t0 = time.perf_counter()
    m, sg, _ = render_batch_flat(scene, cam, cfg, 0, stage_stats=stats)
    segs = float(sg)
    np.asarray(_tonemap_dev(m))
    return time.perf_counter() - t0, segs

prev = None
for i in range(10):
    dt, _ = once()
    if i >= 2 and prev is not None and abs(dt - prev) / prev < 0.07:
        break
    prev = dt
dt_plain, segs = once()
stats = []
dt_stats, _ = once(stats)
print(json.dumps({"name": "frame", "seconds": round(dt_plain, 3),
                  "mrays": round(segs / dt_plain / 1e6, 2),
                  "seconds_with_stats": round(dt_stats, 3)}), flush=True)
stage_sum = sum(s.get("wall_s", 0.0) for s in stats)
print(json.dumps({"name": "stage-sum", "seconds": round(stage_sum, 3),
                  "stages": [
                      {k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in st.items()} for st in stats
                  ]}), flush=True)
