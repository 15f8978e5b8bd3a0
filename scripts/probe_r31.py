"""Probe r31 (on-chip): tail_passes=2 combos, post-root-expansion.

probe_r30 found tail_passes=2 is now a +41% win (66.65 vs 47.27
staged) — root expansion doubled the replay-shade share of live
iterations, flipping probe_r4's old verdict. Chase the combos:
  1. staged tail2 + unroll4  (r30: unroll4 alone 55.5 > base 47.3)
  2. plain tail2             (r30: plain already 56.6 at 184 iters)
  3. staged tail3            (diminishing? the 3rd pass only pays if
                              shade->restart->shade chains are common)
  4. staged tail2, stage0 240 (re-sweep the cap under the new body)
Each leg is a fresh Mosaic compile (~2-4 min); one process.
"""

import json
import sys
import time


def main():
    sys.path.insert(0, "/root/repo")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import tpurt.config as tc
    from bench import build_scene, time_render_flat
    from tpurt.config import RenderConfig

    print(f"devices: {jax.devices()}", flush=True)
    base = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                        max_bounces=4, tile_size=256, seed_mode="reference",
                        pixels_per_lane=8, mega_interleave=4)
    scene, cam = build_scene("bunny", base)
    scene = jax.device_put(scene)

    def leg(tag, cfg, repeats=3):
        t0 = time.perf_counter()
        dt, segs, iters = time_render_flat(scene, cam, cfg, repeats=repeats)
        out = {"tag": tag, "mrays": round(segs / dt / 1e6, 2),
               "sec": round(dt, 3), "segs": segs,
               "wall": round(time.perf_counter() - t0, 1)}
        if iters:
            out["iters"] = iters
            out["us_per_iter"] = round(dt / iters * 1e6, 1)
        print(json.dumps(out), flush=True)

    t2 = base.replace(mega_tail_passes=2)
    # 0. anchor: staged tail2 (r30's winner) re-measured fresh-process
    leg("staged tail2", t2)
    # 1. tail2 + unroll4
    tc.MEGA_UNROLL = 4
    jax.clear_caches()
    leg("staged tail2 unroll4", t2, repeats=2)
    tc.MEGA_UNROLL = 2
    jax.clear_caches()
    # 2. plain tail2
    leg("plain tail2", t2.replace(compaction_threshold=0), repeats=2)
    # 3. staged tail3
    leg("staged tail3", base.replace(mega_tail_passes=3), repeats=2)


if __name__ == "__main__":
    main()
