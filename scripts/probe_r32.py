"""Probe r32 (on-chip): tail3 combos, post-root-expansion.

probe_r31: staged tail3 = 76.07 > tail2+unroll4 74.82 > plain tail2
73.41 > staged tail2 66.26. The third replay pass still pays, so chase
its combos and the remaining orthogonal knobs:
  1. staged tail3 + unroll4   (both wins at once?)
  2. staged tail4             (where does the pass ladder flatten?)
  3. plain tail3              (does compaction still pay under tail3?)
  4. staged tail3 + il2       (interleave re-sweep under the new body)
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

    t3 = base.replace(mega_tail_passes=3)
    # 1. tail3 + unroll4
    tc.MEGA_UNROLL = 4
    jax.clear_caches()
    leg("staged tail3 unroll4", t3, repeats=2)
    tc.MEGA_UNROLL = 2
    jax.clear_caches()
    # 2. tail4
    leg("staged tail4", base.replace(mega_tail_passes=4), repeats=2)
    # 3. plain tail3
    leg("plain tail3", t3.replace(compaction_threshold=0), repeats=2)
    # 4. tail3 + il2
    leg("staged tail3 il2", t3.replace(mega_interleave=2), repeats=2)


if __name__ == "__main__":
    main()
