"""Probe r30 (on-chip): post-root-expansion knob re-sweep.

Root expansion changed the iteration economics (fewer, relatively
gather-lighter iterations; replay-shade iterations now ~24% of live),
so re-test the knobs that previously lost:
  1. tail_passes=2 (kills the replay-shade iteration; previously -8%
     iters for +30% body — the replay share has doubled since).
  2. MEGA_UNROLL=4 (cheaper iterations raise the cond-sync share).
  3. plain-path iteration stats (iters, us/iter) for the notes ledger.
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

    # 0. staged baseline (expansion on, default knobs) — fresh-process
    #    anchor for the legs below.
    leg("staged base", base)
    # 1. tail_passes=2
    leg("staged tail2", base.replace(mega_tail_passes=2), repeats=2)
    # 2. unroll=4 (default knobs otherwise)
    tc.MEGA_UNROLL = 4
    jax.clear_caches()
    leg("staged unroll4", base, repeats=2)
    tc.MEGA_UNROLL = 2
    jax.clear_caches()
    # 3. plain path stats (compaction off -> reports iters)
    leg("plain stats", base.replace(compaction_threshold=0), repeats=2)


if __name__ == "__main__":
    main()
