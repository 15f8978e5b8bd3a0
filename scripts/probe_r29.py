"""Probe r29 (on-chip): root-expansion A/B on the staged cascade
headline + stage0-cap re-sweep (fewer iterations per traversal shifts
the retirement curve left, so the optimal stage0 cap may drop).

One process: expand ON (cap sweep riding the same executables — caps
are traced), then expand OFF for the A/B delta.
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
    import tpurt.render.renderer as rr
    from bench import build_scene, time_render_flat
    from tpurt.config import RenderConfig

    print(f"devices: {jax.devices()}", flush=True)
    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       pixels_per_lane=8, mega_interleave=4)
    scene, cam = build_scene("bunny", cfg)
    scene = jax.device_put(scene)

    def leg(tag, repeats=3):
        t0 = time.perf_counter()
        dt, segs, iters = time_render_flat(scene, cam, cfg, repeats=repeats)
        mrays = segs / dt / 1e6
        print(json.dumps({
            "tag": tag, "mrays": round(mrays, 2), "sec": round(dt, 3),
            "segs": segs, "wall": round(time.perf_counter() - t0, 1),
        }), flush=True)
        return mrays

    # --- expand ON (new default) + cap sweep --------------------------
    tc.MEGA_ROOT_EXPAND = True
    leg("expand-on cap288")
    for cap in (240, 216, 192, 320):
        rr._CASCADE_STAGE0 = cap
        leg(f"expand-on cap{cap}", repeats=2)
    rr._CASCADE_STAGE0 = 288

    # --- expand OFF A/B ------------------------------------------------
    tc.MEGA_ROOT_EXPAND = False
    jax.clear_caches()
    leg("expand-off cap288")


if __name__ == "__main__":
    main()
