"""Round-3 engine A/B: interleaved sub-batches x batch size x quota.

Times the bunny-1080p headline frame (flat path, compaction off for
comparability) under the candidate round-3 schedules. Motivated by
probe_r3b: the gather rate climbs with batch size (169/240/300 Mrows/s
at 262k/524k/1M) and two independent gather->body chains overlap
(~4x per-row vs one chain).

Usage: python scripts/probe_r3e.py [--spp N] [--staged]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--staged", action="store_true",
                    help="also run the staged-compaction schedule for "
                         "each config (more compile shapes)")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene, log, time_render_flat
    from tpurt.config import RenderConfig

    base = dict(width=1920, height=1080, rays_per_pixel=args.spp,
                max_bounces=4, tile_size=256, seed_mode="reference")
    scene, cam = build_scene("bunny", RenderConfig(**base))
    print(f"devices {jax.devices()}", flush=True)

    configs = [
        ("k1-B262k-P8", dict(rays_per_batch=262144, pixels_per_lane=8,
                             mega_interleave=1)),
        ("k2-B262k-P8", dict(rays_per_batch=262144, pixels_per_lane=8,
                             mega_interleave=2)),
        ("k2-B524k-P4", dict(rays_per_batch=524288, pixels_per_lane=4,
                             mega_interleave=2)),
        ("k4-B1M-P2", dict(rays_per_batch=1048576, pixels_per_lane=2,
                           mega_interleave=4)),
    ]
    for name, kw in configs:
        if args.only and args.only not in name:
            continue
        for staged in ([False, True] if args.staged else [False]):
            cfg = RenderConfig(
                **base, **kw,
                compaction_threshold=32768 if staged else 0,
            )
            tag = f"{name}{'-staged' if staged else ''}"
            try:
                t0 = time.time()
                dt, segs, iters = time_render_flat(scene, cam, cfg, repeats=2)
                mrays = segs / dt / 1e6
                extra = ""
                if iters:
                    lanes = min(cfg.rays_per_batch, 2073600)
                    extra = (f" | {iters} iters "
                             f"{dt/iters*1e6:.0f} us/iter "
                             f"{iters*lanes/segs:.2f} iters/seg")
                print(f"{tag:<24s} {dt:.3f}s  {mrays:6.1f} Mrays/s{extra}  "
                      f"(total {time.time()-t0:.0f}s incl compile)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:<24s} ERROR {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
