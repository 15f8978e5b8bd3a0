"""Probe r40 (TPU, quiet box): clean re-legs of the tail-pass and
interleave ladders around the 89.1 base — r31/r32 ran under CPU
contention (their absolute numbers were ~10-20% low and tail4/unroll4
may have been mis-ranked by noise).

Legs: tail2, tail4, il2 (all else = headline base).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    from tpurt.config import RenderConfig

    base_kw = dict(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    scene, cam = build_scene("bunny", RenderConfig(**base_kw))

    def run(label, cfg):
        jax.clear_caches()
        from tpurt.render.renderer import (
            _flat_batch_size, _tonemap_dev, render_batch_flat,
        )

        total = cfg.width * cfg.height
        b = _flat_batch_size(cfg) * cfg.pixels_per_lane
        n_batches = -(-total // b)
        try:
            for _ in range(2):
                for i in range(n_batches):
                    m, s, it = render_batch_flat(scene, cam, cfg, i * b)
                    _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
        except Exception as e:
            print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            segs, iters = 0.0, 0
            for i in range(n_batches):
                m, s, it = render_batch_flat(scene, cam, cfg, i * b)
                segs += float(s)
                iters += int(it)
                np.asarray(_tonemap_dev(m))
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, segs, iters)
        dt, segs, iters = best
        print(f"[{label}] {dt:.3f}s {segs/1e6:.2f}M segs "
              f"=> {segs/dt/1e6:.2f} Mrays/s | {iters} iters, "
              f"{dt/iters*1e6:.0f} us/iter", flush=True)
        return segs / dt / 1e6

    results = {}
    results["tail2"] = run(
        "tail2", RenderConfig(**{**base_kw, "mega_tail_passes": 2}))
    results["tail4"] = run(
        "tail4", RenderConfig(**{**base_kw, "mega_tail_passes": 4}))
    results["il2"] = run(
        "il2", RenderConfig(**{**base_kw, "mega_interleave": 2}))

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
