"""Probe r35 (TPU): VMEM ceiling / block size / expand-pass sweep.

probe_r34 found the tail3+expansion Mosaic body sits AT the default
16 MB scoped-VMEM ceiling (adding ~1 MB of intermediates OOMs the
compile) — i.e. the register allocator is squeezed, which would explain
the body running ~5x above its ALU floor. Sweep:

  * MEGA_VMEM_LIMIT_MB: 0 (default) / 24 / 32 / 48
  * MEGA_BLOCK_LANES:   2048 / 4096 / 8192 at the best limit
  * MEGA_EXPAND_PASSES: 1 vs 99 (expansion only in tail pass 1)

Headline config (plain schedule, P=8, il4, tail3). Scene-specialised
shade pruning is active in ALL legs (it landed before this probe).
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
    import tpurt.config as C
    from tpurt.config import RenderConfig

    cfg = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    scene, cam = build_scene("bunny", cfg)

    def run(label):
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
            print(f"[{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return None
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            segs = 0.0
            iters = 0
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
    results["base"] = run("base vmem=def block=4096 expand=all")
    for mb in (24, 32, 48):
        C.MEGA_VMEM_LIMIT_MB = mb
        results[f"vmem{mb}"] = run(f"vmem={mb}MB")
    best_mb = max((24, 32, 48),
                  key=lambda m: results.get(f"vmem{m}") or 0.0)
    if (results.get(f"vmem{best_mb}") or 0.0) <= (results["base"] or 0.0):
        best_mb = 0
    C.MEGA_VMEM_LIMIT_MB = best_mb
    print(f"--- best vmem: {best_mb} ---", flush=True)

    for bl in (2048, 8192):
        C.MEGA_BLOCK_LANES = bl
        results[f"block{bl}"] = run(f"block={bl} vmem={best_mb}")
    C.MEGA_BLOCK_LANES = 4096

    C.MEGA_EXPAND_PASSES = 1
    results["expand1"] = run(f"expand_passes=1 vmem={best_mb}")
    C.MEGA_EXPAND_PASSES = 99

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
