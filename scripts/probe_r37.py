"""Probe r37 (TPU, quiet box): isolate the r36 losses.

r36 conflated two variables: shade pruning both OOMs the default
16 MB scoped VMEM and (at vmem=24) regressed 86.4 -> 72.5 Mrays/s.
This ladder isolates each change against the unpruned base (default
vmem unless noted), and prints full compile errors:

  1. base            (expect ~86, warm compile cache)
  2. base + vmem24   — is vmem24 ITSELF the regression?
  3. expand_passes=1 (unpruned)
  4. bf16 bounds     (unpruned)
  5. expand1 + bf16  (unpruned)
  6. pruned @ vmem32 — full error text if it fails
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

    def run(label, scene, cam):
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
            print(f"[{label}] FAILED: {type(e).__name__}:\n"
                  f"{str(e)[:2500]}\n--- end error ---", flush=True)
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

    C.MEGA_BF16_BOUNDS = False
    scene_u8, cam = build_scene("bunny", cfg)
    C.MEGA_BF16_BOUNDS = True
    scene_bf, _ = build_scene("bunny", cfg)
    C.MEGA_BF16_BOUNDS = False

    results = {}
    results["base"] = run("base", scene_u8, cam)

    C.MEGA_VMEM_LIMIT_MB = 24
    results["base+vmem24"] = run("base vmem=24", scene_u8, cam)
    C.MEGA_VMEM_LIMIT_MB = 0

    C.MEGA_EXPAND_PASSES = 1
    results["expand1"] = run("expand_passes=1", scene_u8, cam)
    C.MEGA_EXPAND_PASSES = 99

    results["bf16"] = run("bf16 bounds", scene_bf, cam)

    C.MEGA_EXPAND_PASSES = 1
    results["expand1+bf16"] = run("expand1 + bf16", scene_bf, cam)
    C.MEGA_EXPAND_PASSES = 99

    C.MEGA_MAT_PRUNE = True
    C.MEGA_VMEM_LIMIT_MB = 32
    results["pruned+vmem32"] = run("pruned vmem=32", scene_u8, cam)
    C.MEGA_MAT_PRUNE = False
    C.MEGA_VMEM_LIMIT_MB = 0

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
