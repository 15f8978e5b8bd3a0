"""Probe r38 (TPU, quiet box): Mosaic scheduling-level sweep.

r37 showed op-level changes don't beat the base (89.1 Mrays/s): bf16
bounds -3%, vmem raise -7% by itself, expansion-trim catastrophic.
The remaining levers are scheduling-level:

  1. MEGA_BLOCK_LANES 2048 / 8192 (default 4096)
  2. MEGA_UNROLL 1 / 3 (default 2)
  3. interleave 8 with the sub-batch floor dropped to 32768
  4. pruned shade at BLOCK 2048 + DEFAULT vmem (smaller blocks may fit
     the pruned body under the 16 MB scoped ceiling where 4096 OOMs)
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

    base_kw = dict(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    cfg = RenderConfig(**base_kw)
    scene, cam = build_scene("bunny", cfg)

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
            print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:400]}",
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
    for bl in (2048, 8192):
        C.MEGA_BLOCK_LANES = bl
        results[f"block{bl}"] = run(f"block={bl}", cfg)
    C.MEGA_BLOCK_LANES = 4096

    for un in (1, 3):
        C.MEGA_UNROLL = un
        results[f"unroll{un}"] = run(f"unroll={un}", cfg)
    C.MEGA_UNROLL = 2

    C.MEGA_INTERLEAVE_FLOOR = 32768
    results["il8"] = run(
        "interleave=8 floor=32768",
        RenderConfig(**{**base_kw, "mega_interleave": 8}),
    )
    C.MEGA_INTERLEAVE_FLOOR = 65536

    C.MEGA_MAT_PRUNE = True
    C.MEGA_BLOCK_LANES = 2048
    results["pruned+block2048"] = run("pruned block=2048 vmem=def", cfg)
    C.MEGA_MAT_PRUNE = False
    C.MEGA_BLOCK_LANES = 4096

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
