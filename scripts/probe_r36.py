"""Probe r36 (TPU, QUIET BOX REQUIRED): clean A/B of this session's
engine changes. probe_r35's timings were polluted by concurrent CPU
pytest jobs (vmem24 read 47 Mrays/s vs the 79 base — junk); this probe
re-runs the decisive legs serially:

  1. old-base:  pruning OFF, expansion every pass, u8 bounds, vmem def
     (reproduces the pre-session 79-83 Mrays/s program)
  2. pruned:    shade pruning ON, vmem def  — does it even compile?
     (r35: base FAILED the remote compile at the default 16 MB scoped
     ceiling; r34 showed the body sits AT that ceiling)
  3. pruned + vmem24 (and 32 if 24 compiles but regresses)
  4. pruned + expand_passes=1
  5. pruned + bf16 bounds
  6. best combo

Each leg recompiles (~2-5 min over the tunnel).
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
    import tpurt.render.shading as sh
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
            print(f"[{label}] COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
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

    orig_present = sh.mat_types_present

    C.MEGA_BF16_BOUNDS = False
    scene_u8, cam = build_scene("bunny", cfg)
    C.MEGA_BF16_BOUNDS = True
    scene_bf, _ = build_scene("bunny", cfg)
    C.MEGA_BF16_BOUNDS = False

    results = {}
    # 1. old base: pruning off
    sh.mat_types_present = lambda s: None
    results["old-base"] = run("old-base (no pruning, vmem def)",
                              scene_u8, cam)
    sh.mat_types_present = orig_present

    # 2. pruned, default vmem
    results["pruned"] = run("pruned (vmem def)", scene_u8, cam)

    # 3. pruned + vmem raise
    for mb in (24, 32):
        C.MEGA_VMEM_LIMIT_MB = mb
        results[f"pruned+vmem{mb}"] = run(f"pruned vmem={mb}", scene_u8, cam)
        C.MEGA_VMEM_LIMIT_MB = 0
        if results[f"pruned+vmem{mb}"]:
            break

    # 4. pruned + expansion only in pass 1
    C.MEGA_EXPAND_PASSES = 1
    results["pruned+expand1"] = run("pruned expand_passes=1", scene_u8, cam)
    C.MEGA_EXPAND_PASSES = 99

    # 5. pruned + bf16 bounds
    results["pruned+bf16"] = run("pruned bf16 bounds", scene_bf, cam)

    # 6. combo: whichever of 4/5 won, together (+ vmem if needed)
    C.MEGA_EXPAND_PASSES = 1
    results["combo-e1-bf16"] = run("pruned expand1 + bf16", scene_bf, cam)
    C.MEGA_EXPAND_PASSES = 99

    print("--- summary ---")
    for k, v in results.items():
        print(f"{k}: {v if v is None else round(v, 2)}")


if __name__ == "__main__":
    main()
