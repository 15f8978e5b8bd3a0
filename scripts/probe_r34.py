"""Probe r34 (TPU): op-cost attribution of the fused Pallas body.

The headline engine is now compute-bound (probe r31/bench: 72 iters x
6226 us/iter at 262144 lanes = 23.7 ns/lane-iter, ~0.51 lane-iters per
segment — occupancy is near-perfect, so the remaining lever is the
BODY'S OP COUNT). This probe measures each tail component's share by
DUPLICATING it behind a runtime-dead select (trajectories bitwise
unchanged; inputs perturbed by a runtime-dead epsilon so XLA/Mosaic
cannot CSE the duplicate): the us/iter delta of "component x2" is that
component's cost in the base body.

Components duplicated: the inline static stage, enter-time root
expansion, the shade step, and the 8-slot leaf MT. The node branch is
the residual. Each variant recompiles the Mosaic body (~minutes over
the tunnel); run in background.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _dead_mask(x):
    """A (R,) bool that is always False at runtime but opaque to the
    compiler (data-dependent on ray state)."""
    return x > np.float32(1e30)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    from tpurt.config import RenderConfig
    import tpurt.render.megakernel as mk
    from tpurt.core import v3 as v3lib
    from tpurt.core.v3 import V3

    cfg = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    scene, cam = build_scene("bunny", cfg)

    orig_static = mk._static_stage
    orig_expand = mk._expand_root
    orig_shade = mk.shade_hit_soa
    orig_mt_inline = mk._mt_inline

    def dup_static(srows, s_cull, s_onesided, s_owner, mats, num_meshes,
                   enabled, origin, direction):
        r1 = orig_static(srows, s_cull, s_onesided, s_owner, mats,
                         num_meshes, enabled, origin, direction)
        dead = _dead_mask(origin.x)
        eps = jnp.where(dead, np.float32(1e-6), np.float32(0.0))
        o2 = V3(origin.x + eps, origin.y, origin.z)
        r2 = orig_static(srows, s_cull, s_onesided, s_owner, mats,
                         num_meshes, enabled, o2, direction)
        out = []
        for a, b in zip(r1, r2):
            if isinstance(a, V3):
                out.append(v3lib.where(dead, b, a))
            elif a.dtype == bool:
                out.append(mk._bsel(dead, b, a))
            else:
                out.append(jnp.where(dead, b, a))
        return tuple(out)

    def dup_expand(params, e, mask, lo, ld, lid, lt, w_dst,
                   cur, cur_leaf, stack, s_depth):
        c1, l1, st1 = orig_expand(params, e, mask, lo, ld, lid, lt, w_dst,
                                  cur, cur_leaf, stack, s_depth)
        dead = _dead_mask(lo.x)
        eps = jnp.where(dead, np.float32(1e-6), np.float32(0.0))
        lo2 = V3(lo.x + eps, lo.y, lo.z)
        c2, l2, st2 = orig_expand(params, e, mask, lo2, ld, lid, lt, w_dst,
                                  cur, cur_leaf, stack, s_depth)
        return (
            jnp.where(dead, c2, c1),
            mk._bsel(dead, l2, l1),
            tuple(jnp.where(dead, b, a) for a, b in zip(st1, st2)),
        )

    def dup_shade(mats, num_meshes, enabled, hit_valid, hit_point,
                  hit_normal, hit_backface, hit_mesh, origin, direction,
                  throughput, light, rng, bounces, max_bounces):
        r1 = orig_shade(mats, num_meshes, enabled, hit_valid, hit_point,
                        hit_normal, hit_backface, hit_mesh, origin,
                        direction, throughput, light, rng, bounces,
                        max_bounces)
        dead = _dead_mask(origin.x)
        eps = jnp.where(dead, np.float32(1e-6), np.float32(0.0))
        o2 = V3(origin.x + eps, origin.y, origin.z)
        r2 = orig_shade(mats, num_meshes, enabled, hit_valid, hit_point,
                        hit_normal, hit_backface, hit_mesh, o2, direction,
                        throughput, light, rng, bounces, max_bounces)
        out = []
        for a, b in zip(r1, r2):
            if isinstance(a, V3):
                out.append(v3lib.where(dead, b, a))
            elif a.dtype == bool:
                out.append(mk._bsel(dead, b, a))
            else:
                out.append(jnp.where(dead, b, a))
        return type(r1)(*out)

    def dup_mt_inline(lo, ld, col, base, cull):
        ok1, t1, n1, bf1, aux1 = orig_mt_inline(lo, ld, col, base, cull)
        dead = _dead_mask(lo.x)
        eps = jnp.where(dead, np.float32(1e-6), np.float32(0.0))
        lo2 = V3(lo.x + eps, lo.y, lo.z)
        ok2, t2, n2, bf2, aux2 = orig_mt_inline(lo2, ld, col, base, cull)
        return (
            mk._bsel(dead, ok2, ok1),
            jnp.where(dead, t2, t1),
            v3lib.where(dead, n2, n1),
            mk._bsel(dead, bf2, bf1),
            jnp.where(dead, aux2, aux1),
        )

    def run(label):
        # Monkeypatched internals change the traced program but not the
        # jit static args — drop every cached trace so the patch takes.
        jax.clear_caches()
        from tpurt.render.renderer import (
            _flat_batch_size, _tonemap_dev, render_batch_flat,
        )

        total = cfg.width * cfg.height
        b = _flat_batch_size(cfg) * cfg.pixels_per_lane
        n_batches = -(-total // b)
        for _ in range(2):
            for i in range(n_batches):
                m, s, it = render_batch_flat(scene, cam, cfg, i * b)
                _ = float(s) + int(np.asarray(_tonemap_dev(m)).sum())
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
        return dt / iters * 1e6

    base = run("base")
    legs = []
    for name, patch in [
        ("dup_static", ("_static_stage", dup_static)),
        ("dup_expand", ("_expand_root", dup_expand)),
        ("dup_shade", ("shade_hit_soa", dup_shade)),
        ("dup_leaf", ("_mt_inline", dup_mt_inline)),
    ]:
        attr, fn = patch
        orig_map = {"_static_stage": orig_static,
                    "_expand_root": orig_expand,
                    "shade_hit_soa": orig_shade,
                    "_mt_inline": orig_mt_inline}
        setattr(mk, attr, fn)
        try:
            us = run(name)
        finally:
            setattr(mk, attr, orig_map[attr])
        legs.append((name, us))
        print(f"  -> {name}: +{us - base:.0f} us/iter "
              f"({100*(us-base)/base:.1f}% of base)", flush=True)

    print("--- summary ---")
    print(f"base us/iter: {base:.0f}")
    for name, us in legs:
        print(f"{name}: component cost ~{us - base:.0f} us/iter "
              f"= {100*(us-base)/base:.1f}%")


if __name__ == "__main__":
    main()
