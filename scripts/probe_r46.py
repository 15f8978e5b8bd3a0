"""Probe r46 (TPU): does the row gather OVERLAP the Pallas body at all?

r45 priced the headline iteration at 2031 us marginal with the gather
alone at 1014 — suspiciously exactly additive with the body+glue legs,
i.e. the "inline sub-batch overlap" the engine was designed around may
not be happening at il4/tail3/expansion. This probe measures, all as
dual-cap marginals on the REAL engine (config.MEGA_FAKE_GATHER swaps
the gather for a broadcast with identical shapes):

  base        il4 inline, real gather        (anchor, ~2031)
  fake        il4 inline, broadcast rows     (body+glue only)
  carry       il4 carry schedule, real       (software pipeline retest)
  carryfake   il4 carry, broadcast           (carry's own glue cost)
  il1 / il1f  interleave 1 real/fake         (pallas call overhead x4 -> x1)

If base ~= fake + gather(1014): fully serial -> the lever is making the
gather DMA genuinely async (engineered overlap), worth ~1.5-2x.
If base < fake + 1014: partial overlap already; measure the headroom.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LANES = 262144


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from bench import build_scene
    import tpurt.config as tcfg
    from tpurt.config import RenderConfig

    base_kw = dict(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, seed_mode="reference", pixels_per_lane=8,
        mega_interleave=4, mega_tail_passes=3, compaction_threshold=0,
    )
    scene, cam = build_scene("bunny", RenderConfig(**base_kw))

    def marginal(label, cfg_leg, lo, hi, fake=False):
        jax.clear_caches()
        from tpurt.render.renderer import _mega_flat_start, _mega_statics

        tcfg.MEGA_FAKE_GATHER = fake
        try:
            statics = _mega_statics(cfg_leg, cfg_leg.width, cfg_leg.height)
            p = cfg_leg.pixels_per_lane

            def once(cap):
                coords = jnp.asarray([0, 0, 0, cap], jnp.int32)
                state, active = _mega_flat_start(
                    scene, cam, coords, batch=LANES, pixels_per_lane=p,
                    **statics)
                it = state.iters
                return int(active), int(np.asarray(it))

            try:
                for cap in (lo, hi):
                    once(cap)
                    once(cap)
            except Exception as e:
                print(f"[{label}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:250]}", flush=True)
                return None
            ts = {}
            for cap in (lo, hi, lo, hi, lo, hi):
                t0 = time.perf_counter()
                act, iters = once(cap)
                dt = time.perf_counter() - t0
                ts.setdefault(cap, []).append((dt, iters))
            tl, il = min(ts[lo])
            th, ih = min(ts[hi])
            if ih - il < 8:
                print(f"[{label}] INVALID: iters {il}->{ih}", flush=True)
                return None
            us = (th - tl) / (ih - il) * 1e6
            print(f"[{label}] marginal {us:.0f} us/iter "
                  f"({tl*1e3:.0f}ms@{il} -> {th*1e3:.0f}ms@{ih})", flush=True)
            return us
        finally:
            tcfg.MEGA_FAKE_GATHER = False

    res = {}
    res["base"] = marginal("base", RenderConfig(**base_kw), 24, 64)
    res["fake"] = marginal("fake il4", RenderConfig(**base_kw), 24, 64,
                           fake=True)
    kw_carry = {**base_kw, "mega_schedule": "carry"}
    res["carry"] = marginal("carry il4", RenderConfig(**kw_carry), 24, 64)
    res["carryfake"] = marginal("carry il4 fake", RenderConfig(**kw_carry),
                                24, 64, fake=True)
    kw_il1 = {**base_kw, "mega_interleave": 1}
    res["il1"] = marginal("il1", RenderConfig(**kw_il1), 24, 64)
    res["il1fake"] = marginal("il1 fake", RenderConfig(**kw_il1), 24, 64,
                              fake=True)

    print("--- marginal us/iter summary ---")
    for k, v in res.items():
        print(f"  {k}: {v if v is None else round(v)}")
    if res.get("base") and res.get("fake"):
        print(f"  implied gather-in-engine: {res['base'] - res['fake']:.0f} "
              f"(vs 1014 standalone; equal => serial)")


if __name__ == "__main__":
    main()
