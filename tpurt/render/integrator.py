"""Monte-Carlo path integrator: the bounce loop.

Vectorised transcription of Trace (src/Trace.cl:487-594) over ray
lanes. Control flow becomes masks; every lane consumes exactly the RNG
draws the reference's scalar branches would (masked draws advance the
state only where the branch fires), so per-pixel streams match the
reference bit-for-bit:

  branch            draws                                 ref
  Checker           RandomValue + RandomDirection (7)     Trace.cl:509-533
  Glassy            rand01 (1)                            Trace.cl:534-558
  Solid             RandomValue + RandomDirection (7)     Trace.cl:559-572
  OneSided / other  none (direction passes through)       Trace.cl:507-508
  Invisible         none; does NOT count as a bounce      Trace.cl:502-506
  Russian roulette  rand01 when bounceCount > 3           Trace.cl:583-590

The Invisible pass-through makes the reference's while loop unbounded;
here the lax.while_loop carries a global iteration counter capped at
max_bounces + invisible_budget so a masked loop always terminates (see
RenderConfig.invisible_budget).

Quirks consciously kept for parity: Glassy's normal-signed origin
offset is dead code (overwritten by the common origin update,
Trace.cl:553-554 vs 579-580); the Solid branch's local emittedLight is
discarded (Trace.cl:570-571); emission accumulates AFTER the Glassy
throughput weighting but BEFORE the color multiply (Trace.cl:574-582).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from tpurt.config import EPSILON, IOR_AIR
from tpurt.core import rng as rnglib
from tpurt.core.vecmath import fresnel_reflectance, lerp3, normalize3, reflect, refract
from tpurt.render.intersect import intersect_scene
from tpurt.scene.types import MaterialType, Scene


class _PathState(NamedTuple):
    origin: jnp.ndarray  # (R, 3)
    direction: jnp.ndarray  # (R, 3)
    throughput: jnp.ndarray  # (R, 3)
    light: jnp.ndarray  # (R, 3)
    rng: jnp.ndarray  # (R,) u32
    bounces: jnp.ndarray  # (R,) i32
    segments: jnp.ndarray  # (R,) i32 — scene intersections performed
    active: jnp.ndarray  # (R,) bool
    iteration: jnp.ndarray  # () i32 — global trip counter


def trace_paths(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    rng_state: jnp.ndarray,
    max_bounces: int,
    invisible_budget: int = 32,
    bruteforce_threshold: int = 4096,
    first_hit=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace one path per lane; returns (radiance (R,3), rng_state,
    path_length (R,) i32 — scene-intersection count per path, the ray
    count the Mrays/s metric is defined over).

    ``first_hit`` optionally supplies a precomputed Hit for bounce 0.
    The reference reuses ONE camera ray for every sample of a pixel
    (Trace.cl:636-641) and the bounce-0 intersection consumes no RNG, so
    the caller can intersect primaries once per pixel and share the
    result across the whole spp loop — bit-identical, ~spp x fewer
    primary traversals.
    """
    r = origin.shape[0]
    state = _PathState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((r, 3), jnp.float32),
        light=jnp.zeros((r, 3), jnp.float32),
        rng=rng_state,
        bounces=jnp.zeros((r,), jnp.int32),
        segments=jnp.zeros((r,), jnp.int32),
        active=jnp.ones((r,), bool) & (max_bounces > 0),
        iteration=jnp.int32(0),
    )
    hard_cap = jnp.int32(max_bounces + invisible_budget)

    def cond(s: _PathState):
        return jnp.any(s.active) & (s.iteration < hard_cap)

    def body_with_hit(s: _PathState, hit) -> _PathState:
        midx = jnp.maximum(hit.mesh_idx, 0)
        mtype = scene.mat_type[midx]
        color = scene.mat_color[midx]
        em_color = scene.mat_emission_color[midx]
        em_strength = scene.mat_emission_strength[midx]
        refl = scene.mat_reflectiveness[midx]
        spec_prob = scene.mat_specular_prob[midx]
        ior = scene.mat_ior[midx]

        a_hit = s.active & hit.valid
        invisible = a_hit & (mtype == int(MaterialType.INVISIBLE))
        scatter = a_hit & ~invisible

        # --- Checker cell selection (Trace.cl:509-524) ---
        is_checker = scatter & (mtype == int(MaterialType.CHECKER))
        checker_size = jnp.where(em_strength != 0.0, em_strength, 1.0)
        xi = jnp.floor(hit.point[:, 0] / checker_size).astype(jnp.int32)
        zi = jnp.floor(hit.point[:, 2] / checker_size).astype(jnp.int32)
        is_even = ((xi + zi) & 1) == 0
        checker_color = jnp.where(is_even[:, None], color, em_color)
        color = jnp.where(is_checker[:, None], checker_color, color)
        em_strength = jnp.where(is_checker, 0.0, em_strength)

        # --- Diffuse/specular scatter: Checker + Solid (Trace.cl:525-533,559-567) ---
        mask_cs = is_checker | (scatter & (mtype == int(MaterialType.SOLID)))
        new_rng, rv = rnglib.random_value_masked(s.rng, mask_cs)
        new_rng, rdir = rnglib.random_direction_masked(new_rng, mask_cs)
        is_specular = spec_prob >= rv
        diffuse_dir = normalize3(hit.normal + rdir)
        specular_dir = reflect(s.direction, hit.normal)
        dir_cs = normalize3(
            lerp3(diffuse_dir, specular_dir, refl * is_specular.astype(jnp.float32))
        )

        # --- Glassy (Trace.cl:534-558) ---
        is_glassy = scatter & (mtype == int(MaterialType.GLASSY))
        ior_cur = jnp.where(hit.backface, ior, IOR_AIR)
        ior_next = jnp.where(hit.backface, IOR_AIR, ior)
        reflect_dir = reflect(s.direction, hit.normal)
        refract_dir = refract(s.direction, hit.normal, ior_cur, ior_next)
        reflect_w = fresnel_reflectance(s.direction, hit.normal, ior_cur, ior_next)
        new_rng, r01 = rnglib.rand01_masked(new_rng, is_glassy)
        will_reflect = r01 < reflect_w
        dir_glassy = jnp.where(will_reflect[:, None], reflect_dir, refract_dir)
        glassy_w = jnp.where(will_reflect, reflect_w, 1.0 - reflect_w)

        new_dir = jnp.where(
            is_glassy[:, None],
            dir_glassy,
            jnp.where(mask_cs[:, None], dir_cs, s.direction),
        )
        throughput = s.throughput * jnp.where(is_glassy, glassy_w, 1.0)[:, None]

        # --- Common tail (Trace.cl:574-591) ---
        emission = em_color * em_strength[:, None]
        light = s.light + jnp.where(scatter[:, None], throughput * emission, 0.0)
        origin = jnp.where(
            scatter[:, None], hit.point + new_dir * EPSILON, s.origin
        )
        origin = jnp.where(
            invisible[:, None], hit.point + s.direction * EPSILON, origin
        )
        throughput = throughput * jnp.where(scatter[:, None], color, 1.0)

        # Russian roulette after bounce 3 (Trace.cl:583-590).
        p = jnp.max(throughput, axis=-1)
        rr = scatter & (s.bounces > 3)
        q = jnp.maximum(0.05, 1.0 - p)
        new_rng, r01_rr = rnglib.rand01_masked(new_rng, rr)
        killed = rr & (r01_rr < q)
        throughput = jnp.where(
            (rr & ~killed)[:, None], throughput / (1.0 - q)[:, None], throughput
        )

        bounces = s.bounces + scatter.astype(jnp.int32)
        active = a_hit & ~killed & (bounces < max_bounces)
        # Invisible lanes stay active without spending a bounce; miss
        # lanes (active & ~hit.valid) break (Trace.cl:497-501).

        return _PathState(
            origin=origin,
            direction=jnp.where(scatter[:, None], new_dir, s.direction),
            throughput=throughput,
            light=light,
            rng=new_rng,
            bounces=bounces,
            segments=s.segments + s.active.astype(jnp.int32),
            active=active,
            iteration=s.iteration + 1,
        )

    def body(s: _PathState) -> _PathState:
        hit = intersect_scene(scene, s.origin, s.direction, bruteforce_threshold)
        return body_with_hit(s, hit)

    if first_hit is not None:
        state = body_with_hit(state, first_hit)  # peeled bounce 0
    final = lax.while_loop(cond, body, state)
    return final.light, final.rng, final.segments
