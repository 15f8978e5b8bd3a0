"""Shared material shading step.

The single transcription of the Trace() material branches + common tail
(src/Trace.cl:502-591) used by BOTH integrators (the modular bounce
loop and the persistent-lane megakernel), so their RNG consumption and
arithmetic agree bit-for-bit by construction.

Materials are fetched with a select chain over the (small, static) mesh
count instead of gathers: on this TPU backend a gather op inside a loop
costs ~0.2-0.35ms across lanes regardless of width, while K broadcast
selects are ordinary fused VPU ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpurt.config import EPSILON, IOR_AIR
from tpurt.core import rng as rnglib
from tpurt.core.vecmath import fresnel_reflectance, lerp3, normalize3, reflect, refract
from tpurt.scene.types import MaterialType, Scene


class ShadeResult(NamedTuple):
    origin: jnp.ndarray  # (R, 3)
    direction: jnp.ndarray
    throughput: jnp.ndarray
    light: jnp.ndarray
    rng: jnp.ndarray  # (R,) u32
    bounces: jnp.ndarray  # (R,) i32
    continuing: jnp.ndarray  # (R,) bool — path goes on (per Trace.cl exit rules)
    invisible: jnp.ndarray  # (R,) bool — pass-through hit (no bounce spent)


def select_material(scene: Scene, mesh_idx: jnp.ndarray):
    """Gather-free material fetch: chain of broadcast selects over the
    static mesh count. Returns per-lane material fields."""
    k = scene.num_meshes
    r = mesh_idx.shape[0]
    mtype = jnp.zeros((r,), jnp.int32)
    ior = jnp.zeros((r,), jnp.float32)
    color = jnp.zeros((r, 3), jnp.float32)
    em_color = jnp.zeros((r, 3), jnp.float32)
    em_strength = jnp.zeros((r,), jnp.float32)
    refl = jnp.zeros((r,), jnp.float32)
    spec = jnp.zeros((r,), jnp.float32)
    for i in range(k):
        m = mesh_idx == i
        m3 = m[:, None]
        mtype = jnp.where(m, scene.mat_type[i], mtype)
        ior = jnp.where(m, scene.mat_ior[i], ior)
        color = jnp.where(m3, scene.mat_color[i], color)
        em_color = jnp.where(m3, scene.mat_emission_color[i], em_color)
        em_strength = jnp.where(m, scene.mat_emission_strength[i], em_strength)
        refl = jnp.where(m, scene.mat_reflectiveness[i], refl)
        spec = jnp.where(m, scene.mat_specular_prob[i], spec)
    return mtype, ior, color, em_color, em_strength, refl, spec


def shade_hit(
    scene: Scene,
    enabled: jnp.ndarray,  # (R,) bool — lanes taking a shade step now
    hit_valid: jnp.ndarray,
    hit_point: jnp.ndarray,
    hit_normal: jnp.ndarray,
    hit_backface: jnp.ndarray,
    hit_mesh: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    throughput: jnp.ndarray,
    light: jnp.ndarray,
    rng: jnp.ndarray,
    bounces: jnp.ndarray,
    max_bounces: int,
) -> ShadeResult:
    """One material interaction for lanes where ``enabled``; all other
    lanes pass through untouched (including their RNG stream)."""
    mtype, ior, color, em_color, em_strength, refl, spec_prob = select_material(
        scene, jnp.maximum(hit_mesh, 0)
    )

    a_hit = enabled & hit_valid
    invisible = a_hit & (mtype == int(MaterialType.INVISIBLE))
    scatter = a_hit & ~invisible

    # --- Checker cell selection (Trace.cl:509-524) ---
    is_checker = scatter & (mtype == int(MaterialType.CHECKER))
    checker_size = jnp.where(em_strength != 0.0, em_strength, 1.0)
    xi = jnp.floor(hit_point[:, 0] / checker_size).astype(jnp.int32)
    zi = jnp.floor(hit_point[:, 2] / checker_size).astype(jnp.int32)
    is_even = ((xi + zi) & 1) == 0
    checker_color = jnp.where(is_even[:, None], color, em_color)
    color = jnp.where(is_checker[:, None], checker_color, color)
    em_strength = jnp.where(is_checker, 0.0, em_strength)

    # --- Diffuse/specular scatter: Checker + Solid (Trace.cl:525-533,559-567) ---
    mask_cs = is_checker | (scatter & (mtype == int(MaterialType.SOLID)))
    new_rng, rv = rnglib.random_value_masked(rng, mask_cs)
    new_rng, rdir = rnglib.random_direction_masked(new_rng, mask_cs)
    is_specular = spec_prob >= rv
    diffuse_dir = normalize3(hit_normal + rdir)
    specular_dir = reflect(direction, hit_normal)
    dir_cs = normalize3(
        lerp3(diffuse_dir, specular_dir, refl * is_specular.astype(jnp.float32))
    )

    # --- Glassy (Trace.cl:534-558) ---
    is_glassy = scatter & (mtype == int(MaterialType.GLASSY))
    ior_cur = jnp.where(hit_backface, ior, IOR_AIR)
    ior_next = jnp.where(hit_backface, IOR_AIR, ior)
    reflect_dir = reflect(direction, hit_normal)
    refract_dir = refract(direction, hit_normal, ior_cur, ior_next)
    reflect_w = fresnel_reflectance(direction, hit_normal, ior_cur, ior_next)
    new_rng, r01 = rnglib.rand01_masked(new_rng, is_glassy)
    will_reflect = r01 < reflect_w
    dir_glassy = jnp.where(will_reflect[:, None], reflect_dir, refract_dir)
    glassy_w = jnp.where(will_reflect, reflect_w, 1.0 - reflect_w)

    new_dir = jnp.where(
        is_glassy[:, None],
        dir_glassy,
        jnp.where(mask_cs[:, None], dir_cs, direction),
    )
    throughput_new = throughput * jnp.where(is_glassy, glassy_w, 1.0)[:, None]

    # --- Common tail (Trace.cl:574-591) ---
    emission = em_color * em_strength[:, None]
    light_new = light + jnp.where(scatter[:, None], throughput_new * emission, 0.0)
    origin_new = jnp.where(
        scatter[:, None], hit_point + new_dir * EPSILON, origin
    )
    origin_new = jnp.where(
        invisible[:, None], hit_point + direction * EPSILON, origin_new
    )
    throughput_new = throughput_new * jnp.where(scatter[:, None], color, 1.0)

    # Russian roulette after bounce 3 (Trace.cl:583-590).
    p = jnp.max(throughput_new, axis=-1)
    rr = scatter & (bounces > 3)
    q = jnp.maximum(0.05, 1.0 - p)
    new_rng, r01_rr = rnglib.rand01_masked(new_rng, rr)
    killed = rr & (r01_rr < q)
    throughput_new = jnp.where(
        (rr & ~killed)[:, None], throughput_new / (1.0 - q)[:, None], throughput_new
    )

    bounces_new = bounces + scatter.astype(jnp.int32)
    continuing = a_hit & ~killed & (bounces_new < max_bounces)
    # Invisible lanes stay continuing without spending a bounce; miss
    # lanes (enabled & ~hit_valid) break (Trace.cl:497-501).

    e3 = enabled[:, None]
    return ShadeResult(
        origin=jnp.where(e3, origin_new, origin),
        direction=jnp.where(scatter[:, None], new_dir, direction),
        throughput=jnp.where(e3, throughput_new, throughput),
        light=jnp.where(e3, light_new, light),
        rng=new_rng,  # masked draws already froze non-participating lanes
        bounces=jnp.where(enabled, bounces_new, bounces),
        continuing=continuing,
        invisible=invisible,
    )
