"""Monte-Carlo path integrator: the modular bounce loop.

Vectorised transcription of Trace (src/Trace.cl:487-594) over ray
lanes: a lax.while_loop whose body intersects the full scene and then
applies the shared material shading step (render/shading.py — the one
transcription of the reference's branch semantics, also used by the
megakernel engine). Control flow becomes masks; every lane consumes
exactly the RNG draws the reference's scalar branches would, so
per-pixel streams match the reference bit-for-bit.

The Invisible pass-through makes the reference's while loop unbounded
(Trace.cl:502-506); here the loop carries a global iteration counter
capped at max_bounces + invisible_budget so a masked loop always
terminates (see RenderConfig.invisible_budget).

This engine exists for clarity and as the cross-check for the
megakernel: its per-phase loops are easy to read and test, at the cost
of synchronising every bounce and every sample across all lanes. The
megakernel (render/megakernel.py) flattens those loops for speed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from tpurt.render.intersect import intersect_scene
from tpurt.render.shading import shade_hit
from tpurt.scene.types import Scene


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
    dense_engine: str = "exact",
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
        res = shade_hit(
            scene, s.active,
            hit.valid, hit.point, hit.normal, hit.backface, hit.mesh_idx,
            s.origin, s.direction, s.throughput, s.light, s.rng, s.bounces,
            max_bounces,
        )
        return _PathState(
            origin=res.origin,
            direction=res.direction,
            throughput=res.throughput,
            light=res.light,
            rng=res.rng,
            bounces=res.bounces,
            segments=s.segments + s.active.astype(jnp.int32),
            active=s.active & res.continuing,
            iteration=s.iteration + 1,
        )

    def body(s: _PathState) -> _PathState:
        hit = intersect_scene(
            scene, s.origin, s.direction, bruteforce_threshold, dense_engine
        )
        return body_with_hit(s, hit)

    if first_hit is not None:
        state = body_with_hit(state, first_hit)  # peeled bounce 0
    final = lax.while_loop(cond, body, state)
    return final.light, final.rng, final.segments
