"""Mesh picking: which mesh is under a screen coordinate.

Counterpart of the checkIntersectingRay kernel (src/Trace.cl:655-699),
which the reference's (bit-rotted) viewer dispatched 1x1 on mouse
clicks to tint the picked mesh (main.cpp:385-469). Semantics preserved:
backface culling ONLY for OneSided meshes (Trace.cl:684 — note this
differs from the render path's cull policy), no other backface
rejection, closest world-space hit wins, -1 when nothing is under the
cursor. Vectorised: pass many uv coords at once.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpurt.config import EPSILON
from tpurt.core.camera import Camera, make_ray
from tpurt.core.vecmath import euler_rotation, length3, normalize3, rotate, rotate_t
from tpurt.render.intersect import _bruteforce_range, _bvh_traverse, _finalize_local
from tpurt.scene.types import MaterialType, Scene


def pick_mesh(
    scene: Scene,
    camera: Camera,
    uv,
    bruteforce_threshold: int = 4096,
) -> jnp.ndarray:
    """uv: (..., 2) in [0,1]^2 -> (...,) int32 mesh index or -1."""
    uv = jnp.asarray(uv, jnp.float32)
    ro, rd = make_ray(camera, uv)
    flat_ro = ro.reshape(-1, 3)
    flat_rd = rd.reshape(-1, 3)
    r = flat_ro.shape[0]

    best_dst = jnp.full((r,), jnp.inf, jnp.float32)
    best_mesh = jnp.full((r,), -1, jnp.int32)

    for i, (first, count) in enumerate(scene.mesh_tri_ranges):
        scale = scene.mesh_scale[i]
        rot = euler_rotation(
            scene.mesh_pitch[i], scene.mesh_yaw[i], scene.mesh_roll[i]
        )
        safe = jnp.where(jnp.abs(scale) > EPSILON, scale, jnp.float32(1.0))
        lo = rotate_t(rot, flat_ro - scene.mesh_pos[i]) / safe
        ld = normalize3(rotate_t(rot, flat_rd) / safe)
        # Picking culls backfaces ONLY for OneSided (Trace.cl:684).
        cull = scene.mat_type[i] == int(MaterialType.ONE_SIDED)

        if count <= bruteforce_threshold:
            lb = _bruteforce_range(scene, lo, ld, first, count, cull)
        else:
            lb = _bvh_traverse(
                scene, scene.mesh_root[i], lo, ld, cull, scene.max_leaf_tris,
                qmin=scene.mesh_qmin[i], qscale=scene.mesh_qscale[i],
            )
        valid, point_l, _, _ = _finalize_local(scene, lo, ld, lb, cull)
        valid &= scale > EPSILON
        point_w = rotate(rot, point_l * scale) + scene.mesh_pos[i]
        dst = length3(point_w - flat_ro)
        closer = valid & (dst < best_dst)
        best_dst = jnp.where(closer, dst, best_dst)
        best_mesh = jnp.where(closer, jnp.int32(i), best_mesh)

    return best_mesh.reshape(uv.shape[:-1])
