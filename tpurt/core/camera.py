"""Camera model and primary-ray generation.

Transcribes MakeRay (src/Trace.cl:596-621) and the CameraInformation
struct (src/Trace.cl:21-26): UV in [0,1]^2 -> NDC, aspect-scaled x,
pinhole with scale = tan(fov/2), then an Euler rotation whose rows are
laid out as the TRANSPOSE of makeRotation (the reference writes the
matrix inline with swapped layout, Trace.cl:608-611) — i.e. the camera
applies R^T where meshes apply R.

The raytrace entry kernel flips v: uv = (x/width, 1 - y/height)
(Trace.cl:634-635) and derives pixelIndex = y*width + x (Trace.cl:631).
``make_camera_rays`` reproduces both so a pixel's ray and seed are pure
functions of its absolute image coordinates — which is what makes any
tile/device decomposition bitwise-identical to a single-chip render
(deliberately fixing the reference's per-device seed drift,
src/image.hpp:228,304).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from tpurt.core import rng
from tpurt.core.vecmath import euler_rotation, normalize3, rotate_t


class Camera(NamedTuple):
    """Pytree mirror of CameraInformation (Trace.cl:21-26).

    All parameters pack into ONE (8,) array on purpose: separate 0-d
    scalar leaves with equal values (pitch == roll == 0 in the default
    pose) can resolve to the same cached device constant, and the XLA
    client dedupes same-object executable parameters — making the
    compiled program's buffer count depend on runtime VALUES and
    corrupting jit cache hits across camera instances.
    """

    params: jnp.ndarray  # (8,) f32: pos.xyz, pitch, yaw, roll, fov, aspect

    @property
    def position(self) -> jnp.ndarray:
        return self.params[0:3]

    @property
    def pitch(self) -> jnp.ndarray:
        return self.params[3]

    @property
    def yaw(self) -> jnp.ndarray:
        return self.params[4]

    @property
    def roll(self) -> jnp.ndarray:
        return self.params[5]

    @property
    def fov_degrees(self) -> jnp.ndarray:
        return self.params[6]

    @property
    def aspect_ratio(self) -> jnp.ndarray:
        return self.params[7]

    @classmethod
    def create(cls, position, pitch=0.0, yaw=0.0, roll=0.0, fov_degrees=90.0,
               aspect_ratio=1.0) -> "Camera":
        position = np.asarray(position, np.float32)
        return cls(
            params=jnp.asarray(
                np.array(
                    [position[0], position[1], position[2],
                     pitch, yaw, roll, fov_degrees, aspect_ratio],
                    np.float32,
                )
            )
        )


def make_ray(camera: Camera, uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MakeRay (Trace.cl:596-621) for a batch of uv coords (..., 2).

    Returns (origins, directions), each (..., 3).
    """
    ndc = uv * 2.0 - 1.0
    ndc_x = ndc[..., 0] * camera.aspect_ratio
    ndc_y = ndc[..., 1]
    scale = jnp.tan(jnp.deg2rad(camera.fov_degrees * 0.5))
    dir_cam = normalize3(
        jnp.stack([ndc_x * scale, ndc_y * scale, jnp.ones_like(ndc_x)], axis=-1)
    )
    # Camera rotation = makeRotation(pitch, yaw, roll) transposed
    # (Trace.cl:608-616 writes R^T rows inline).
    rot = euler_rotation(camera.pitch, camera.yaw, camera.roll)
    dir_world = normalize3(rotate_t(rot, dir_cam))
    origin = jnp.broadcast_to(camera.position, dir_world.shape)
    return origin, dir_world


def pixel_uv(x: jnp.ndarray, y: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Per-pixel uv with the kernel's y flip (Trace.cl:634-635).

    x, y are integer pixel coordinates (any matching shapes).
    """
    u = x.astype(jnp.float32) / jnp.float32(width)
    v = 1.0 - y.astype(jnp.float32) / jnp.float32(height)
    return jnp.stack([u, v], axis=-1)


def make_camera_rays(
    camera: Camera,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    width: int,
    height: int,
    frame_index=0,
    ray_idx=0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Primary rays + RNG seeds for pixels at absolute coords (xs, ys).

    Returns (origins, directions, seeds); seeds follow
    MakeSeed(pixelIndex, frameIndex, rayIdx) with pixelIndex = y*W + x
    (Trace.cl:631-632).
    """
    uv = pixel_uv(xs, ys, width, height)
    origins, directions = make_ray(camera, uv)
    pixel_index = ys.astype(jnp.uint32) * jnp.uint32(width) + xs.astype(jnp.uint32)
    seeds = rng.make_seed(pixel_index, frame_index, ray_idx)
    return origins, directions, seeds
