"""Multi-chip frame rendering via shard_map.

The TPU-native replacement for the reference's host-threaded dynamic
tile work queue (src/image.hpp:280-350): instead of one std::thread per
device popping (tileX, tileY) under a mutex and reading frames back
over PCIe, the frame is decomposed statically over the device mesh and
every chip runs the same jitted program on its shard — no host in the
loop, no mutexes, results assembled by XLA's collectives over ICI.

Decomposition:
  * ``tile`` axis: contiguous row blocks of the image. Each device owns
    rows [k*rows_per_dev, (k+1)*rows_per_dev). Because seeds are pure
    functions of absolute pixel coordinates (core/camera.py), a sharded
    render is BITWISE identical to the single-chip render — the
    property the reference's per-device seeding broke
    (image.hpp:228,304).
  * ``sample`` axis (optional, needs seed_mode="decorrelated"): device
    column j renders samples [j*local_spp, (j+1)*local_spp) and the
    radiance means are combined with a psum. Equal to the single-chip
    estimator up to f32 summation reassociation.

The scene/camera pytrees are replicated (the triangle buffers are MBs,
mirroring the reference's per-device scene replication,
main.cpp:709-717); only the output image is sharded.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.4.35 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from tpurt.config import RenderConfig
from tpurt.core.camera import Camera
from tpurt.parallel.mesh import SAMPLE_AXIS, TILE_AXIS, make_mesh
from tpurt.render.renderer import _render_tile_impl
from tpurt.scene.types import Scene


def _padded_rows(height: int, n_tile: int) -> int:
    return -(-height // n_tile) * n_tile


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "n_tile", "n_sample", "rows_per_dev"),
)
def _render_sharded_impl(
    scene: Scene,
    camera: Camera,
    frame_index,
    *,
    cfg: RenderConfig,
    mesh: Mesh,
    n_tile: int,
    n_sample: int,
    rows_per_dev: int,
):
    local_spp = cfg.rays_per_pixel // n_sample

    def worker(scene, camera, frame_index):
        ti = lax.axis_index(TILE_AXIS)
        si = lax.axis_index(SAMPLE_AXIS)
        y0 = (ti * rows_per_dev).astype(jnp.int32)
        sample0 = si * jnp.int32(local_spp)
        coords = jnp.stack(
            [jnp.int32(0), y0, jnp.asarray(frame_index, jnp.int32), sample0]
        )
        block, _ = _render_tile_impl(
            scene, camera, coords,
            tile_h=rows_per_dev, tile_w=cfg.width,
            width=cfg.width, height=cfg.height,
            rays_per_pixel=local_spp, max_bounces=cfg.max_bounces,
            seed_mode=cfg.seed_mode, invisible_budget=cfg.invisible_budget,
            bruteforce_threshold=cfg.bruteforce_threshold,
            subpixel_jitter=cfg.subpixel_jitter,
            engine=cfg.engine,
            dense_engine=cfg.dense_engine,
            body_backend=cfg.mega_body,
        )
        if n_sample > 1:
            # Mean of per-shard means over equal shares == global mean.
            block = lax.psum(block, SAMPLE_AXIS) / jnp.float32(n_sample)
        return block

    # Replication checking is off: the megakernel's while_loop carry
    # starts from replicated constants that become device-varying inside
    # the loop, which the checker (check_rep on older jax, check_vma on
    # jax >= 0.8) would demand explicit pcasts for.
    import inspect

    params = inspect.signature(shard_map).parameters
    kwargs = {}
    if "check_vma" in params:
        kwargs["check_vma"] = False
    elif "check_rep" in params:
        kwargs["check_rep"] = False
    return shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(), P(), P()),  # scene, camera, frame replicated
        out_specs=P(TILE_AXIS, None, None),
        **kwargs,
    )(scene, camera, jnp.int32(frame_index))


def render_frame_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    frame_index: int = 0,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Full-frame mean radiance (H, W, 3) float32 over the device mesh."""
    mesh = mesh or make_mesh()
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if n_sample > 1 and cfg.seed_mode != "decorrelated":
        raise ValueError(
            "sample-axis sharding needs seed_mode='decorrelated': the "
            "reference seed mode is a single sequential RNG stream per "
            "pixel (Trace.cl:639-642) and cannot be split across chips"
        )
    if cfg.rays_per_pixel % n_sample != 0:
        raise ValueError(
            f"rays_per_pixel={cfg.rays_per_pixel} not divisible by "
            f"sample axis size {n_sample}"
        )
    rows_pad = _padded_rows(cfg.height, n_tile)
    out = _render_sharded_impl(
        scene, camera, frame_index,
        cfg=cfg, mesh=mesh, n_tile=n_tile, n_sample=n_sample,
        rows_per_dev=rows_pad // n_tile,
    )
    return np.asarray(out)[: cfg.height]
