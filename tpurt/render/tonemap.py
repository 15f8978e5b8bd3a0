"""Radiance -> display pixels.

Matches the tail of the raytrace kernel (src/Trace.cl:643-652): average
over samples, clamp to [0,1], gamma 1/2.2, quantise by C-style
truncation to uint8. The kernel writes alpha 0 and the host forces 255
(image.hpp:271); the framework's RGBA output uses 255 directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap(radiance: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) mean radiance -> (..., 3) uint8."""
    c = jnp.clip(radiance, 0.0, 1.0)
    c = jnp.power(c, jnp.float32(1.0 / 2.2))
    return (c * 255.0).astype(jnp.uint8)  # truncation, like (uchar)(x*255.0f)


def to_rgba(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    alpha = jnp.full(rgb_u8.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb_u8, alpha], axis=-1)
