"""Pallas TPU kernels.

The counterpart of the reference's OpenCL device kernel (src/Trace.cl)
for the parts of the pipeline that map onto dense VPU work: the
brute-force Moller-Trumbore sweep (all rays x all triangles) used for
small scenes, where dense streaming beats BVH traversal outright
(BASELINE.md config 2).

The kernel tiles rays over the grid; the packed triangle rows (T, 18)
live in VMEM (they are small by definition on this path) and stream
through the MT math chunk by chunk with a running per-ray closest-hit
reduction. All arithmetic follows intersect._mt_single's op order in
f32; acceptance can differ from the XLA path only on 1-ulp knife edges.

Wired into the render path as ``RenderConfig.dense_engine="pallas"``
(intersect._pallas_sweep_ids routes both brute-force entry points here
on TPU backends); the "exact" XLA path is the parity anchor, this is a
speed path. Reference counterpart: the dense leaf case of
src/Trace.cl:276-317.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from tpurt.config import EPSILON

_RAY_BLOCK = 256
_TRI_CHUNK = 256


def _mt_sweep_kernel(ro_ref, rd_ref, tri_ref, cull_ref, t_ref, idx_ref, *,
                     tri_count: int):
    """One ray block vs every triangle; closest accepted hit wins.

    ro/rd: (BR, 3) f32; tri: (T_pad, 18) f32; cull: (T_pad, 1) f32
    (nonzero = cull backfaces); outputs (BR, 1).
    """
    ro = ro_ref[:]  # (BR, 3)
    rd = rd_ref[:]

    br = ro.shape[0]
    best_t = jnp.full((br, 1), jnp.inf, jnp.float32)
    best_i = jnp.full((br, 1), -1, jnp.int32)

    num_chunks = tri_count // _TRI_CHUNK + (1 if tri_count % _TRI_CHUNK else 0)

    def chunk_body(c, carry):
        best_t, best_i = carry
        base = pl.multiple_of(c * _TRI_CHUNK, _TRI_CHUNK)
        tri = tri_ref[pl.ds(base, _TRI_CHUNK)]  # (BT, 18)
        cull = cull_ref[pl.ds(base, _TRI_CHUNK)][:, 0] != 0.0  # (BT,)

        # broadcast (BR, 1, 3) x (1, BT, 3); Mosaic dislikes newaxis
        # mixed with slices in one indexing op, so slice then expand.
        col = lambda a, b: jnp.expand_dims(tri[:, a:b], 0)
        pa, pb, pc = col(0, 3), col(3, 6), col(6, 9)
        na, nb, nc = col(9, 12), col(12, 15), col(15, 18)
        o = jnp.expand_dims(ro, 1)
        d = jnp.expand_dims(rd, 1)

        def cross(a, b):
            ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
            bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
            return jnp.stack(
                [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], -1
            )

        def dot(a, b):
            return jnp.sum(a * b, axis=-1)

        e1 = pb - pa
        e2 = pc - pa
        h = cross(d, e2)
        det = dot(e1, h)
        ok = jnp.abs(det) >= EPSILON
        f = 1.0 / det
        s = o - pa
        u = f * dot(s, h)
        ok &= (u >= 0.0) & (u <= 1.0)
        q = cross(s, e1)
        v = f * dot(d, q)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        t = f * dot(e2, q)
        ok &= t > EPSILON
        n = na * (1.0 - u - v)[..., None] + nb * u[..., None] + nc * v[..., None]
        n = n * jax.lax.rsqrt(dot(n, n))[..., None]
        backface = dot(d, n) > EPSILON
        ok &= ~(cull[None, :] & backface)

        # mask padded rows
        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (br, _TRI_CHUNK), 1)
        ok &= tri_ids < tri_count

        t = jnp.where(ok, t, jnp.inf)
        # first minimum wins, matching strict-< index-order semantics.
        # (argmin lowers poorly in Mosaic; two min-reductions instead.)
        cmin = jnp.min(t, axis=1, keepdims=True)
        carg = jnp.min(
            jnp.where(t <= cmin, tri_ids, jnp.int32(2**30)), axis=1, keepdims=True
        )
        closer = cmin < best_t
        return jnp.where(closer, cmin, best_t), jnp.where(closer, carg, best_i)

    best_t, best_i = jax.lax.fori_loop(0, num_chunks, chunk_body, (best_t, best_i))
    t_ref[:] = best_t
    idx_ref[:] = jnp.where(best_t < jnp.inf, best_i, -1)


@functools.partial(
    jax.jit, static_argnames=("tri_count", "interpret")
)
def mt_sweep_pallas(
    ro: jnp.ndarray,  # (R, 3) f32
    rd: jnp.ndarray,  # (R, 3) f32
    tri_rows: jnp.ndarray,  # (T_pad, 18) f32 (padded to _TRI_CHUNK)
    cull_flags: jnp.ndarray,  # (T_pad, 1) f32
    tri_count: int,
    interpret: bool = False,
):
    """Dense closest-hit sweep; returns (best_t (R,), best_idx (R,) with
    -1 for miss, indices relative to tri_rows)."""
    r = ro.shape[0]
    r_pad = -(-r // _RAY_BLOCK) * _RAY_BLOCK
    if r_pad != r:
        ro = jnp.concatenate([ro, jnp.ones((r_pad - r, 3), jnp.float32)], 0)
        rd = jnp.concatenate([rd, jnp.ones((r_pad - r, 3), jnp.float32)], 0)

    kernel = functools.partial(_mt_sweep_kernel, tri_count=tri_count)
    grid = (r_pad // _RAY_BLOCK,)
    vmem = {} if not _HAS_PLTPU else {"memory_space": pltpu.VMEM}
    in_specs = [
        pl.BlockSpec((_RAY_BLOCK, 3), lambda i: (i, 0), **vmem),
        pl.BlockSpec((_RAY_BLOCK, 3), lambda i: (i, 0), **vmem),
        pl.BlockSpec(tri_rows.shape, lambda i: (0, 0), **vmem),
        pl.BlockSpec(cull_flags.shape, lambda i: (0, 0), **vmem),
    ]
    out_specs = [
        pl.BlockSpec((_RAY_BLOCK, 1), lambda i: (i, 0), **vmem),
        pl.BlockSpec((_RAY_BLOCK, 1), lambda i: (i, 0), **vmem),
    ]
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ro, rd, tri_rows, cull_flags)
    return t[:r, 0], idx[:r, 0]


def pad_tri_rows(tri_rows: np.ndarray, cull: np.ndarray):
    """Pad triangle rows and cull flags to the kernel chunk size."""
    t = tri_rows.shape[0]
    t_pad = max(-(-t // _TRI_CHUNK) * _TRI_CHUNK, _TRI_CHUNK)
    rows = np.zeros((t_pad, 18), np.float32)
    rows[:t] = tri_rows
    flags = np.zeros((t_pad, 1), np.float32)
    flags[:t, 0] = cull.astype(np.float32)
    return rows, flags
