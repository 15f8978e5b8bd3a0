"""Fused Plücker dense sweep: one Mosaic kernel per bounce segment.

The brute-force counterpart of the reference's UseBVH=false mode (the
per-mesh dense triangle loop, src/Trace.cl:276-317 + 444-482): every
chain entry's triangles are swept densely, with the (R rays x T tris)
Möller-Trumbore refactored into per-ray features x per-triangle
coefficients (see render/plucker.py for the algebra).

Why a dedicated kernel instead of the XLA GEMM path (PluckerTable):
XLA does not fuse consumers into a dot's output on TPU, so the
(R, 4T) decision planes round-trip HBM at 32 B/pair and cap the sweep
at ~25 Gpairs/s; worse, the modular integrator around it is AoS-bound
at ~0.57 us/segment (notes/tpu_measurements.md). Here the accept tests
and the running (t, winner) fold happen in VMEM right after the MXU
dot (measured 22.6 Gpairs/s end-to-end vs 7.4 for the chunked XLA
form at the same shapes, scripts/probe_r10.py), and the megakernel's
persistent lanes replace the modular glue entirely — each loop
iteration completes one path segment per live lane.

The contraction is zero-padded 16 -> 128: a K=16 dot inside a Mosaic
kernel scalarises (probe_r3c), K=128 is the MXU's native shape.

Precision: like the XLA Plücker engine this is the FAST dense form,
not the parity anchor — u/v/t come out within ~1 ulp of the sequential
math (different summation order), so acceptance knife-edges may
differ; the winner's shading data is recomputed exactly by the caller
(megakernel._dense_hit), mirroring intersect._finalize_local.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.config import EPSILON
from tpurt.scene.types import MaterialType, Scene

_F32 = jnp.float32
_INF = np.float32(np.inf)

#: Padded contraction width (features 16 -> 128, zero rows beyond 9).
K_PAD = 128
#: Ray rows per kernel block.
_RAY_BLOCK = 256
#: Triangle columns per kernel block.
_TRI_CHUNK = 1024


class FusedDenseTable(NamedTuple):
    """Per-triangle sweep data over the UNION of all chain entries'
    triangles, column-padded to a _TRI_CHUNK multiple (pad: id -1)."""

    coeffs: jnp.ndarray  # (4, K_PAD, Tpad) f32 — det/u/v/t rows
    ids: jnp.ndarray  # (1, Tpad) i32 soup triangle id (-1 = pad)
    owner: jnp.ndarray  # (1, Tpad) i32 owner mesh id
    entry: jnp.ndarray  # (1, Tpad) i32 owning chain-entry index
    cull: jnp.ndarray  # (1, Tpad) f32 0/1 backface-cull policy
    orient: jnp.ndarray  # (1, Tpad) f32 ±1 authored-normal orientation
    count: int


def build_dense_table(scene: Scene) -> FusedDenseTable:
    """Assemble the fused sweep table from the scene's triangle soup.

    Pure jnp on traced scene arrays with static slicing — safe to call
    inside a jit; the result is loop-invariant and XLA hoists it out of
    the megakernel while_loop. Per-triangle policy scalars come from the
    freeze-time static mirrors (mesh_mat_types), matching
    megakernel._chain_params row construction."""
    from tpurt.render.plucker import component_rows

    idx_np: list = []
    owner_np: list = []
    entry_np: list = []
    cull_np: list = []
    for e, members in enumerate(scene.mega_chain_members):
        for i in members:
            first, count = scene.mesh_tri_ranges[i]
            idx_np.extend(range(first, first + count))
            owner_np.extend([i] * count)
            entry_np.extend([e] * count)
            mt = scene.mesh_mat_types[i]
            cull_np.extend([
                mt not in (
                    int(MaterialType.GLASSY),
                    int(MaterialType.INVISIBLE),
                    int(MaterialType.ONE_SIDED),
                )
            ] * count)
    t = len(idx_np)
    assert t > 0, "dense megakernel needs at least one chain triangle"
    tc = min(_TRI_CHUNK, max(128, -(-t // 128) * 128))
    tpad = -(-t // tc) * tc

    idx = jnp.asarray(np.asarray(idx_np, np.int32))

    def soup(arr):
        g = arr[idx]
        if tpad > t:
            g = jnp.concatenate([g, jnp.zeros((tpad - t, 3), _F32)])
        return g

    pa = soup(scene.tri_pos_a)
    pb = soup(scene.tri_pos_b)
    pc = soup(scene.tri_pos_c)
    na = soup(scene.tri_nrm_a)
    nb = soup(scene.tri_nrm_b)
    nc = soup(scene.tri_nrm_c)

    e1 = pb - pa
    e2 = pc - pa
    ng = jnp.cross(e1, e2)
    osign = jnp.sum((na + nb + nc) * ng, axis=-1)
    orient = jnp.where(osign < 0.0, -1.0, 1.0).astype(_F32)

    det_c, u_c, v_c, t_c = component_rows(pa, e1, e2, ng)  # (10, Tpad) each
    coeffs = jnp.stack([
        jnp.pad(c, ((0, K_PAD - 10), (0, 0))) for c in (det_c, u_c, v_c, t_c)
    ])  # (4, K_PAD, Tpad)

    def pad_i(vals, fill):
        a = np.full(tpad, fill, np.int32)
        a[:t] = np.asarray(vals, np.int32)
        return jnp.asarray(a).reshape(1, tpad)

    cull_f = np.zeros(tpad, np.float32)
    cull_f[:t] = np.asarray(cull_np, np.float32)
    return FusedDenseTable(
        coeffs=coeffs,
        ids=pad_i(idx_np, -1),
        owner=pad_i(owner_np, 0),
        entry=pad_i(entry_np, -1),
        cull=jnp.asarray(cull_f).reshape(1, tpad),
        orient=orient.reshape(1, tpad),
        count=t,
    )


def _sweep_kernel(feats_ref, lane_entry_ref, coeffs_ref, ids_ref, entry_ref,
                  cull_ref, orient_ref, t_ref, col_ref, tacc, cacc):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        tacc[:] = jnp.full(tacc.shape, _INF, _F32)
        cacc[:] = jnp.full(cacc.shape, -1, jnp.int32)

    feats = feats_ref[:]  # (RB, K_PAD)
    planes = [
        jnp.dot(feats, coeffs_ref[k], preferred_element_type=_F32)
        for k in range(4)
    ]  # det, u_num, v_num, t_num — each (RB, TC)
    det, u_num, v_num, t_num = planes
    adet = jnp.abs(det)
    ok = adet >= EPSILON
    import tpurt.config as _c

    if getattr(_c, "DENSE_NUMERATOR_ACCEPT", False):
        # Numerator-form accepts (probe r73): fold the sign of det into
        # the numerators and compare against |det| directly — the u/v
        # DIVIDED values are never materialised (their two multiplies
        # become selects); t's division survives because the min-fold
        # below needs comparable distances. Knife-edge acceptance may
        # differ by the usual ~1-ulp class (fast-dense contract).
        neg = det < 0.0
        un = jnp.where(neg, -u_num, u_num)
        vn = jnp.where(neg, -v_num, v_num)
        tn = jnp.where(neg, -t_num, t_num)
        ok &= (un >= 0.0) & (un <= adet)
        ok &= (vn >= 0.0) & (un + vn <= adet)
        ok &= tn > EPSILON * adet
        t = tn / adet
    else:
        f = 1.0 / det
        u = f * u_num
        v = f * v_num
        t = f * t_num
        ok &= (u >= 0.0) & (u <= 1.0)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        ok &= t > EPSILON
    ok &= ids_ref[:] >= 0  # (1, TC) soup tri id; -1 marks column padding
    # Only the lane's CURRENT chain entry participates (the chain fold
    # processes entries sequentially, Trace.cl:444-482).
    ok &= entry_ref[:] == lane_entry_ref[:]  # (1,TC) == (RB,1) broadcast
    # Geometric backface cull (see plucker.plucker_sweep): ray hits the
    # back when orient*det < 0.
    backface = det * orient_ref[:] < 0.0
    ok &= ~((cull_ref[:] != 0.0) & backface)
    t = jnp.where(ok, t, _INF)
    t_min = jnp.min(t, axis=1, keepdims=True)  # (RB, 1)
    # winner column without a gather: the lowest column index among the
    # equal-minimum candidates (matches the reference's strict-< update
    # in index order, Trace.cl:352-357).
    ncols = t.shape[1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) \
        + j * jnp.int32(ncols)
    big = jnp.int32(2**30)
    col_min = jnp.min(
        jnp.where((t == t_min) & ok, jnp.broadcast_to(col_iota, t.shape), big),
        axis=1, keepdims=True,
    )
    closer = (t_min < tacc[:]) & (col_min < big)
    tacc[:] = jnp.where(closer, t_min, tacc[:])
    cacc[:] = jnp.where(closer, col_min, cacc[:])

    @pl.when(j == nt - 1)
    def _out():
        t_ref[:] = tacc[:]
        col_ref[:] = cacc[:]


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def sweep_entry_local(lo, ld, lane_entry, table: FusedDenseTable,
                      interpret: bool = None):
    """Closest accepted hit of each lane's local-frame ray against ITS
    chain entry's triangles. lo/ld are V3 (SoA); lane_entry (R,) i32.
    Returns (t (R,) f32 — +inf miss, col (R,) i32 table column — -1)."""
    if interpret is None:
        interpret = _interpret_default()
    r = lo.x.shape[0]
    rb = _RAY_BLOCK
    while r % rb != 0:
        rb //= 2
    tpad = table.ids.shape[1]
    tc = min(_TRI_CHUNK, tpad)

    # Per-lane feature rows [d, w = d x o, o, 1, 0...] (plucker.py).
    one = jnp.ones((r,), _F32)
    wx = ld.y * lo.z - ld.z * lo.y
    wy = ld.z * lo.x - ld.x * lo.z
    wz = ld.x * lo.y - ld.y * lo.x
    feats = jnp.stack(
        [ld.x, ld.y, ld.z, wx, wy, wz, lo.x, lo.y, lo.z, one], axis=1
    )
    feats = jnp.pad(feats, ((0, 0), (0, K_PAD - 10)))

    grid = (r // rb, tpad // tc)
    t_out, col_out = pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, K_PAD), lambda i, j: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((4, K_PAD, tc), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, tc), lambda i, j: (0, j)),
            pl.BlockSpec((1, tc), lambda i, j: (0, j)),
            pl.BlockSpec((1, tc), lambda i, j: (0, j)),
            pl.BlockSpec((1, tc), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), _F32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, 1), _F32),
            pltpu.VMEM((rb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        feats, lane_entry.astype(jnp.int32).reshape(r, 1), table.coeffs,
        table.ids, table.entry, table.cull, table.orient,
    )
    return t_out[:, 0], col_out[:, 0]
