"""Persistent-lane megakernel integrator.

The TPU-native fast path. Measured physics of this backend: a device
loop iteration costs ~0.2ms fixed plus ~200M gathered rows/s, with
gather row width essentially free. The binding constraint is therefore
(LOOP ITERATIONS) x (GATHER OPS PER ITERATION) — not FLOPs, not bytes.

The modular engine nests four synchronised loops (samples > bounces >
meshes > BVH steps); every level syncs ALL lanes to the slowest lane,
multiplying iteration counts (~10^4 iterations per tile). This engine
flattens everything into ONE while_loop in which each lane owns its
entire task — pixel, sample loop, bounce loop, mesh chain, traversal
cursor — as a per-lane state machine:

  TRAVERSE:  one fat-row gather (Scene.mega_rows: quantised bounds,
             links, and the <=2 leaf triangles INLINE) + AABB/MT math.
             The only gather in the body.
  NEXT-MESH: on exhausting a chain entry, fold its local winner into
             the world-space best (LocalToWorldHit semantics,
             Trace.cl:139-156, incl. the per-mesh OneSided backface
             rejection, Trace.cl:466-471) and enter the next entry
             (WorldToLocalRay, Trace.cl:118-137).
  SHADE:     on exhausting the chain, apply the shared material step
             (render/shading.py — identical RNG stream to the modular
             engine and the scalar oracle), then either respawn the
             bounced ray at chain entry 0, start the next sample, or
             retire the lane.

Lanes never wait for each other at phase boundaries; total iterations
approach the per-lane mean work (~10^2-10^3) instead of the product of
per-phase maxima. Primary-hit caching carries over: the bounce-0
intersection of sample 0 is recorded and replayed for samples 1..spp-1
(the reference reuses one camera ray for all samples, Trace.cl:636-641).

Trade-offs kept deliberately: retired lanes idle until the whole batch
drains (active-lane compaction is future work), and closest-hit ties
between coincident triangles of DIFFERENT fused static meshes resolve
by traversal order rather than mesh order (measure-zero; the bitwise
golden tests gate it).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from tpurt.config import EPSILON
from tpurt.core import rng as rnglib
from tpurt.core.vecmath import cross3, dot3, euler_rotation, length3, normalize3
from tpurt.render.shading import shade_hit
from tpurt.scene.types import MaterialType, Scene

_F32 = jnp.float32
_INF = np.float32(np.inf)


class _Lane(NamedTuple):
    # sample machinery
    sample: jnp.ndarray  # (R,) i32
    acc: jnp.ndarray  # (R, 3)
    rng: jnp.ndarray  # (R,) u32
    done: jnp.ndarray  # (R,) bool
    segments: jnp.ndarray  # (R,) i32
    # path state
    origin: jnp.ndarray
    direction: jnp.ndarray
    throughput: jnp.ndarray
    light: jnp.ndarray
    bounces: jnp.ndarray  # (R,) i32
    invis: jnp.ndarray  # (R,) i32
    # chain + traversal
    entry: jnp.ndarray  # (R,) i32 in [0, E]; E == shading stage
    cur: jnp.ndarray  # (R,) i32 mega row; -1 = entry exhausted
    lo: jnp.ndarray  # (R, 3) local ray
    ld: jnp.ndarray
    lid: jnp.ndarray  # 1/ld
    lt: jnp.ndarray  # (R,) local best distance
    lnrm: jnp.ndarray  # (R, 3) local best normal (ray-flipped)
    lback: jnp.ndarray  # (R,) bool
    lmesh: jnp.ndarray  # (R,) i32 winner's mesh (-1 = none)
    # world-space best across the chain
    w_valid: jnp.ndarray
    w_dst: jnp.ndarray
    w_point: jnp.ndarray
    w_normal: jnp.ndarray
    w_back: jnp.ndarray
    w_mesh: jnp.ndarray
    # primary-hit cache (bounce-0 intersection, shared by all samples)
    c_set: jnp.ndarray  # (R,) bool
    c_valid: jnp.ndarray
    c_point: jnp.ndarray
    c_normal: jnp.ndarray
    c_back: jnp.ndarray
    c_mesh: jnp.ndarray
    c_dst: jnp.ndarray


class _ChainParams(NamedTuple):
    """Per-entry transform/material constants, stacked (E, ...)."""

    root: Tuple[int, ...]  # static row indices
    mesh: Tuple[int, ...]  # static mesh ids (-1 = fused static entry)
    pos: jnp.ndarray  # (E, 3)
    rot: jnp.ndarray  # (E, 3, 3) object rotation R (mesh applies R)
    scale: jnp.ndarray  # (E,)
    qmin: jnp.ndarray  # (E, 3)
    qscale: jnp.ndarray  # (E, 3)
    one_sided: jnp.ndarray  # (E,) bool
    cull: jnp.ndarray  # (E,) bool backface-cull policy (mesh entries)


def _chain_params(scene: Scene) -> _ChainParams:
    pos_l, rot_l, scale_l, os_l, cull_l = [], [], [], [], []
    for mesh_idx, root in scene.mega_chain:
        if mesh_idx < 0:  # fused static entry: identity transform
            pos_l.append(jnp.zeros((3,), _F32))
            rot_l.append(jnp.eye(3, dtype=_F32))
            scale_l.append(jnp.float32(1.0))
            os_l.append(jnp.asarray(False))
            cull_l.append(jnp.asarray(True))  # unused; per-tri cull applies
        else:
            i = mesh_idx
            pos_l.append(scene.mesh_pos[i])
            rot_l.append(
                euler_rotation(
                    scene.mesh_pitch[i], scene.mesh_yaw[i], scene.mesh_roll[i]
                )
            )
            scale_l.append(scene.mesh_scale[i])
            mt = scene.mat_type[i]
            os_l.append(mt == int(MaterialType.ONE_SIDED))
            cull_l.append(
                (mt != int(MaterialType.GLASSY))
                & (mt != int(MaterialType.INVISIBLE))
                & (mt != int(MaterialType.ONE_SIDED))
            )
    return _ChainParams(
        root=tuple(r for _, r in scene.mega_chain),
        mesh=tuple(m for m, _ in scene.mega_chain),
        pos=jnp.stack(pos_l),
        rot=jnp.stack(rot_l),
        scale=jnp.stack(scale_l),
        qmin=scene.mega_qmin,
        qscale=scene.mega_qscale,
        one_sided=jnp.stack(os_l),
        cull=jnp.stack(cull_l),
    )


def _select_e(table: jnp.ndarray, entry: jnp.ndarray, e_count: int) -> jnp.ndarray:
    """Gather-free per-lane select of (E, ...) rows by entry index."""
    entry_b = entry.reshape(entry.shape + (1,) * (table.ndim - 1))
    out = jnp.zeros(entry.shape + table.shape[1:], table.dtype)
    for i in range(e_count):
        out = jnp.where(entry_b == i, table[i], out)
    return out


def _select_scalar(values, entry: jnp.ndarray, e_count: int, dtype) -> jnp.ndarray:
    out = jnp.zeros(entry.shape, dtype)
    for i in range(e_count):
        out = jnp.where(entry == i, jnp.asarray(values[i], dtype), out)
    return out


def _enter(params: _ChainParams, e_count: int, entry, origin, direction):
    """WorldToLocalRay (Trace.cl:118-137) for each lane's chain entry."""
    entry_c = jnp.minimum(entry, e_count - 1)
    pos = _select_e(params.pos, entry_c, e_count)
    rot = _select_e(params.rot, entry_c, e_count)  # (R, 3, 3)
    scale = _select_e(params.scale, entry_c, e_count)
    safe = jnp.where(jnp.abs(scale) > EPSILON, scale, _F32(1.0))[:, None]
    lo = jnp.einsum("rji,rj->ri", rot, origin - pos) / safe
    ld = normalize3(jnp.einsum("rji,rj->ri", rot, direction) / safe)
    root = _select_scalar(params.root, entry_c, e_count, jnp.int32)
    return lo, ld, 1.0 / ld, root


def _mt_inline(lo, ld, row, base, cull_static_entry, is_static, params_cull_e):
    """Exact Moller-Trumbore against an inline triangle slot of a mega
    row; identical op order to intersect._mt_single."""
    pa = row[:, base : base + 3]
    pb = row[:, base + 3 : base + 6]
    pc = row[:, base + 6 : base + 9]
    na = row[:, base + 9 : base + 12]
    nb = row[:, base + 12 : base + 15]
    nc = row[:, base + 15 : base + 18]
    aux = lax.bitcast_convert_type(row[:, base + 18], jnp.int32)

    e1 = pb - pa
    e2 = pc - pa
    h = cross3(ld, e2)
    det = dot3(e1, h)
    ok = jnp.abs(det) >= EPSILON
    f = 1.0 / det
    s = lo - pa
    u = f * dot3(s, h)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = cross3(s, e1)
    v = f * dot3(ld, q)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * dot3(e2, q)
    ok &= t > EPSILON
    n = normalize3(na * (1.0 - u - v)[:, None] + nb * u[:, None] + nc * v[:, None])
    backface = dot3(ld, n) > EPSILON
    cull = jnp.where(is_static, cull_static_entry, params_cull_e)
    ok &= ~(cull & backface)
    n = jnp.where(backface[:, None], -n, n)
    return ok, t, n, backface, aux


def run_megakernel(
    scene: Scene,
    ro0: jnp.ndarray,  # (R, 3) primary origins
    rd0: jnp.ndarray,  # (R, 3) primary directions (may be updated per sample by jitter)
    pixel_index: jnp.ndarray,  # (R,) u32
    frame_index,  # scalar i32
    rays_per_pixel: int,
    max_bounces: int,
    seed_mode: str,
    invisible_budget: int,
    sample_offset=0,
    subpixel_jitter: bool = False,
    camera=None,
    width: int = 0,
    height: int = 0,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean radiance (R,3), total path segments (scalar f32))."""
    r = ro0.shape[0]
    if max_bounces <= 0:
        return jnp.zeros((r, 3), _F32), jnp.float32(0.0)

    params = _chain_params(scene)
    e_count = len(scene.mega_chain)
    use_cache = not subpixel_jitter

    def primary_ray(sample_id):
        if not subpixel_jitter:
            return ro0, rd0
        from tpurt.core.camera import make_ray, pixel_uv

        xs = pixel_index.astype(jnp.int32) % jnp.int32(width)
        ys = pixel_index.astype(jnp.int32) // jnp.int32(width)
        uv = pixel_uv(xs, ys, width, height)
        jseed = rnglib.make_seed(
            pixel_index ^ jnp.uint32(0xA511E9B3), frame_index, sample_id
        )
        jseed, jx = rnglib.random_value(jseed)
        jseed, jy = rnglib.random_value(jseed)
        uv = uv + jnp.stack([(jx - 0.5) / width, (jy - 0.5) / height], axis=-1)
        return make_ray(camera, uv)

    def seed_for(sample_id):
        if seed_mode == "reference":
            return rnglib.make_seed(pixel_index, frame_index, 0)
        return rnglib.make_seed(
            pixel_index, frame_index, sample_id + jnp.uint32(sample_offset)
        )

    zero3 = jnp.zeros((r, 3), _F32)
    zeros_i = jnp.zeros((r,), jnp.int32)
    falses = jnp.zeros((r,), bool)

    lo0, ld0, lid0, root0 = _enter(params, e_count, zeros_i, ro0, rd0)
    lane = _Lane(
        sample=zeros_i,
        acc=zero3,
        rng=seed_for(jnp.uint32(0)),
        done=falses,
        segments=zeros_i,
        origin=ro0,
        direction=rd0,
        throughput=jnp.ones((r, 3), _F32),
        light=zero3,
        bounces=zeros_i,
        invis=zeros_i,
        entry=zeros_i,
        cur=root0,
        lo=lo0,
        ld=ld0,
        lid=lid0,
        lt=jnp.full((r,), _INF, _F32),
        lnrm=zero3,
        lback=falses,
        lmesh=zeros_i - 1,
        w_valid=falses,
        w_dst=jnp.full((r,), _INF, _F32),
        w_point=zero3,
        w_normal=zero3,
        w_back=falses,
        w_mesh=zeros_i - 1,
        c_set=falses,
        c_valid=falses,
        c_point=zero3,
        c_normal=zero3,
        c_back=falses,
        c_mesh=zeros_i - 1,
        c_dst=jnp.full((r,), _INF, _F32),
    )

    def cond(s: _Lane):
        return jnp.any(~s.done)

    def body(s: _Lane) -> _Lane:
        # ---------------- TRAVERSE: the one gather -------------------
        trav = ~s.done & (s.entry < e_count) & (s.cur >= 0)
        idx = jnp.where(trav, s.cur, 0)
        row = scene.mega_rows[idx]  # (R, 43)

        u0 = lax.bitcast_convert_type(row[:, 0], jnp.uint32)
        u1 = lax.bitcast_convert_type(row[:, 1], jnp.uint32)
        u2 = lax.bitcast_convert_type(row[:, 2], jnp.uint32)
        m16 = jnp.uint32(0xFFFF)
        q_lo = jnp.stack([u0 & m16, u0 >> 16, u1 & m16], -1).astype(_F32)
        q_hi = jnp.stack([u1 >> 16, u2 & m16, u2 >> 16], -1).astype(_F32)
        entry_c = jnp.minimum(s.entry, e_count - 1)
        qmin = _select_e(params.qmin, entry_c, e_count)
        qscale = _select_e(params.qscale, entry_c, e_count)
        bmin = qmin + q_lo * qscale
        bmax = qmin + q_hi * qscale
        w6 = lax.bitcast_convert_type(row[:, 3], jnp.int32)
        w7 = lax.bitcast_convert_type(row[:, 4], jnp.uint32)
        miss = (w7 & jnp.uint32(0xFFFFFF)).astype(jnp.int32) - 1
        ntris = (w7 >> jnp.uint32(24)).astype(jnp.int32)

        # slab test (RayBoundingBox, Trace.cl:259-274), NaN-robust-
        # conservative like intersect._aabb (in-plane rays touch).
        t0 = (bmin - s.lo) * s.lid
        t1 = (bmax - s.lo) * s.lid
        tsm = jnp.minimum(t0, t1)
        tbg = jnp.maximum(t0, t1)
        tsm = jnp.where(jnp.isnan(tsm), -jnp.inf, tsm)
        tbg = jnp.where(jnp.isnan(tbg), jnp.inf, tbg)
        tmin = jnp.max(tsm, -1)
        tmax = jnp.min(tbg, -1)
        box_hit = tmax >= jnp.maximum(tmin, 0.0)

        scale_e = _select_e(params.scale, entry_c, e_count)
        safe_e = jnp.where(jnp.abs(scale_e) > EPSILON, scale_e, _F32(1.0))
        limit = jnp.minimum(s.lt, s.w_dst / safe_e * _F32(1.001))
        enter_node = trav & box_hit & (tmin < limit)
        is_leaf = ntris > 0

        lt, lnrm, lback, lmesh = s.lt, s.lnrm, s.lback, s.lmesh
        entry_mesh = _select_scalar(params.mesh, entry_c, e_count, jnp.int32)
        is_static = entry_mesh < 0
        cull_mesh_e = _select_e(params.cull, entry_c, e_count)
        for k in range(2):
            live = enter_node & is_leaf & (k < ntris)
            # per-candidate cull: static entry -> owner mesh's policy
            ok, t, n, backface, aux = _mt_inline(
                s.lo, s.ld, row, 5 + 19 * k,
                _static_cull(scene, lax.bitcast_convert_type(
                    row[:, 5 + 19 * k + 18], jnp.int32)),
                is_static, cull_mesh_e,
            )
            cand_mesh = jnp.where(is_static, aux, entry_mesh)
            win = live & ok & (t < lt)
            lt = jnp.where(win, t, lt)
            lnrm = jnp.where(win[:, None], n, lnrm)
            lback = jnp.where(win, backface, lback)
            lmesh = jnp.where(win, cand_mesh, lmesh)

        nxt = jnp.where(enter_node & ~is_leaf, w6, miss)
        cur = jnp.where(trav, nxt, s.cur)

        # ---------------- NEXT-MESH: fold + enter --------------------
        fin = ~s.done & (s.entry < e_count) & (cur < 0)
        lvalid = fin & (lmesh >= 0)
        one_sided_e = _select_e(params.one_sided, entry_c, e_count)
        lvalid &= ~(one_sided_e & lback)
        lvalid &= scale_e > EPSILON
        rot_e = _select_e(params.rot, entry_c, e_count)
        pos_e = _select_e(params.pos, entry_c, e_count)
        point_l = s.lo + s.ld * lt[:, None]
        point_w = jnp.einsum("rij,rj->ri", rot_e, point_l * scale_e[:, None]) + pos_e
        n_w = normalize3(jnp.einsum("rij,rj->ri", rot_e, lnrm))
        dst = length3(point_w - s.origin)
        closer = lvalid & (dst < s.w_dst)
        w_valid = jnp.where(fin, s.w_valid | closer, s.w_valid)
        w_dst = jnp.where(closer, dst, s.w_dst)
        w_point = jnp.where(closer[:, None], point_w, s.w_point)
        w_normal = jnp.where(closer[:, None], n_w, s.w_normal)
        w_back = jnp.where(closer, lback, s.w_back)
        w_mesh = jnp.where(closer, lmesh, s.w_mesh)

        entry = jnp.where(fin, s.entry + 1, s.entry)
        # set up the next entry's local frame for lanes still in chain
        lo2, ld2, lid2, root2 = _enter(params, e_count, entry, s.origin, s.direction)
        in_chain = fin & (entry < e_count)
        lo = jnp.where(in_chain[:, None], lo2, s.lo)
        ld = jnp.where(in_chain[:, None], ld2, s.ld)
        lid = jnp.where(in_chain[:, None], lid2, s.lid)
        cur = jnp.where(in_chain, root2, cur)
        lt = jnp.where(fin, _INF, lt)
        lnrm = jnp.where(fin[:, None], 0.0, lnrm)
        lback = jnp.where(fin, False, lback)
        lmesh = jnp.where(fin, -1, lmesh)

        # ---------------- SHADE ---------------------------------------
        shade = ~s.done & (entry >= e_count)
        segments = s.segments + shade.astype(jnp.int32)

        res = shade_hit(
            scene, shade,
            w_valid, w_point, w_normal, w_back, w_mesh,
            s.origin, s.direction, s.throughput, s.light, s.rng, s.bounces,
            max_bounces,
        )
        invis = s.invis + (shade & res.invisible).astype(jnp.int32)
        continuing = res.continuing & ~(res.invisible & (invis > invisible_budget))

        # primary cache store (sample 0, bounce 0)
        store = shade & use_cache & ~s.c_set & (s.bounces == 0) & (s.sample == 0)
        c_set = s.c_set | store
        c_valid = jnp.where(store, w_valid, s.c_valid)
        c_point = jnp.where(store[:, None], w_point, s.c_point)
        c_normal = jnp.where(store[:, None], w_normal, s.c_normal)
        c_back = jnp.where(store, w_back, s.c_back)
        c_mesh = jnp.where(store, w_mesh, s.c_mesh)
        c_dst = jnp.where(store, w_dst, s.c_dst)

        # path continues: re-enter chain with the bounced ray
        cont = shade & continuing
        # path ends: accumulate, next sample or retire
        path_end = shade & ~continuing
        acc = s.acc + jnp.where(path_end[:, None], res.light, 0.0)
        sample = s.sample + path_end.astype(jnp.int32)
        retire = path_end & (sample >= rays_per_pixel)
        done = s.done | retire
        new_sample = path_end & ~retire

        sample_u = sample.astype(jnp.uint32)
        ro_s, rd_s = primary_ray(sample_u)
        rng = res.rng
        if seed_mode != "reference":
            rng = jnp.where(new_sample, seed_for(sample_u), rng)

        origin = jnp.where(new_sample[:, None], ro_s, res.origin)
        direction = jnp.where(new_sample[:, None], rd_s, res.direction)
        throughput = jnp.where(new_sample[:, None], 1.0, res.throughput)
        light = jnp.where(new_sample[:, None], 0.0, res.light)
        bounces = jnp.where(new_sample, 0, res.bounces)
        invis = jnp.where(new_sample, 0, invis)

        # cached primary replay: new samples with a cache skip the chain
        replay = new_sample & c_set
        restart = cont | (new_sample & ~replay)
        entry = jnp.where(restart, 0, entry)
        lo3, ld3, lid3, root3 = _enter(params, e_count, jnp.zeros_like(entry),
                                       origin, direction)
        lo = jnp.where(restart[:, None], lo3, lo)
        ld = jnp.where(restart[:, None], ld3, ld)
        lid = jnp.where(restart[:, None], lid3, lid)
        cur = jnp.where(restart, root3, cur)

        w_valid = jnp.where(shade, False, w_valid)
        w_dst = jnp.where(shade, _INF, w_dst)
        w_mesh = jnp.where(shade, -1, w_mesh)
        # replayed lanes jump straight to the shade stage with the cache
        entry = jnp.where(replay, e_count, entry)
        w_valid = jnp.where(replay, c_valid, w_valid)
        w_dst = jnp.where(replay, c_dst, w_dst)
        w_point = jnp.where(replay[:, None], c_point, w_point)
        w_normal = jnp.where(replay[:, None], c_normal, w_normal)
        w_back = jnp.where(replay, c_back, w_back)
        w_mesh = jnp.where(replay, c_mesh, w_mesh)

        return _Lane(
            sample=sample, acc=acc, rng=rng, done=done, segments=segments,
            origin=origin, direction=direction, throughput=throughput,
            light=light, bounces=bounces, invis=invis,
            entry=entry, cur=cur, lo=lo, ld=ld, lid=lid,
            lt=lt, lnrm=lnrm, lback=lback, lmesh=lmesh,
            w_valid=w_valid, w_dst=w_dst, w_point=w_point, w_normal=w_normal,
            w_back=w_back, w_mesh=w_mesh,
            c_set=c_set, c_valid=c_valid, c_point=c_point, c_normal=c_normal,
            c_back=c_back, c_mesh=c_mesh, c_dst=c_dst,
        )

    def body_unrolled(s: _Lane) -> _Lane:
        # A device-loop iteration carries ~0.2ms fixed overhead on this
        # backend; running several state-machine steps per iteration
        # amortises it (the step is a no-op for lanes that retired
        # mid-unroll, so semantics are unchanged).
        for _ in range(unroll):
            s = body(s)
        return s

    final = lax.while_loop(cond, body_unrolled, lane)
    mean = final.acc / jnp.float32(rays_per_pixel)
    return mean, jnp.sum(final.segments.astype(jnp.float32))


def _static_cull(scene: Scene, owner: jnp.ndarray) -> jnp.ndarray:
    """Backface-cull policy for fused-static candidates, selected by the
    per-triangle owner mesh id (cull unless Glassy/Invisible/OneSided,
    Trace.cl:460-462; OneSided meshes never enter the fused entry)."""
    k = scene.num_meshes
    cull = jnp.ones(owner.shape, bool)
    for i in range(k):
        mt = scene.mat_type[i]
        c = (
            (mt != int(MaterialType.GLASSY))
            & (mt != int(MaterialType.INVISIBLE))
            & (mt != int(MaterialType.ONE_SIDED))
        )
        cull = jnp.where(owner == i, c, cull)
    return cull
