"""Dense megakernel (mega_dense=True): the fused Plücker sweep engine.

The TPU-native counterpart of the reference's UseBVH=false brute-force
mode (the per-mesh dense triangle loop, Trace.cl:276-317 + 444-482):
each megakernel iteration resolves every live lane's whole current
chain entry with one MXU sweep (render/plucker_fused.py).

Contract (same as dense_engine="plucker"): winner ACCEPTANCE is
Plücker-precision — u/v/t within ~1 ulp of the sequential math, so
knife-edge candidates may differ from the exact BVH engine — while the
winner's shading data is recomputed exactly. On real scenes the two
engines produce identical uint8 frames except (rarely) isolated
knife-edge pixels; the sweep itself is tested exactly against
per-triangle Möller-Trumbore below.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

import jax.numpy as jnp

from tpurt.config import RenderConfig
from tpurt.core import v3 as v3lib
from tpurt.render.renderer import render_frame
from tpurt.scene.presets import default_scene


def _cfg(**kw):
    base = dict(width=32, height=32, rays_per_pixel=2, max_bounces=3,
                tile_size=32, rays_per_batch=256,
                object_path="sphere1.obj")
    base.update(kw)
    return RenderConfig(**base)


def test_dense_table_routing():
    """Every chain entry's triangles land in the table exactly once,
    tagged with the right owner/entry/cull."""
    from tpurt.render.plucker_fused import build_dense_table

    cfg = _cfg()
    scene, _, _ = default_scene(cfg)
    table = build_dense_table(scene)
    ids = np.asarray(table.ids)[0]
    ent = np.asarray(table.entry)[0]
    own = np.asarray(table.owner)[0]
    live = ids >= 0
    assert table.count == live.sum()
    for e, members in enumerate(scene.mega_chain_members):
        want = []
        for i in members:
            first, count = scene.mesh_tri_ranges[i]
            want.extend(range(first, first + count))
        got = ids[live & (ent == e)]
        assert sorted(got.tolist()) == sorted(want)
        assert set(own[live & (ent == e)].tolist()) == set(members)
    # padding columns are inert
    assert (ent[~live] == -1).all()


def test_fused_sweep_matches_exact_mt():
    """The sweep's winner (t, column) against a per-triangle exact MT
    fold in index order — the reference's strict-< dense loop
    semantics (Trace.cl:352-357). t within Plücker precision; the
    winning COLUMN must match exactly."""
    import tpurt.render.intersect as I
    from tpurt.render.plucker_fused import build_dense_table, sweep_entry_local

    cfg = _cfg()
    scene, _, _ = default_scene(cfg)
    table = build_dense_table(scene)

    r = 128
    rng = np.random.default_rng(0)
    lo_r = (np.array([[0, 0, -200]], np.float32)
            + rng.standard_normal((r, 3)).astype(np.float32) * 5)
    tgt = rng.standard_normal((r, 3)).astype(np.float32) * 30
    ld_r = tgt - lo_r
    ld_r /= np.linalg.norm(ld_r, axis=1, keepdims=True)
    lo = v3lib.from_rows(jnp.asarray(lo_r))
    ld = v3lib.from_rows(jnp.asarray(ld_r))
    t, col = sweep_entry_local(lo, ld, jnp.zeros((r,), jnp.int32), table)
    t, col = np.asarray(t), np.asarray(col)

    ids = np.asarray(table.ids)[0]
    ent = np.asarray(table.entry)[0]
    cull = np.asarray(table.cull)[0]
    best_t = np.full(r, np.inf)
    best_col = np.full(r, -1)
    for c in range(table.ids.shape[1]):
        if ids[c] < 0 or ent[c] != 0:
            continue
        tri = ids[c]
        tile = lambda a: jnp.broadcast_to(jnp.asarray(a)[tri], (r, 3))
        ok, tt, _n, _back = I._mt_single(
            jnp.asarray(lo_r), jnp.asarray(ld_r),
            tile(scene.tri_pos_a), tile(scene.tri_pos_b),
            tile(scene.tri_pos_c),
            tile(scene.tri_nrm_a), tile(scene.tri_nrm_b),
            tile(scene.tri_nrm_c),
            jnp.full((r,), bool(cull[c])),
        )
        ok, tt = np.asarray(ok), np.asarray(tt)
        win = ok & (tt < best_t)
        best_t[win] = tt[win]
        best_col[win] = c

    assert (col >= 0).sum() > r // 4, "test rays barely hit the scene"
    assert ((col >= 0) == (best_col >= 0)).all()
    both = col >= 0
    assert (col[both] == best_col[both]).all()
    np.testing.assert_allclose(t[both], best_t[both], rtol=3e-5, atol=1e-5)


def test_dense_mega_matches_bvh_mega():
    """Full frames: dense engine vs the BVH megakernel on the default
    preset (lit Cornell + transformed sphere). Identical uint8 frames
    up to isolated knife-edge pixels (sweep-precision winner choice).
    Compared TONEMAPPED (the display artifact; render_frame returns
    linear radiance whose mean is ~0.06 on this scene)."""
    from tpurt.render.tonemap import tonemap

    cfg = _cfg(width=48, height=48, rays_per_pixel=4, max_bounces=6,
               rays_per_batch=512)
    scene, cam, _ = default_scene(cfg)
    ref = np.asarray(tonemap(render_frame(scene, cam, cfg)))
    assert ref.mean() > 1.0, "reference frame unexpectedly dark"
    out = np.asarray(tonemap(
        render_frame(scene, cam, cfg.replace(mega_dense=True))
    ))
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    frac = (diff.sum(-1) > 0).mean()
    assert frac < 0.005, f"{frac:.4f} of pixels differ"
    # A knife-edge flip re-routes that sample's whole PATH (different
    # material chain), so a divergent pixel can differ by up to 255 —
    # bound the count (above) and the image-level drift, not the
    # per-pixel max (same contract as test_plucker's frame test).
    assert abs(ref.mean() - out.mean()) < 0.02 * max(ref.mean(), 1.0)


def test_dense_mega_quota_and_staged():
    """The dense engine composes with the quota (pixels_per_lane) and
    staged-compaction machinery: same frame as the plain dense run."""
    from tpurt.render.tonemap import tonemap

    cfg = _cfg(rays_per_batch=128)
    scene, cam, _ = default_scene(cfg)
    ref = np.asarray(tonemap(
        render_frame(scene, cam, cfg.replace(mega_dense=True))
    ))
    quota = np.asarray(tonemap(render_frame(scene, cam, cfg.replace(
        mega_dense=True, pixels_per_lane=2))))
    staged = np.asarray(tonemap(render_frame(scene, cam, cfg.replace(
        mega_dense=True, pixels_per_lane=2, compaction_threshold=64))))
    for out in (quota, staged):
        diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
        assert (diff.sum(-1) > 0).mean() < 0.01
        assert diff.max() <= 8
