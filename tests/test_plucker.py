"""Plücker GEMM dense-sweep engine vs the exact broadcast sweep.

The Plücker form (render/plucker.py) is algebraically identical to
Möller-Trumbore but sums in a different order, so agreement is tested
to tolerance on generic inputs (knife-edge candidates are measure-zero
for random geometry) — plus an end-to-end render comparison.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

from tpurt.render.intersect import _mt_sweep, _make_tri_table, _LocalBest
from tpurt.render.plucker import build_plucker_table, plucker_sweep


def _random_rays_tris(seed, r=256, t=173, spread=50.0):
    rng = np.random.default_rng(seed)
    ro = rng.standard_normal((r, 3)).astype(np.float32) * spread
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    base = rng.standard_normal((t, 1, 3)).astype(np.float32) * spread
    tri = base + rng.standard_normal((t, 3, 3)).astype(np.float32) * spread * 0.3
    return ro, rd, tri


@pytest.mark.parametrize("cull", [False, True])
def test_plucker_matches_exact_sweep(cull):
    ro, rd, tri = _random_rays_tris(0)
    r, t = ro.shape[0], tri.shape[0]
    pa, pb, pc = (jnp.asarray(tri[:, i]) for i in range(3))

    # Vertex normals = geometric normals, so the exact path's
    # smooth-normal backface test coincides with the Plücker engine's
    # geometric one (they only diverge on shaded silhouettes).
    ng = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ng /= np.linalg.norm(ng, axis=-1, keepdims=True)
    ng = jnp.asarray(ng.astype(np.float32))

    from tpurt.render.intersect import _TriTable

    table_exact = _TriTable(
        pa=pa, pb=pb, pc=pc, na=ng, nb=ng, nc=ng,
        cull=jnp.full((t,), cull),
    )
    best0 = _LocalBest(
        t=jnp.full((r,), np.float32(np.inf)),
        tri=jnp.full((r,), -1, jnp.int32),
    )
    exact = _mt_sweep(jnp.asarray(ro), jnp.asarray(rd), table_exact, best0,
                      jnp.int32(0))

    ptab = build_plucker_table(
        pa, pb, pc, cull=jnp.full((t,), cull),
        tri_id=jnp.arange(t, dtype=jnp.int32),
    )
    pt, pi = plucker_sweep(
        jnp.asarray(ro), jnp.asarray(rd), ptab, best0.t, best0.tri
    )

    exact_t = np.asarray(exact.t)
    exact_i = np.asarray(exact.tri)
    pt = np.asarray(pt)
    pi = np.asarray(pi)

    # Winner agreement on non-degenerate lanes (same tri, t within tol).
    both_hit = (exact_i >= 0) & (pi >= 0)
    either = (exact_i >= 0) | (pi >= 0)
    assert both_hit.sum() > 10  # scene actually hits
    agree = both_hit & (exact_i == pi)
    # allow rare disagreements (grazing hits / near-tie winners)
    assert agree.sum() >= 0.99 * either.sum()
    rel = np.abs(pt[agree] - exact_t[agree]) / np.maximum(exact_t[agree], 1e-3)
    assert rel.max() < 1e-4


def test_plucker_culling_geometric():
    # A single CCW triangle viewed from behind: culled when cull=True.
    pa = jnp.asarray([[0.0, 0.0, 0.0]])
    pb = jnp.asarray([[1.0, 0.0, 0.0]])
    pc = jnp.asarray([[0.0, 1.0, 0.0]])
    # Ng = e1 x e2 = +z; ray going +z sees the back side.
    ro = jnp.asarray([[0.2, 0.2, -1.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    for cull, expect_hit in ((True, False), (False, True)):
        tab = build_plucker_table(
            pa, pb, pc, cull=jnp.asarray([cull]),
            tri_id=jnp.asarray([0], jnp.int32),
        )
        t, i = plucker_sweep(
            ro, rd, tab,
            jnp.full((1,), np.float32(np.inf)), jnp.full((1,), -1, jnp.int32),
        )
        assert (int(i[0]) >= 0) == expect_hit, (cull, np.asarray(t))


def test_plucker_render_end_to_end():
    """Full render with dense_engine='plucker' matches exact within a
    loose per-pixel tolerance (stochastic paths can diverge on the rare
    disagreeing lanes, so compare means + pixel majority)."""
    import jax

    from tpurt.config import RenderConfig
    from tpurt.scene.presets import default_scene
    from tpurt.render.renderer import render_frame

    kw = dict(width=32, height=32, rays_per_pixel=2, max_bounces=4,
              tile_size=32, object_path="sphere1.obj", engine="modular",
              bruteforce_threshold=1 << 20)
    cfg_e = RenderConfig(**kw)
    cfg_p = RenderConfig(**kw, dense_engine="plucker")
    scene, cam, _ = default_scene(cfg_e)
    img_e = render_frame(scene, cam, cfg_e)
    img_p = render_frame(scene, cam, cfg_p)
    # Most pixels identical; a silhouette band on curved culled meshes
    # diverges by design (geometric vs smooth-normal cull) and ulp-level
    # t differences compound stochastically downstream.
    same = np.isclose(img_e, img_p, rtol=1e-3, atol=1e-3).all(axis=-1)
    assert same.mean() > 0.9, same.mean()
    assert abs(img_e.mean() - img_p.mean()) < 0.02 * max(img_e.mean(), 1e-6)
