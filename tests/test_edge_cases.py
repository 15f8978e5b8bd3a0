"""Edge-case semantics: bounce limits, invisible-budget termination,
degenerate configs — exercised on both engines."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

from tpurt.config import RenderConfig
from tpurt.core.camera import Camera
from tpurt.render.renderer import render_frame
from tpurt.scene.builder import Material, SceneBuilder
from tpurt.scene.presets import cornell_sphere_scene
from tpurt.scene.types import MaterialType


@pytest.mark.parametrize("engine", ["modular", "mega"])
def test_zero_bounces_black(engine):
    """maxBounceCount 0 never enters the trace loop (Trace.cl:493):
    the image is black."""
    cfg = RenderConfig(width=8, height=8, rays_per_pixel=2, max_bounces=0,
                       tile_size=8, object_path="sphere0.obj", engine=engine)
    scene, cam, _ = cornell_sphere_scene(0, cfg)
    out = render_frame(scene, cam, cfg)
    np.testing.assert_array_equal(out, 0.0)


def _invisible_sandwich(n_planes: int):
    """A stack of invisible planes in front of an emissive back wall."""
    b = SceneBuilder()
    for i in range(n_planes):
        q = b.add_quad(
            (-200, -200, 10 + i * 2), (200, -200, 10 + i * 2),
            (200, 200, 10 + i * 2), (-200, 200, 10 + i * 2),
            (0, 0, 1), (1, 1, 1),
        )
        q.material = Material(type=MaterialType.INVISIBLE, color=(1, 1, 1))
    back = b.add_quad((-200, -200, 0), (200, -200, 0), (200, 200, 0),
                      (-200, 200, 0), (0, 0, 1), (0, 0, 0))
    back.material = Material(
        type=MaterialType.SOLID, color=(1, 1, 1),
        emission_color=(1.0, 0.5, 0.25), emission_strength=1.0,
        specular_probability=1.0,
    )
    scene = b.freeze()
    cam = Camera.create((0, 0, 100), yaw=float(np.pi), aspect_ratio=1.0)
    return scene, cam


@pytest.mark.parametrize("engine", ["modular", "mega"])
def test_invisible_passthrough_reaches_emitter(engine):
    """Invisible hits advance the ray without spending a bounce
    (Trace.cl:502-506): rays cross a few invisible planes and still
    collect the emitter with bounce budget to spare."""
    scene, cam = _invisible_sandwich(4)
    cfg = RenderConfig(width=6, height=6, rays_per_pixel=1, max_bounces=2,
                       tile_size=6, engine=engine, invisible_budget=32)
    out = render_frame(scene, cam, cfg)
    # centre pixel looks straight at the emitter through 4 invisible planes
    np.testing.assert_allclose(out[3, 3], [1.0, 0.5, 0.25], atol=1e-5)


@pytest.mark.parametrize("engine", ["modular", "mega"])
def test_invisible_budget_terminates(engine):
    """More invisible crossings than the budget: the path terminates
    instead of looping (the reference's loop is unbounded here —
    the budget is our documented fix, RenderConfig.invisible_budget)."""
    scene, cam = _invisible_sandwich(12)
    cfg = RenderConfig(width=4, height=4, rays_per_pixel=1, max_bounces=2,
                       tile_size=4, engine=engine, invisible_budget=4)
    out = render_frame(scene, cam, cfg)  # must not hang
    assert np.isfinite(out).all()


def test_engines_agree_on_invisible_budget():
    scene, cam = _invisible_sandwich(12)
    cfg = RenderConfig(width=6, height=6, rays_per_pixel=2, max_bounces=3,
                       tile_size=6, invisible_budget=4)
    a = render_frame(scene, cam, cfg.replace(engine="mega"))
    b = render_frame(scene, cam, cfg.replace(engine="modular"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("engine", ["modular", "mega"])
def test_single_triangle_mesh(engine):
    """A 1-triangle mesh exercises the degenerate leaf path (the
    megakernel's second inline slot is a zero triangle the MT
    determinant check rejects)."""
    b = SceneBuilder()
    tri_pos = np.array([[[-50, -50, 0], [50, -50, 0], [0, 50, 0]]], np.float32)
    tri_nrm = np.broadcast_to(
        np.array([0, 0, 1], np.float32), (1, 3, 3)
    ).copy()
    h = b.add_triangles(tri_pos, tri_nrm)
    h.material = Material(type=MaterialType.SOLID, color=(1, 1, 1),
                          emission_color=(0.25, 0.5, 1.0),
                          emission_strength=1.0, specular_probability=1.0)
    h.scale = 2.0  # non-identity: exercises the transformed chain entry
    b.add_mesh(h)
    scene = b.freeze()
    cam = Camera.create((0, 0, 100), yaw=float(np.pi), aspect_ratio=1.0)
    cfg = RenderConfig(width=6, height=6, rays_per_pixel=1, max_bounces=2,
                       tile_size=6, engine=engine)
    out = render_frame(scene, cam, cfg)
    np.testing.assert_allclose(out[3, 3], [0.25, 0.5, 1.0], atol=1e-5)


@pytest.mark.parametrize("engine", ["modular", "mega"])
def test_empty_scene_is_black(engine):
    b = SceneBuilder()
    q = b.add_quad((-1, -1, -500), (1, -1, -500), (1, 1, -500), (-1, 1, -500),
                   (0, 0, 1), (0.5, 0.5, 0.5))
    q.material = Material(type=MaterialType.SOLID, color=(0, 0, 0))
    scene = b.freeze()
    cam = Camera.create((0, 0, 100), yaw=0.0, aspect_ratio=1.0)  # looks +z, away from the quad
    cfg = RenderConfig(width=4, height=4, rays_per_pixel=1, max_bounces=3,
                       tile_size=4, engine=engine)
    out = render_frame(scene, cam, cfg)
    np.testing.assert_array_equal(out, 0.0)