"""Failure recovery: retry semantics + crash/cold-restart resume.

The reference exits fatally on any device error (image.hpp:33-36);
tpurt retries idempotent tile/batch renders on TRANSIENT device errors
only — deterministic bugs propagate immediately — and a crashed run
with a TileAccumulator resumes from its finished tiles bitwise."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

import jax

import tpurt.render.renderer as renderer
from tpurt.config import RenderConfig
from tpurt.io.checkpoint import TileAccumulator
from tpurt.render.renderer import render_frame
from tpurt.scene.presets import default_scene


CFG = RenderConfig(width=32, height=32, rays_per_pixel=2, max_bounces=4,
                   tile_size=16, object_path="sphere0.obj")


@pytest.fixture(scope="module")
def scene_cam():
    scene, cam, _ = default_scene(CFG)
    return scene, cam


def test_transient_error_retries(scene_cam, monkeypatch):
    scene, cam = scene_cam
    clean = render_frame(scene, cam, CFG)

    calls = {"n": 0}
    real = renderer.render_batch_flat

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("injected transient device loss")
        return real(*a, **kw)

    monkeypatch.setattr(renderer, "render_batch_flat", flaky)
    out = render_frame(scene, cam, CFG, retries=2)
    assert calls["n"] >= 2  # first call failed, retry happened
    assert np.array_equal(out, clean)


def test_deterministic_error_propagates(scene_cam, monkeypatch):
    scene, cam = scene_cam
    calls = {"n": 0}

    def broken(*a, **kw):
        calls["n"] += 1
        raise ValueError("deterministic bug: wrong shape")

    monkeypatch.setattr(renderer, "render_batch_flat", broken)
    with pytest.raises(ValueError):
        render_frame(scene, cam, CFG, retries=3)
    assert calls["n"] == 1  # NOT re-executed `retries` times


def test_transient_error_exhausts_retries(scene_cam, monkeypatch):
    scene, cam = scene_cam

    def always_down(*a, **kw):
        raise jax.errors.JaxRuntimeError("device gone")

    monkeypatch.setattr(renderer, "render_batch_flat", always_down)
    with pytest.raises(jax.errors.JaxRuntimeError):
        render_frame(scene, cam, CFG, retries=2)


def test_cold_restart_resume_bitwise(scene_cam, monkeypatch, tmp_path):
    """Crash after 2 tiles -> new process (fresh accumulator object from
    the same npz path) -> finished frame identical to an uninterrupted
    render."""
    scene, cam = scene_cam
    ckpt = str(tmp_path / "acc.npz")
    clean = render_frame(
        scene, cam, CFG, accumulator=TileAccumulator(CFG, path=ckpt + ".clean")
    )

    real = renderer.render_tile
    calls = {"n": 0}

    def crash_after_two(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise jax.errors.JaxRuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(renderer, "render_tile", crash_after_two)
    acc = TileAccumulator(CFG, path=ckpt)
    with pytest.raises(jax.errors.JaxRuntimeError):
        render_frame(scene, cam, CFG, accumulator=acc, retries=0)
    monkeypatch.setattr(renderer, "render_tile", real)

    # Cold restart: a new accumulator loads the finished tiles from disk
    # and the renderer only re-renders the missing ones.
    acc2 = TileAccumulator(CFG, path=ckpt)
    assert acc2.num_tiles >= 2
    resumed = render_frame(scene, cam, CFG, accumulator=acc2)
    assert np.array_equal(resumed, clean)
