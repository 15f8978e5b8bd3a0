"""Flat lane batching vs tile decomposition.

The megakernel fast path renders frames as flat rays_per_batch lane
batches; seeds are pure functions of absolute pixel index, so it must
be bitwise-identical to the square-tile sweep at any batch size,
with and without the staged-compaction driver."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

from tpurt.config import RenderConfig
from tpurt.render.renderer import render_frame
from tpurt.scene.presets import default_scene


def _cfg(**kw):
    base = dict(width=40, height=24, rays_per_pixel=3, max_bounces=5,
                tile_size=16, object_path="sphere1.obj", engine="mega")
    base.update(kw)
    return RenderConfig(**base)


def test_flat_matches_tiled_bitwise():
    cfg_tiled = _cfg(rays_per_batch=0)  # disables the flat path
    scene, cam, _ = default_scene(cfg_tiled)
    tiled = render_frame(scene, cam, cfg_tiled)

    for batch in (256, 512, 4096):
        flat = render_frame(scene, cam, _cfg(rays_per_batch=batch,
                                             compaction_threshold=0))
        assert np.array_equal(tiled, flat), batch


def test_flat_staged_compaction_near_bitwise():
    """Staged compaction re-runs the tail lanes under a different
    executable, where XLA may contract FMAs differently — identical up
    to 1-ulp on a handful of pixels (the tile-staged path behaves the
    same; test_render_golden pins an exactly-equal config)."""
    cfg_plain = _cfg(rays_per_batch=512, compaction_threshold=0)
    scene, cam, _ = default_scene(cfg_plain)
    plain = render_frame(scene, cam, cfg_plain)
    staged = render_frame(scene, cam, _cfg(rays_per_batch=512,
                                           compaction_threshold=256))
    exact = (plain == staged).all(axis=-1)
    assert exact.mean() > 0.99, exact.mean()
    np.testing.assert_allclose(plain, staged, rtol=1e-5, atol=1e-7)
