"""Respread tail: the staged quota driver's work-redistribution stage.

When the surviving lanes of a staged quota batch (and their unstarted
quota pixels) fit one tail batch, the driver re-traces every incomplete
pixel as a fresh dense P=1 batch instead of grinding the uncapped
stage at a few-percent occupancy (renderer._mega_finish_staged). Pixel
traces are pure functions of the absolute pixel index, so the respread
frame must match the non-respread staged frame up to the usual
different-executable 1-ulp class, and the plain path likewise.

The SPMD counterpart of the reference's dynamic queue draining its
straggler tail across devices (src/image.hpp:289-333).
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)
import numpy as np

from tpurt.config import RenderConfig
from tpurt.render.renderer import render_batch_flat, render_frame
from tpurt.scene.presets import default_scene


def _cfg(**kw):
    base = dict(width=64, height=32, rays_per_pixel=8, max_bounces=5,
                tile_size=32, object_path="sphere1.obj", engine="mega")
    base.update(kw)
    return RenderConfig(**base)


def test_respread_triggers_and_matches(monkeypatch):
    """With a small stage cap the lanes cannot finish inside stage 0,
    so the respread fires; the frame must match both the respread-off
    staged run and the plain quota run."""
    from tpurt.render import renderer as R

    monkeypatch.setattr(R, "_MEGA_STAGE_ITERS", 48)
    cfg = _cfg(rays_per_batch=256, pixels_per_lane=8,
               compaction_threshold=128)
    scene, cam, _ = default_scene(cfg)

    stats = []
    mean, segs, _ = render_batch_flat(scene, cam, cfg, 0,
                                      stage_stats=stats)
    assert any("respread" in s for s in stats), stats
    spread = np.asarray(mean)

    off = np.asarray(render_batch_flat(
        scene, cam, cfg.replace(mega_tail_respread=False), 0)[0])
    plain = np.asarray(render_batch_flat(
        scene, cam, cfg.replace(compaction_threshold=0), 0)[0])
    for other, tag in ((off, "respread-off"), (plain, "plain")):
        exact = (spread == other).all(axis=-1)
        assert exact.mean() > 0.99, (tag, exact.mean())
        np.testing.assert_allclose(spread, other, rtol=1e-5, atol=1e-7,
                                   err_msg=tag)

    # Re-traced in-flight pixels add their partial first-pass segments
    # again: the respread run's segment count is >= the plain run's but
    # within the one-extra-trace bound.
    segs_plain = float(render_batch_flat(
        scene, cam, cfg.replace(compaction_threshold=0), 0)[1])
    assert float(segs) >= segs_plain * 0.999
    assert float(segs) <= segs_plain * 1.5


def test_respread_full_frame_multi_batch(monkeypatch):
    """Multi-batch frame (padding tail batch included) through
    render_frame with respread on vs off."""
    from tpurt.render import renderer as R

    monkeypatch.setattr(R, "_MEGA_STAGE_ITERS", 48)
    cfg = _cfg(width=56, height=24, rays_per_pixel=8,
               rays_per_batch=64, pixels_per_lane=8,
               compaction_threshold=64)
    scene, cam, _ = default_scene(cfg)
    on = render_frame(scene, cam, cfg)
    off = render_frame(scene, cam, cfg.replace(mega_tail_respread=False))
    exact = (on == off).all(axis=-1)
    assert exact.mean() > 0.99, exact.mean()
    np.testing.assert_allclose(on, off, rtol=1e-5, atol=1e-7)
