"""Cascade respread: recursive full-occupancy re-tracing of incomplete
quota pixels (renderer._mega_finish_staged mega_cascade=True).

Instead of waiting for the survivors' pixels to fit one dense P=1 batch
(the plain respread), the cascade fires mid-decay of the retirement
curve and re-traces every incomplete pixel as a staged QUOTA batch over
the packed pixel list — megakernel list-quota mode, where a lane's
quota pixels are pixel_list[lane0 + k*stride] and the advance step
selects the next pixel from per-slot tables exactly like it selects the
next direction. Pixel traces are pure functions of the absolute pixel
index, so every level reproduces its pixels' radiance regardless of
which batch traces them — the recursive SPMD form of the reference's
dynamic work queue (src/image.hpp:289-333).
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)
import numpy as np

import jax.numpy as jnp

from tpurt.config import RenderConfig
from tpurt.render.renderer import render_batch_flat, render_frame
from tpurt.scene.presets import default_scene


def _cfg(**kw):
    base = dict(width=64, height=32, rays_per_pixel=8, max_bounces=5,
                tile_size=32, object_path="sphere1.obj", engine="mega")
    base.update(kw)
    return RenderConfig(**base)


def _shrink(monkeypatch):
    from tpurt.render import renderer as R

    monkeypatch.setattr(R, "_MEGA_STAGE_ITERS", 48)
    monkeypatch.setattr(R, "_CASCADE_STAGE0", 24)
    monkeypatch.setattr(R, "_CASCADE_W", 128)
    monkeypatch.setattr(R, "_CASCADE_MIN", 64)
    monkeypatch.setattr(R, "_SCHED_TRACES", {})
    monkeypatch.setattr(R, "_RETIRE_CURVES", {})
    monkeypatch.setattr(R, "_SPEC_STATS", {"replayed": 0, "fallback": 0})
    return R


def test_list_quota_matches_flat(monkeypatch):
    """A staged list-quota batch over a PERMUTED pixel set reproduces
    each pixel's flat-path radiance (pixel purity), including pixels
    appearing via the pad-clamp path."""
    R = _shrink(monkeypatch)
    cfg = _cfg(rays_per_batch=2048, pixels_per_lane=1,
               compaction_threshold=0)
    scene, cam, _ = default_scene(cfg)
    ref = np.asarray(render_batch_flat(scene, cam, cfg, 0)[0])

    rng = np.random.RandomState(7)
    pixels = rng.permutation(cfg.width * cfg.height)[:480].astype(np.uint32)
    w, p = 128, 4  # 512 slots >= 480 pixels
    mean, _segs = R._render_pixlist_staged(
        scene, cam, cfg, jnp.asarray(pixels), w, p, 0, 0, depth=0,
    )
    mean = np.asarray(mean)
    # List position j = lane (j % w) slot (j // w) = radiance row
    # (j//w)*w + (j%w) = j: the positional identity _tail_overwrite
    # relies on.
    got = mean[:len(pixels)]
    want = ref[pixels.astype(np.int64)]
    exact = (got == want).all(axis=-1)
    assert exact.mean() > 0.99, exact.mean()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_cascade_matches_plain_and_replays(monkeypatch):
    """Cascade run (nested levels + recursion cap) vs the unstaged
    plain run, then a replayed second frame, all value-equal up to the
    usual different-executable class."""
    R = _shrink(monkeypatch)
    cfg = _cfg(rays_per_batch=256, pixels_per_lane=8,
               compaction_threshold=128, mega_cascade=True)
    scene, cam, _ = default_scene(cfg)
    plain = np.asarray(render_batch_flat(
        scene, cam, cfg.replace(compaction_threshold=0,
                                mega_cascade=False), 0)[0])

    stats = []
    casc = np.asarray(render_batch_flat(scene, cam, cfg, 0,
                                        stage_stats=stats)[0])
    assert any("cascade" in s for s in stats), stats
    exact = (casc == plain).all(axis=-1)
    assert exact.mean() > 0.99, exact.mean()
    np.testing.assert_allclose(casc, plain, rtol=1e-5, atol=1e-7)

    again = np.asarray(render_batch_flat(scene, cam, cfg, 0)[0])
    assert R._SPEC_STATS["replayed"] >= 1, R._SPEC_STATS
    assert R._SPEC_STATS["fallback"] == 0, R._SPEC_STATS
    assert np.array_equal(casc, again)


def test_cascade_full_frame(monkeypatch):
    """Multi-batch frame through render_frame, cascade on vs off."""
    R = _shrink(monkeypatch)
    cfg = _cfg(width=56, height=24, rays_per_pixel=8,
               rays_per_batch=64, pixels_per_lane=8,
               compaction_threshold=64, mega_cascade=True)
    scene, cam, _ = default_scene(cfg)
    on = render_frame(scene, cam, cfg)
    off = render_frame(scene, cam, cfg.replace(mega_cascade=False))
    exact = (on == off).all(axis=-1)
    assert exact.mean() > 0.99, exact.mean()
    np.testing.assert_allclose(on, off, rtol=1e-5, atol=1e-7)
