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


def test_cross_frame_packing_bitwise():
    """frames_per_batch packing: F frames in one launch must be
    BITWISE what rendering each frame separately produces — per-pixel
    trajectories are pure functions of (pixel, frame, sample); packing
    only changes which lane runs them (megakernel frames_per_batch)."""
    from tpurt.core.camera import Camera
    from tpurt.render.renderer import (
        _flat_batch_size, render_batch_flat, render_batch_flat_frames,
    )

    cfg = _cfg(rays_per_batch=256, pixels_per_lane=2,
               compaction_threshold=0, rays_per_pixel=2, max_bounces=4)
    scene, cam0, _ = default_scene(cfg)
    # Rotation-only second camera (shared position: packing contract).
    cam1 = Camera.create(
        position=tuple(np.asarray(cam0.position)),
        pitch=float(cam0.pitch), yaw=float(cam0.yaw) + 0.15,
        roll=float(cam0.roll), fov_degrees=cfg.fov_degrees,
        aspect_ratio=cfg.aspect_ratio,
    )
    b = _flat_batch_size(cfg)
    rows = b * cfg.pixels_per_lane
    total = cfg.width * cfg.height
    for start in (0, rows):
        packed, segs_p, _ = render_batch_flat_frames(
            scene, (cam0, cam1), cfg, start, frame_index=3)
        packed = np.asarray(packed)
        segs = 0.0
        for f, cam in enumerate((cam0, cam1)):
            single, s1, _ = render_batch_flat(
                scene, cam, cfg, start, frame_index=3 + f)
            np.testing.assert_array_equal(
                packed[f * rows:(f + 1) * rows], np.asarray(single),
                err_msg=f"frame {f} start {start}")
            segs += float(s1)
        assert segs == float(segs_p)
    assert rows < total  # the loop really covered two distinct regions


def test_cross_frame_packing_static_camera(monkeypatch):
    """cameras=None-style pack (same camera, distinct frame indices) —
    the progressive-accumulation shape the bench steady block uses.
    An all-identical camera tuple must collapse to the megakernel's
    SHARED frame-start direction table (cameras=None / share_rd), so
    the operand footprint stays one frame's worth at any pack depth."""
    import tpurt.render.renderer as R
    from tpurt.render.renderer import (
        render_batch_flat, render_batch_flat_frames,
    )

    cfg = _cfg(rays_per_batch=256, pixels_per_lane=2,
               compaction_threshold=0, rays_per_pixel=2, max_bounces=3)
    scene, cam, _ = default_scene(cfg)
    rows = 256 * cfg.pixels_per_lane
    seen = {}
    orig = R._mega_flat_multi

    def spy(s, cameras, *a, **kw):
        seen["n_cams"] = len(cameras)
        return orig(s, cameras, *a, **kw)

    monkeypatch.setattr(R, "_mega_flat_multi", spy)
    packed, _, _ = render_batch_flat_frames(
        scene, (cam, cam, cam), cfg, 0, frame_index=0)
    assert seen["n_cams"] == 1  # collapsed -> shared rd table engaged
    packed = np.asarray(packed)
    for f in range(3):
        single, _, _ = render_batch_flat(scene, cam, cfg, 0, frame_index=f)
        np.testing.assert_array_equal(
            packed[f * rows:(f + 1) * rows], np.asarray(single),
            err_msg=f"frame {f}")


def test_interleave_schedules_bitwise(monkeypatch):
    """All gather/body orderings (inline, carry, pair2, gfirst) are
    bitwise-identical — they move the row DMA's program position, never
    a lane trajectory (megakernel run_megakernel docstring)."""
    import tpurt.config as config_mod

    monkeypatch.setattr(config_mod, "MEGA_INTERLEAVE_FLOOR", 128)
    cfg0 = _cfg(rays_per_batch=512, pixels_per_lane=2,
                compaction_threshold=0, rays_per_pixel=2, max_bounces=4,
                mega_interleave=4)
    scene, cam, _ = default_scene(cfg0)
    base = render_frame(scene, cam, cfg0)
    for sched in ("carry", "pair2", "gfirst"):
        out = render_frame(scene, cam, cfg0.replace(mega_schedule=sched))
        np.testing.assert_array_equal(base, out, err_msg=sched)
    # carry at interleave 2 (the other measured point)
    out = render_frame(scene, cam, cfg0.replace(mega_schedule="carry",
                                                mega_interleave=2))
    np.testing.assert_array_equal(base, out)
