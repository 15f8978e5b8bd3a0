"""Interactive viewer: reference key semantics, accumulation reset on
camera change, runtime spp/bounce adjustment, pick-to-tint
(main.cpp:341-653 behavior spec)."""

import io
import math

import numpy as np
import pytest

from tpurt.config import RenderConfig
from tpurt.scene.presets import default_scene
from tpurt.viewer import (
    KEY_DT, MOVE_SPEED, ROT_SPEED, ViewerSession, recolor_mesh, run_terminal,
)

CFG = RenderConfig(width=24, height=24, rays_per_pixel=1, max_bounces=3,
                   tile_size=24, object_path="sphere0.obj")


@pytest.fixture(scope="module")
def scene():
    s, _, _ = default_scene(CFG)
    return s


def test_move_keys_match_reference_formulas(scene):
    ses = ViewerSession(scene, CFG)
    x0, y0, z0 = ses.position
    yaw = ses.yaw
    v = MOVE_SPEED * KEY_DT
    # W: pos.x += v*sin(yaw); pos.z += v*cos(yaw)  (main.cpp:487-490)
    ses.move_key("w")
    assert ses.position == pytest.approx(
        (x0 + v * math.sin(yaw), y0, z0 + v * math.cos(yaw)))
    # A: pos.x -= v*cos(yaw); pos.z += v*sin(yaw)  (main.cpp:497-500)
    x1, y1, z1 = ses.position
    ses.move_key("a")
    assert ses.position == pytest.approx(
        (x1 - v * math.cos(yaw), y1, z1 + v * math.sin(yaw)))
    # E: pos.y += v  (main.cpp:510-513)
    x2, y2, z2 = ses.position
    ses.move_key("e")
    assert ses.position == pytest.approx((x2, y2 + v, z2))
    # arrows
    p0, yw0 = ses.pitch, ses.yaw
    ses.move_key("i")
    assert ses.pitch == pytest.approx(p0 - ROT_SPEED * KEY_DT)
    ses.move_key("l")
    assert ses.yaw == pytest.approx(yw0 + ROT_SPEED * KEY_DT)


def test_accumulation_resets_on_move_and_refines(scene):
    ses = ViewerSession(scene, CFG)
    d1 = ses.render_pass()
    d2 = ses.render_pass()
    assert ses.num_passes == 2
    # passes use different frame seeds -> accumulation really averages
    assert not np.array_equal(d1, d2)
    ses.move_key("w")
    assert ses.num_passes == 0
    assert np.all(ses.display() == 0.0)
    # moved camera renders a different frame
    d3 = ses.render_pass()
    assert not np.array_equal(d1, d3)


def test_runtime_spp_and_bounce_adjustment(scene):
    ses = ViewerSession(scene, CFG)
    ses.render_pass()
    ses.adjust_spp(+3)
    assert ses.cfg.rays_per_pixel == 4
    assert ses.num_passes == 1  # spp change keeps the accumulation
    ses.adjust_bounces(+2)
    assert ses.cfg.max_bounces == 5
    assert ses.num_passes == 0  # estimator change resets
    ses.adjust_spp(-10)
    assert ses.cfg.rays_per_pixel == 1  # clamped


def test_pick_tints_red_and_undo(scene):
    ses = ViewerSession(scene, CFG)
    # the Cornell box fills the lower half of the default camera's frame
    idx = ses.pick(CFG.width // 2, int(CFG.height * 0.75))
    assert idx is not None and idx >= 0
    assert ses.picked == idx
    tinted = np.asarray(ses.scene.mat_color)[idx]
    assert tuple(tinted) == (1.0, 0.0, 0.0)  # main.cpp:369 red
    # other meshes untouched
    orig = np.asarray(scene.mat_color)
    mask = np.ones(len(orig), bool)
    mask[idx] = False
    assert np.array_equal(np.asarray(ses.scene.mat_color)[mask], orig[mask])
    ses.clear_tint()
    assert np.array_equal(np.asarray(ses.scene.mat_color), orig)


def test_recolor_is_pure(scene):
    before = np.asarray(scene.mat_color).copy()
    s2 = recolor_mesh(scene, 0, (1.0, 0.0, 0.0))
    assert np.array_equal(np.asarray(scene.mat_color), before)
    assert tuple(np.asarray(s2.mat_color)[0]) == (1.0, 0.0, 0.0)


def test_terminal_session_scripted(scene, tmp_path):
    cmds = "ww\nl\n+\n]\np 12 12\ng 2\nu\no\nQ\n"
    outbuf = io.StringIO()
    import os
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        ses = run_terminal(
            scene, CFG, preview_path=str(tmp_path / "preview.bmp"),
            stream=io.StringIO(cmds), out=outbuf,
        )
    finally:
        os.chdir(old)
    text = outbuf.getvalue()
    assert (tmp_path / "preview.bmp").exists()
    assert (tmp_path / "output.bmp").exists()
    assert "picked mesh" in text
    assert ses.cfg.rays_per_pixel == 2  # the '+' command
    assert ses.cfg.max_bounces == 4  # the ']' command
    assert ses.picked is None  # 'u' undid the tint


def test_render_passes_double_buffered_bitwise(scene, monkeypatch):
    """render_passes must (a) dispatch pass k+1's device work BEFORE
    materialising pass k (the double-buffered delivery), and (b) be
    bitwise-identical to the sequential render_pass loop."""
    cfg = CFG.replace(rays_per_batch=256, compaction_threshold=0)
    seq = ViewerSession(scene, cfg)
    for _ in range(3):
        seq.render_pass()

    dd = ViewerSession(scene, cfg)
    events = []
    orig_dispatch = ViewerSession._dispatch_pass
    orig_acc = ViewerSession._accumulate

    def spy_dispatch(self, frame_index):
        events.append(("dispatch", frame_index))
        return orig_dispatch(self, frame_index)

    def spy_acc(self, bufs):
        events.append(("accumulate", self.num_passes))
        return orig_acc(self, bufs)

    monkeypatch.setattr(ViewerSession, "_dispatch_pass", spy_dispatch)
    monkeypatch.setattr(ViewerSession, "_accumulate", spy_acc)
    out = dd.render_passes(3)

    assert events == [
        ("dispatch", 0),
        ("dispatch", 1), ("accumulate", 0),   # pass 1 in flight while 0 ships
        ("dispatch", 2), ("accumulate", 1),
        ("accumulate", 2),
    ]
    assert dd.num_passes == seq.num_passes == 3
    np.testing.assert_array_equal(out, seq.display())


def test_render_passes_fallback_non_flat(scene):
    """Configs off the flat fast path fall back to sequential passes
    with identical results."""
    cfg = CFG.replace(rays_per_batch=0)  # tile path only
    seq = ViewerSession(scene, cfg)
    seq.render_pass()
    seq.render_pass()
    dd = ViewerSession(scene, cfg)
    out = dd.render_passes(2)
    np.testing.assert_array_equal(out, seq.display())
