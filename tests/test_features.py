"""Animation driver, mesh picking, progressive preview, JSON scenes, CLI."""

import json
import math
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

from tpurt import anim
from tpurt.config import RenderConfig
from tpurt.core.camera import Camera
from tpurt.render.pick import pick_mesh
from tpurt.render.renderer import render_frame
from tpurt.scene.jsonscene import scene_from_json
from tpurt.scene.presets import cornell_sphere_scene
from tpurt.io.bmp import read_bmp


@pytest.fixture(scope="module")
def small():
    cfg = RenderConfig(width=12, height=12, rays_per_pixel=1, max_bounces=2,
                       tile_size=12, object_path="sphere0.obj")
    scene, cam, _ = cornell_sphere_scene(0, cfg)
    return scene, cam, cfg


def test_video_frame_yaw_schedule(small):
    scene, _, _ = small
    s0 = anim.video_frame_scene(scene, 0, 8)
    assert float(s0.mesh_yaw[-1]) == pytest.approx(5.5)
    s3 = anim.video_frame_scene(scene, 3, 8)
    assert float(s3.mesh_yaw[-1]) == pytest.approx(2 * math.pi * 3 / 8 + 5.5)
    # other meshes untouched
    np.testing.assert_array_equal(
        np.asarray(s3.mesh_yaw[:-1]), np.asarray(scene.mesh_yaw[:-1])
    )


def test_identity_mesh_rotation_refused(small):
    scene, _, _ = small
    with pytest.raises(ValueError, match="identity"):
        anim.set_mesh_yaw(scene, 0, 1.0)  # mesh 0 is a Cornell quad


def test_render_video_writes_frames(small, tmp_path):
    scene, cam, cfg = small
    cfg = cfg.replace(video_frame_count=2)
    paths = anim.render_video(scene, cam, cfg, out_dir=str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["output_0.bmp", "output_1.bmp"]
    imgs = [read_bmp(p) for p in paths]
    assert imgs[0].shape == (12, 12, 3)
    assert not np.array_equal(imgs[0], imgs[1])  # the model rotated


def test_progressive_render_preview(small, tmp_path):
    scene, cam, cfg = small
    prev = str(tmp_path / "preview.bmp")
    radiance = anim.progressive_render(
        scene, cam, cfg, passes=3, preview_path=prev, preview_every=2
    )
    assert os.path.exists(prev)
    assert radiance.shape == (12, 12, 3)
    # average of 3 distinct frames
    f = [render_frame(scene, cam, cfg, frame_index=i) for i in range(3)]
    np.testing.assert_allclose(radiance, sum(f) / 3, atol=1e-6)


def test_pick_mesh(small):
    scene, cam, _ = small
    # Centre of the view: the model sphere or whatever is closest; the
    # semantics to check are (a) valid index, (b) -1 off-scene.
    idx = pick_mesh(scene, cam, jnp.asarray([[0.5, 0.35], [0.5, 0.99]]))
    vals = np.asarray(idx)
    assert vals.shape == (2,)
    assert vals[0] >= 0  # looking into the box hits something
    # Looking away from the scene (+z from far outside) hits nothing.
    # (A backface CAN be picked for non-OneSided meshes — pick culls
    # only OneSided, Trace.cl:684.)
    cam_away = Camera.create((0, 0, 10000), yaw=0.0, aspect_ratio=1.0)
    assert int(np.asarray(pick_mesh(scene, cam_away, jnp.asarray([0.5, 0.5])))) == -1


def test_pick_matches_render_front_wall_semantics(small):
    """checkIntersectingRay culls OneSided backfaces, so from outside
    the box the pick ray passes the front wall and reports an interior
    mesh — same wall behaviour the render path shows."""
    scene, cam, cfg = small
    idx = int(np.asarray(pick_mesh(scene, cam, jnp.asarray([0.5, 0.3]))))
    front_wall = 2  # third quad added by add_cornell_box
    assert idx != front_wall


def test_json_scene_roundtrip(tmp_path):
    spec = {
        "camera": {"position": [0, 80, 220], "yaw": 3.14159, "fov_degrees": 70},
        "meshes": [
            {
                "source": {"procedural": "icosphere", "subdivisions": 0,
                           "radius": 50},
                "material": {"type": "solid", "color": [1, 1, 1],
                             "specular_probability": 1.0},
                "scale": 0.5,
                "cornell_box": True,
            }
        ],
    }
    cfg = RenderConfig(width=8, height=8, rays_per_pixel=1, max_bounces=2,
                       tile_size=8)
    scene, cam = scene_from_json(spec, cfg)
    assert scene.num_meshes == 8  # 7 box quads + model
    out = render_frame(scene, cam, cfg)
    assert np.isfinite(out).all()


def test_cli_headless(tmp_path):
    out = str(tmp_path / "o.bmp")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    r = subprocess.run(
        [sys.executable, "-m", "tpurt.cli", "--cpu", "--width", "8",
         "--height", "8", "--rays-per-pixel", "1", "--max-bounces", "2",
         "--object-path", "sphere0.obj", "--output", out],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Rendered 8x8" in r.stdout
    img = read_bmp(out)
    assert img.shape == (8, 8, 3)


def test_cli_interactive_prompts(tmp_path):
    out = str(tmp_path / "o.bmp")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    r = subprocess.run(
        [sys.executable, "-m", "tpurt.cli", "--cpu", "--interactive",
         "--object-path", "sphere0.obj", "--output", out],
        input="0\n8\n8\n1\n2\n\n",  # devices, width, height, spp, bounces, keep obj
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert read_bmp(out).shape == (8, 8, 3)


def test_cli_list_devices():
    r = subprocess.run(
        [sys.executable, "-m", "tpurt.cli", "--cpu", "--list-devices"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    assert "device(s)" in r.stdout
