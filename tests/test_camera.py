"""Camera ray generation vs the oracle's MakeRay transcription."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpurt.core.camera import Camera, make_camera_rays, make_ray, pixel_uv


def test_make_ray_matches_oracle():
    cam = Camera.create(
        (0.0, 150.0, 250.0), pitch=0.1, yaw=3.14, roll=-0.2,
        fov_degrees=90.0, aspect_ratio=1.5,
    )
    rs = np.random.RandomState(0)
    uvs = rs.uniform(0, 1, (32, 2)).astype(np.float32)
    ro, rd = make_ray(cam, jnp.asarray(uvs))
    for i, (u, v) in enumerate(uvs):
        o, d = oracle.make_ray(
            np.array([0.0, 150.0, 250.0], np.float32),
            0.1, 3.14, -0.2, 90.0, 1.5, u, v,
        )
        np.testing.assert_allclose(np.asarray(ro)[i], o, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rd)[i], d, atol=1e-5)


def test_pixel_uv_y_flip():
    # uv = (x/w, 1 - y/h): y=0 is the TOP row (Trace.cl:634-635).
    uv = np.asarray(pixel_uv(jnp.asarray([0, 7]), jnp.asarray([0, 7]), 8, 8))
    np.testing.assert_allclose(uv[0], [0.0, 1.0])
    np.testing.assert_allclose(uv[1], [7 / 8, 1 - 7 / 8])


def test_seed_is_pure_function_of_absolute_pixel():
    cam = Camera.create((0, 0, 0), aspect_ratio=1.0)
    xs = jnp.asarray([3, 3])
    ys = jnp.asarray([5, 5])
    _, _, s1 = make_camera_rays(cam, xs, ys, 16, 16, frame_index=2)
    _, _, s2 = make_camera_rays(cam, xs, ys, 16, 16, frame_index=2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    expected = oracle.make_seed(5 * 16 + 3, 2, 0)
    assert int(np.asarray(s1)[0]) == expected


def test_camera_looks_down_negative_z_at_yaw_pi():
    cam = Camera.create((0, 0, 0), yaw=np.pi, aspect_ratio=1.0)
    _, rd = make_ray(cam, jnp.asarray([[0.5, 0.5]], np.float32))
    d = np.asarray(rd)[0]
    assert d[2] < -0.999
