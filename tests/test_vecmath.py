"""Vector math + optics vs the scalar oracle and analytic identities."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpurt.core import vecmath as vm

F = np.float32


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(F) * scale)


def test_cross_dot_against_numpy():
    a, b = _rand((64, 3), 1), _rand((64, 3), 2)
    np.testing.assert_allclose(
        np.asarray(vm.cross3(a, b)), np.cross(np.asarray(a), np.asarray(b)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vm.dot3(a, b)),
        np.sum(np.asarray(a) * np.asarray(b), -1),
        rtol=1e-5,
    )


def test_euler_rotation_matches_oracle_and_is_orthonormal():
    rs = np.random.RandomState(3)
    for _ in range(20):
        p, y, r = rs.uniform(-4, 4, 3).astype(F)
        m = np.asarray(vm.euler_rotation(jnp.float32(p), jnp.float32(y), jnp.float32(r)))
        np.testing.assert_allclose(m, oracle.euler(p, y, r), atol=2e-6)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(m) - 1.0) < 1e-4


def test_rotate_and_rotate_t_are_inverse():
    m = vm.euler_rotation(jnp.float32(0.3), jnp.float32(-1.2), jnp.float32(2.0))
    v = _rand((32, 3), 5)
    back = vm.rotate_t(m, vm.rotate(m, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_reflect_refract_fresnel_vs_oracle():
    rs = np.random.RandomState(7)
    for _ in range(50):
        d = rs.randn(3).astype(F)
        d /= np.linalg.norm(d)
        n = rs.randn(3).astype(F)
        n /= np.linalg.norm(n)
        if d @ n > 0:
            n = -n  # normals face against the ray, as in the integrator
        ia, ib = rs.uniform(1.0, 2.0, 2).astype(F)
        np.testing.assert_allclose(
            np.asarray(vm.reflect(jnp.asarray(d), jnp.asarray(n))),
            oracle.reflect(d, n), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(vm.refract(jnp.asarray(d), jnp.asarray(n), ia, ib)),
            oracle.refract(d, n, ia, ib), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(vm.fresnel_reflectance(jnp.asarray(d), jnp.asarray(n), ia, ib)),
            oracle.reflectance(d, n, ia, ib), atol=1e-5,
        )


def test_refract_total_internal_reflection_returns_zero():
    d = jnp.asarray(np.array([0.95, -0.3122, 0.0], F))
    d = vm.normalize3(d)
    n = jnp.asarray(np.array([0.0, 1.0, 0.0], F))
    out = vm.refract(d, n, jnp.float32(2.5), jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out), np.zeros(3, F))
    refl = vm.fresnel_reflectance(d, n, jnp.float32(2.5), jnp.float32(1.0))
    assert float(refl) == 1.0


def test_lerp3_endpoints():
    a, b = _rand((8, 3), 1), _rand((8, 3), 2)
    np.testing.assert_allclose(np.asarray(vm.lerp3(a, b, 0.0)), np.asarray(a))
    np.testing.assert_allclose(np.asarray(vm.lerp3(a, b, 1.0)), np.asarray(b))


def test_hsv2rgb_reference_sectors():
    """hsv2rgb matches the reference's switch-table semantics
    (src/math.hpp:19-75): pure hues land in the right sector, s<=0 is
    grey, h>=360 wraps to sector 0."""
    from tpurt.core.vecmath import hsv2rgb

    cases = [
        # (h, s, v) -> expected rgb
        ((0.0, 1.0, 1.0), (1.0, 0.0, 0.0)),     # red, sector 0
        ((120.0, 1.0, 1.0), (0.0, 1.0, 0.0)),   # green, sector 2
        ((240.0, 1.0, 1.0), (0.0, 0.0, 1.0)),   # blue, sector 4
        ((60.0, 1.0, 1.0), (1.0, 1.0, 0.0)),    # yellow, sector 1
        ((300.0, 1.0, 1.0), (1.0, 0.0, 1.0)),   # magenta, sector 5
        ((360.0, 1.0, 1.0), (1.0, 0.0, 0.0)),   # wrap -> sector 0
        ((123.0, 0.0, 0.7), (0.7, 0.7, 0.7)),   # s<=0 -> grey
        ((90.0, 0.5, 0.8), (0.6, 0.8, 0.4)),    # mid-sector interp
    ]
    hs = np.array([c[0][0] for c in cases], np.float32)
    ss = np.array([c[0][1] for c in cases], np.float32)
    vs = np.array([c[0][2] for c in cases], np.float32)
    got = np.asarray(hsv2rgb(hs, ss, vs))
    want = np.array([c[1] for c in cases], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)
