"""PRNG parity: the jnp uint32 generators must match the scalar oracle
(exact integer transcription of src/Trace.cl:158-217) bit for bit."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpurt.core import rng


def test_make_seed_exact():
    pix = np.array([0, 1, 17, 511, 262143, 2**31, 2**32 - 1], np.uint32)
    for frame in [0, 1, 7, 123456]:
        for ray in [0, 1, 99]:
            got = np.asarray(rng.make_seed(jnp.asarray(pix), frame, ray))
            want = np.array(
                [oracle.make_seed(int(p), frame, ray) for p in pix], np.uint32
            )
            np.testing.assert_array_equal(got, want)


def test_random_value_stream_exact():
    seeds = [1, 42, 0xDEADBEEF, 0xFFFFFFFF, 12345]
    state = jnp.asarray(np.array(seeds, np.uint32))
    py_state = list(seeds)
    for _ in range(100):
        state, val = rng.random_value(state)
        expected_states, expected_vals = [], []
        for i, s in enumerate(py_state):
            s2, v = oracle.random_value(s)
            expected_states.append(s2)
            expected_vals.append(v)
        py_state = expected_states
        np.testing.assert_array_equal(np.asarray(state), np.array(py_state, np.uint32))
        np.testing.assert_array_equal(
            np.asarray(val), np.array(expected_vals, np.float32)
        )


def test_rand01_stream_exact():
    state = jnp.asarray(np.array([7, 1 << 20, 0xABCDEF], np.uint32))
    py = [7, 1 << 20, 0xABCDEF]
    for _ in range(50):
        state, val = rng.rand01(state)
        out = [oracle.rand01(s) for s in py]
        py = [o[0] for o in out]
        np.testing.assert_array_equal(np.asarray(state), np.array(py, np.uint32))
        np.testing.assert_array_equal(
            np.asarray(val), np.array([o[1] for o in out], np.float32)
        )


def test_random_normal_matches_oracle():
    state = jnp.asarray(np.array([99, 1234567], np.uint32))
    py = [99, 1234567]
    for _ in range(20):
        state, val = rng.random_normal(state)
        out = [oracle.random_normal(s) for s in py]
        py = [o[0] for o in out]
        np.testing.assert_array_equal(np.asarray(state), np.array(py, np.uint32))
        np.testing.assert_allclose(
            np.asarray(val), np.array([o[1] for o in out], np.float32),
            rtol=1e-6, atol=1e-7,
        )


def test_random_direction_matches_oracle_and_is_unit():
    state = jnp.asarray(np.array([3, 77, 99999], np.uint32))
    py = [3, 77, 99999]
    for _ in range(20):
        state, d = rng.random_direction(state)
        out = [oracle.random_direction(s) for s in py]
        py = [o[0] for o in out]
        np.testing.assert_array_equal(np.asarray(state), np.array(py, np.uint32))
        np.testing.assert_allclose(
            np.asarray(d), np.stack([o[1] for o in out]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5
        )


def test_masked_draws_freeze_masked_lanes():
    state = jnp.asarray(np.array([5, 5, 5, 5], np.uint32))
    mask = jnp.asarray([True, False, True, False])
    new_state, _ = rng.random_value_masked(state, mask)
    ns = np.asarray(new_state)
    assert ns[0] == ns[2] and ns[1] == 5 and ns[3] == 5 and ns[0] != 5
    # 6 draws for a direction: masked lanes must be untouched too.
    new_state, _ = rng.random_direction_masked(state, mask)
    ns = np.asarray(new_state)
    assert ns[1] == 5 and ns[3] == 5 and ns[0] == ns[2] != 5


def test_unit_float_mapping_edge_cases():
    # (s+1)/2^32; the reference's wrap quirk maps 0xFFFFFFFF -> 0.
    s = jnp.asarray(np.array([0, 1, 0x80000000, 0xFFFFFFFF], np.uint32))
    got = np.asarray(rng.u32_to_unit_float(s))
    want = np.array(
        [1 / 2**32, 2 / 2**32, np.float32(0x80000001) / 2**32, 0.0], np.float32
    )
    np.testing.assert_array_equal(got, want)


def test_distribution_sanity():
    # RandomValue over many draws should be ~uniform on (0,1).
    state = jnp.asarray(np.arange(1, 4097, dtype=np.uint32))
    vals = []
    for _ in range(16):
        state, v = rng.random_value(state)
        vals.append(np.asarray(v))
    v = np.concatenate(vals)
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 0.01
    assert abs(np.var(v) - 1 / 12) < 0.005
