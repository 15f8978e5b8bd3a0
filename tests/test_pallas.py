"""Pallas dense-sweep kernel vs the XLA sweep (interpret mode on CPU).
The compiled Mosaic path is selected with
RenderConfig(dense_engine="pallas") and only engages on TPU backends;
everywhere else it degrades to the bit-exact "exact" sweep
(intersect._pallas_available)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject addopts)

from tpurt.render import intersect as I
from tpurt.render.pallas_kernels import mt_sweep_pallas, pad_tri_rows
from tpurt.scene import procedural


@pytest.mark.parametrize("cull", [True, False])
def test_pallas_sweep_matches_xla(cull):
    pos, nrm = procedural.icosphere(2, radius=50.0)
    tri_rows = np.concatenate(
        [pos.reshape(-1, 9), nrm.reshape(-1, 9)], 1
    ).astype(np.float32)
    t_count = len(tri_rows)
    rows, flags = pad_tri_rows(tri_rows, np.full(t_count, cull, bool))

    rs = np.random.RandomState(0)
    ro = rs.uniform(-120, 120, (300, 3)).astype(np.float32)
    ro[:, 2] = 120.0
    tgt = rs.uniform(-40, 40, (300, 3)).astype(np.float32)
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    t, idx = mt_sweep_pallas(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(rows),
        jnp.asarray(flags), t_count, interpret=True,
    )

    class S:
        pass

    s = S()
    s.tri_pos_a, s.tri_pos_b, s.tri_pos_c = (
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2])
    )
    s.tri_nrm_a, s.tri_nrm_b, s.tri_nrm_c = (
        jnp.asarray(nrm[:, 0]), jnp.asarray(nrm[:, 1]), jnp.asarray(nrm[:, 2])
    )
    lb = I._bruteforce_range(
        s, jnp.asarray(ro), jnp.asarray(rd), 0, t_count, jnp.asarray(cull)
    )
    np.testing.assert_array_equal(np.asarray(lb.tri), np.asarray(idx))
    hit = np.asarray(idx) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(
        np.asarray(t)[hit], np.asarray(lb.t)[hit], rtol=1e-4
    )
