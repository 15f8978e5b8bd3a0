"""OBJ parser semantics (src/readobj.hpp:270-344) and builder cache."""

import numpy as np

from tpurt.scene.builder import SceneBuilder
from tpurt.scene.obj import parse_obj, write_obj, load_obj

TRI_OBJ = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
"""

VTN_OBJ = """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
"""


def test_parse_v_double_slash_n():
    pos, nrm = parse_obj(TRI_OBJ)
    assert pos.shape == (1, 3, 3)
    np.testing.assert_allclose(pos[0, 1], [1, 0, 0])
    np.testing.assert_allclose(nrm[0], [[0, 0, 1]] * 3)


def test_parse_v_t_n():
    pos, nrm = parse_obj(VTN_OBJ)
    assert pos.shape == (1, 3, 3)


def test_unsupported_face_skipped_with_warning():
    warnings = []
    pos, _ = parse_obj(
        TRI_OBJ + "\nf 1 2 3\n", warn=warnings.append
    )  # position-only faces are unsupported (readobj.hpp:314-317)
    assert pos.shape == (1, 3, 3)
    assert any("Unsupported face" in w for w in warnings)


def test_out_of_bounds_index_skipped_with_warning():
    warnings = []
    pos, _ = parse_obj(TRI_OBJ + "\nf 1//1 2//1 9//1\n", warn=warnings.append)
    assert pos.shape == (1, 3, 3)  # bad face dropped, good one kept
    assert any("out of bounds" in w for w in warnings)


def test_quad_face_skipped():
    warnings = []
    pos, _ = parse_obj(TRI_OBJ + "\nf 1//1 2//1 3//1 1//1\n", warn=warnings.append)
    assert pos.shape == (1, 3, 3)


def test_write_load_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    pos = rs.randn(5, 3, 3).astype(np.float32)
    nrm = rs.randn(5, 3, 3).astype(np.float32)
    p = tmp_path / "mesh.obj"
    write_obj(str(p), pos, nrm)
    pos2, nrm2 = load_obj(str(p))
    np.testing.assert_allclose(pos2, pos, rtol=1e-6)
    np.testing.assert_allclose(nrm2, nrm, rtol=1e-6)


def test_builder_cache_shares_geometry(tmp_path):
    """Repeat loads return fresh instances over the same triangles
    (fixing the reference's wrong-index cache, readobj.hpp:272-274)."""
    p = tmp_path / "m.obj"
    rs = np.random.RandomState(1)
    write_obj(str(p), rs.randn(4, 3, 3).astype(np.float32),
              rs.randn(4, 3, 3).astype(np.float32))
    b = SceneBuilder()
    h1 = b.load_obj(str(p))
    n_tris = b._num_tris
    h2 = b.load_obj(str(p))
    assert b._num_tris == n_tris  # no duplicate geometry
    assert h1.node_idx == h2.node_idx
    assert h1 is not h2  # independent instances
    h2.pos = (5.0, 0.0, 0.0)
    assert h1.pos != h2.pos
