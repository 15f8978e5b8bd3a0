"""BVH structural invariants and traversal == brute force."""

import numpy as np
import jax.numpy as jnp

from tpurt.accel.bvh import BVHNodes, build_bvh, bvh_stats, thread_links, validate_bvh
from tpurt.scene import procedural
from tpurt.scene.builder import SceneBuilder
from tpurt.render import intersect as I


def _built(pos, nrm):
    nodes = BVHNodes.empty()
    tri_pos = pos.copy()
    tri_nrm = nrm.copy()
    root = build_bvh(nodes, tri_pos, tri_nrm, 0, len(pos), 64)
    return nodes, tri_pos, tri_nrm, root


def test_invariants_icosphere():
    pos, nrm = procedural.icosphere(3)  # 1280 tris
    nodes, tri_pos, _, root = _built(pos, nrm)
    validate_bvh(nodes, root, 0, len(pos), tri_pos)
    stats = bvh_stats(nodes, root)
    assert stats["leaf_count"] > 100
    assert stats["max_depth"] <= 64
    assert stats["avg_tris_per_leaf"] <= 8


def test_invariants_torus_knot():
    pos, nrm = procedural.torus_knot(segments=64, sides=8)
    nodes, tri_pos, _, root = _built(pos, nrm)
    validate_bvh(nodes, root, 0, len(pos), tri_pos)


def test_two_triangles_never_split():
    pos, nrm = procedural.box()
    nodes, tri_pos, _, root = _built(pos[:2], nrm[:2])
    assert len(nodes) == 1
    assert nodes.ntris[root] == 2
    assert nodes.child[root] == 0


def test_thread_links_cover_subtree():
    pos, nrm = procedural.icosphere(2)
    nodes, _, _, root = _built(pos, nrm)
    _, _, child, _, ntris = nodes.as_arrays()
    hit, miss = thread_links(child, ntris, [root])
    # Walking the "always hit" thread must visit every node exactly once.
    visited = []
    cur = root
    while cur != -1:
        visited.append(cur)
        cur = int(hit[cur]) if ntris[cur] == 0 else int(miss[cur])
    assert sorted(visited) == list(range(len(nodes)))


def test_traversal_matches_bruteforce():
    """The stackless walk must find exactly the hits the dense sweep
    finds (BVH can change speed, never results)."""
    pos, nrm = procedural.icosphere(2, radius=50.0)
    b = SceneBuilder()
    h = b.add_triangles(pos, nrm)
    b.add_mesh(h)
    scene = b.freeze()

    rs = np.random.RandomState(0)
    ro_np = rs.uniform(-120, 120, (256, 3)).astype(np.float32)
    ro_np[:, 2] = 120.0  # park origins outside the sphere
    target = rs.uniform(-60, 60, (256, 3)).astype(np.float32)  # aim inward
    rd_np = target - ro_np
    rd_np /= np.linalg.norm(rd_np, axis=1, keepdims=True)
    ro, rd = jnp.asarray(ro_np), jnp.asarray(rd_np)

    cull = jnp.asarray(True)
    bf = I._bruteforce_range(scene, ro, rd, 0, scene.num_triangles, cull)
    tv = I._bvh_traverse(
        scene, scene.mesh_root[0], ro, rd, cull, scene.max_leaf_tris,
        qmin=scene.mesh_qmin[0], qscale=scene.mesh_qscale[0],
    )
    np.testing.assert_array_equal(np.asarray(bf.tri), np.asarray(tv.tri))
    hit = np.asarray(bf.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(bf.t)[hit], np.asarray(tv.t)[hit], rtol=1e-4, atol=1e-4
    )
    assert hit.sum() > 50  # the test actually exercised hits
