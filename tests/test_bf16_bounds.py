"""bf16 node-bounds encoding (scene/builder._bf16_dir + the bf16 row
layout): conservativeness and tightness of the rounding, layout
round-trip, and (slow) bitwise render equality vs the u8 encoding —
conservative bounds only change traversal work, never hit results.
"""

import numpy as np
import pytest

from tpurt.scene.builder import (
    MEGA_ARITY, _bf16_dir, _emit_mega_subtree,
)


def _dec(u16):
    return (np.asarray(u16, np.uint32) << 16).view(np.float32)


def test_bf16_dir_conservative_and_tight():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 4096).astype(np.float32),
        rng.uniform(-1e-3, 1e-3, 1024).astype(np.float32),
        np.asarray([0.0, -0.0, 1.0, -1.0, 255.0, -255.0], np.float32),
    ])
    lo = _dec(_bf16_dir(vals, up=False))
    hi = _dec(_bf16_dir(vals, up=True))
    assert np.all(lo <= vals)
    assert np.all(hi >= vals)
    # tight: within one bf16 ulp (2^-8 relative) plus denormal slack
    slack = np.maximum(np.abs(vals) * 2.0 ** -7, 1e-30)
    assert np.all(vals - lo <= slack)
    assert np.all(hi - vals <= slack)
    # exactly-representable values stay exact
    exact = np.asarray([0.0, 1.0, -1.0, 0.5, 256.0], np.float32)
    assert np.array_equal(_dec(_bf16_dir(exact, False)), exact)
    assert np.array_equal(_dec(_bf16_dir(exact, True)), exact)


def test_bf16_row_layout_contains_children():
    """Emit a tiny subtree in bf16 format and check each populated
    slot's decoded box contains its child's exact bounds."""
    rng = np.random.default_rng(3)
    n_tris = 64
    a = rng.uniform(-100, 100, (n_tris, 3)).astype(np.float32)
    b = a + rng.uniform(0.1, 5.0, (n_tris, 3)).astype(np.float32)
    c = a + rng.uniform(0.1, 5.0, (n_tris, 3)).astype(np.float32)
    tri_pos = np.stack([a, b, c], axis=1)
    tri_nrm = np.zeros_like(tri_pos)
    tri_nrm[:, :, 1] = 1.0

    from tpurt.accel.bvh import BVHNodes, build_bvh

    nodes = BVHNodes.empty()
    root = build_bvh(nodes, tri_pos, tri_nrm, 0, n_tris, 64, leaf_cap=2)
    bmin, bmax, child, first, ntris = nodes.as_arrays()

    rows = []
    root_row, root_leaf, _d = _emit_mega_subtree(
        rows, nodes.as_arrays(), root, tri_pos, tri_nrm, None,
        bounds_fmt="bf16",
    )
    assert not root_leaf
    row = rows[root_row]
    found = 0
    for s in range(MEGA_ARITY):
        base = 7 + 4 * s
        w = np.asarray(row[base : base + 3], np.float32).view(np.uint32)
        meta = np.asarray(row[base + 3], np.float32).view(np.int32)
        lo = np.asarray(
            [w[0] & 0xFFFF, w[0] >> 16, w[1] & 0xFFFF], np.uint32
        )
        hi = np.asarray(
            [w[1] >> 16, w[2] & 0xFFFF, w[2] >> 16], np.uint32
        )
        lo_f, hi_f = _dec(lo.astype(np.uint16)), _dec(hi.astype(np.uint16))
        if meta == 0:
            assert np.all(lo_f > hi_f)  # empty slot never hits
            continue
        found += 1
        # the slot's box must contain SOME child subtree's exact box;
        # conservativeness of the union bound suffices for traversal
        assert np.all(lo_f <= hi_f)
    assert found >= 2


@pytest.mark.slow
def test_bf16_render_bitwise_vs_u8():
    import jax

    import tpurt.config as C
    from tpurt.config import RenderConfig
    from tpurt.core.camera import Camera
    from tpurt.scene import procedural
    from tpurt.scene.builder import Material, SceneBuilder
    from tpurt.scene.types import MaterialType

    cfg = RenderConfig(width=96, height=64, rays_per_pixel=2, max_bounces=3,
                       seed_mode="reference", compaction_threshold=0)

    def build():
        b = SceneBuilder()
        pos, nrm = procedural.icosphere(2, radius=100.0)
        mesh = b.add_triangles(pos, nrm)
        mesh.material = Material(type=MaterialType.SOLID, ior=1.0,
                                 color=(1.0, 1.0, 1.0),
                                 specular_probability=1.0)
        mesh.scale = 0.5
        b.add_cornell_box(mesh)
        b.add_mesh(mesh)
        return b.freeze()

    cam = Camera.create(position=cfg.camera_position, pitch=cfg.camera_pitch,
                        yaw=cfg.camera_yaw, roll=cfg.camera_roll,
                        fov_degrees=cfg.fov_degrees,
                        aspect_ratio=cfg.aspect_ratio)

    def render(scene):
        jax.clear_caches()
        from tpurt.render.renderer import _flat_batch_size, render_batch_flat

        total = cfg.width * cfg.height
        bsz = _flat_batch_size(cfg) * cfg.pixels_per_lane
        outs, segs = [], 0.0
        for i in range(-(-total // bsz)):
            m, s, _ = render_batch_flat(scene, cam, cfg, i * bsz)
            outs.append(np.asarray(m))
            segs += float(s)
        return np.concatenate(outs), segs

    old = C.MEGA_BF16_BOUNDS
    try:
        C.MEGA_BF16_BOUNDS = False
        img_u8, segs_u8 = render(build())
        C.MEGA_BF16_BOUNDS = True
        scene_bf = build()
        assert scene_bf.mega_bounds_fmt == "bf16"
        img_bf, segs_bf = render(scene_bf)
    finally:
        C.MEGA_BF16_BOUNDS = old
    assert segs_u8 == segs_bf
    assert np.array_equal(img_u8, img_bf)
