"""Probe r62 (TPU): the gather-regime (K=64 instances) measured price.

Above SELECT_GATHER_THRESHOLD=24 instances the megakernel switches
per-lane parameter fetches from unrolled select chains to real XLA
gathers and forces the XLA loop body (Mosaic has no dynamic-gather
lowering) — compile-safe by design (tests/test_many_meshes.py), but
round 3 shipped it with only a COST MODEL (0.2-0.35 ms per fetch site
per iteration), never a chip measurement. One row settles it: a
64-instance icosphere grid in a Cornell box at 720p, steady-state,
vs the SAME scene at K=8 (select-chain regime, Pallas body) for scale.

Expectation from the model: the K=64 XLA body pays both the ~3x
XLA-vs-Mosaic body gap and ~4-6 gather sites x ~0.25 ms; usable but
~5-10x off the select-regime rate. The number goes in the notes and
calibrates SELECT_GATHER_THRESHOLD.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 4


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from tpurt.config import RenderConfig
    from tpurt.core.camera import Camera
    from tpurt.render.renderer import _add_dev, render_batch_flat
    from tpurt.scene import procedural
    from tpurt.scene.builder import Material, SceneBuilder
    from tpurt.scene.types import MaterialType

    def grid_scene(k):
        b = SceneBuilder()
        pos, nrm = procedural.icosphere(1, radius=10.0)
        proto = b.add_triangles(pos, nrm)
        proto.material = Material(type=MaterialType.SOLID,
                                  color=(1.0, 1.0, 1.0))
        proto.scale = 0.5
        b.add_cornell_box(proto)
        side = int(np.ceil(np.sqrt(k)))
        for i in range(k):
            h = dataclasses.replace(
                proto,
                pos=(
                    -120.0 + 240.0 * (i % side) / max(side - 1, 1),
                    30.0 + 200.0 * (i // side) / max(side - 1, 1),
                    -40.0 + 10.0 * (i % 3),
                ),
                yaw=0.3 * i,
                scale=0.4 + 0.02 * (i % 5),
                material=Material(type=MaterialType.SOLID,
                                  color=(0.9, 0.5, 0.3),
                                  reflectiveness=0.5,
                                  specular_probability=0.4),
            )
            b.add_mesh(h)
        return b.freeze()

    # 64-instance XLA body at 230k lanes CRASHED the TPU worker on the
    # first run (kernel fault in the worker, not a compile error) —
    # retry at a quarter of the lanes to separate size from regime.
    cfg = RenderConfig(width=640, height=360, rays_per_pixel=4,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       rays_per_batch=57600, pixels_per_lane=4,
                       mega_interleave=1, mega_tail_passes=3,
                       compaction_threshold=0)
    cam = Camera.create(position=(0.0, 150.0, 380.0), pitch=-0.1,
                        yaw=np.pi, roll=0.0, fov_degrees=90.0,
                        aspect_ratio=640.0 / 360.0)

    def leg(label, k):
        scene = grid_scene(k)
        print(f"[{label}] meshes={scene.num_meshes} "
              f"tris={scene.num_triangles} chain={len(scene.mega_chain)}",
              flush=True)

        def block():
            seg_d = None
            for f in range(FRAMES):
                m, s, _ = render_batch_flat(scene, cam, cfg, 0,
                                            frame_index=f)
                seg_d = s if seg_d is None else _add_dev(seg_d, s)
            return seg_d

        try:
            for _ in range(2):
                segs = float(np.asarray(block()))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:200]}", flush=True)
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            segs = float(np.asarray(block()))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s", flush=True)

    import tpurt.config as _c

    if "--select64" in sys.argv:
        _c.SELECT_GATHER_THRESHOLD = 128
        leg("K=64 SELECT regime (threshold 128)", 64)
        return
    leg("K=8 select regime", 8)
    leg("K=64 gather regime", 64)


if __name__ == "__main__":
    main()

