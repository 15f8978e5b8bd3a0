"""Probe r74 (TPU): the many-instance cliff through the TLAS.

Round-4 measured the cliff (probe r62): K=8 select regime 33.1 Mrays/s,
K=64 gather regime FAULTS the axon worker, K=64 select fallback 3.4
Mrays/s (O(K) chains). Round 5's TLAS makes entries DATA — instance
rows + a world-space top-level BVH in the same narrow bank — so the
chain is O(1) entries at any K. Legs (same grid scene as r62):

  K=8  unrolled     threshold kept above K: the shipped small-K path
                    (select chains + Pallas) — must be unchanged
  K=8  TLAS         threshold forced below: TLAS price at small K
  K=24 TLAS         Pallas body (31 meshes <= gather threshold)
  K=64 TLAS         the cliff row (XLA body: 71 meshes force it for
                    the shade-time material fetches) — target >= 20
  K=64 TLAS @230k   the lane count that FAULTED the gather-regime
                    worker (r62) — must run
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

    import tpurt.config as _c
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

    cfg = RenderConfig(width=640, height=360, rays_per_pixel=4,
                       max_bounces=4, tile_size=256, seed_mode="reference",
                       rays_per_batch=57600, pixels_per_lane=4,
                       mega_interleave=1, mega_tail_passes=3,
                       compaction_threshold=0)
    cam = Camera.create(position=(0.0, 150.0, 380.0), pitch=-0.1,
                        yaw=np.pi, roll=0.0, fov_degrees=90.0,
                        aspect_ratio=640.0 / 360.0)

    def leg(label, k, tlas_threshold, leg_cfg=None):
        _c.MEGA_TLAS_THRESHOLD = tlas_threshold
        c = leg_cfg or cfg
        scene = grid_scene(k)
        print(f"[{label}] meshes={scene.num_meshes} "
              f"tris={scene.num_triangles} chain={len(scene.mega_chain)} "
              f"tlas={scene.mega_tlas}", flush=True)

        def block():
            seg_d = None
            for f in range(FRAMES):
                m, s, _ = render_batch_flat(scene, cam, c, 0,
                                            frame_index=f)
                seg_d = s if seg_d is None else _add_dev(seg_d, s)
            return seg_d

        try:
            for _ in range(2):
                segs = float(np.asarray(block()))
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:200]}", flush=True)
            _c.MEGA_TLAS_THRESHOLD = 8
            return
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            segs = float(np.asarray(block()))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[{label}] {best/FRAMES*1e3:.1f} ms/frame  "
              f"{segs/best/1e6:.1f} Mrays/s", flush=True)
        _c.MEGA_TLAS_THRESHOLD = 8

    leg("K=8 unrolled (ship small-K)", 8, 64)
    leg("K=8 TLAS", 8, 4)
    leg("K=24 TLAS (pallas)", 24, 8)
    leg("K=64 TLAS", 64, 8)
    leg("K=64 TLAS 230k lanes", 64, 8,
        cfg.replace(width=1280, height=720, rays_per_batch=230400))


if __name__ == "__main__":
    main()
