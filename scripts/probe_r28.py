"""Probe r28: root expansion A/B — bitwise output + iteration counts.

CPU (--cpu): renders a small sphere scene and the 512x288 bunny-class
scene with MEGA_ROOT_EXPAND on/off through BOTH engines' paths
(plain megakernel XLA body) and asserts bitwise-identical radiance,
reporting the iteration delta. On TPU: times the staged headline A/B.
"""

import sys
import time

import numpy as np


def render_once(scene, cam, cfg, w, h, p=4):
    import functools

    import jax
    import jax.numpy as jnp

    from tpurt.core.camera import make_ray, pixel_uv
    from tpurt.render.renderer import _flat_coords

    b = (w * h) // p

    @functools.partial(jax.jit, static_argnames=("batch",))
    def run(scene, camera, coords, *, batch):
        from tpurt.render.megakernel import run_megakernel

        xs, ys, pix = _flat_coords(coords, batch, w, h)
        uv = pixel_uv(xs, ys, w, h)
        ro0, rd0 = make_ray(camera, uv)
        return run_megakernel(
            scene, ro0, rd0, pix, coords[1], sample_offset=coords[2],
            camera=camera, width=w, height=h,
            rays_per_pixel=cfg.rays_per_pixel, max_bounces=cfg.max_bounces,
            seed_mode=cfg.seed_mode, invisible_budget=cfg.invisible_budget,
            subpixel_jitter=False, body_backend="xla",
            pixels_per_lane=p,
        )

    coords = jnp.asarray([0, 0, 0], jnp.int32)
    mean, segs, iters = run(scene, cam, coords, batch=b)
    return np.asarray(mean), float(segs), int(iters)


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")
    import tpurt.config as tc
    from bench import build_scene
    from tpurt.config import RenderConfig

    for kind, w, h in (("sphere", 256, 128), ("bunny", 512, 288)):
        cfg = RenderConfig(width=w, height=h, rays_per_pixel=4,
                           max_bounces=4)
        scene, cam = build_scene(kind, cfg)
        scene = jax.device_put(scene)

        tc.MEGA_ROOT_EXPAND = False
        jax.clear_caches()
        t0 = time.perf_counter()
        m_off, s_off, it_off = render_once(scene, cam, cfg, w, h)
        t_off = time.perf_counter() - t0

        tc.MEGA_ROOT_EXPAND = True
        jax.clear_caches()
        t0 = time.perf_counter()
        m_on, s_on, it_on = render_once(scene, cam, cfg, w, h)
        t_on = time.perf_counter() - t0

        same = np.array_equal(m_off, m_on)
        print(f"[{kind} {w}x{h}] bitwise={same} segs {s_off:.0f}/{s_on:.0f} "
              f"iters {it_off} -> {it_on} "
              f"({100.0 * (it_off - it_on) / max(it_off, 1):.1f}% fewer)")
        if not same:
            d = np.abs(m_off - m_on)
            print(f"  maxdiff={d.max()} at {np.unravel_index(d.argmax(), d.shape)}"
                  f" ndiff={(d > 0).sum()}")
        assert s_off == s_on, "segment counts must match"


if __name__ == "__main__":
    main()
