"""Probe: megakernel iteration count + per-iteration cost on the bunny
scene (the BENCH headline config). Prints rows/segment and ms/iteration
— the currency breakdown VERDICT.md asks the bench to report."""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import _render_tile_impl

    cfg = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, object_path="bunny", bruteforce_threshold=4096,
        compaction_threshold=0,  # plain single-stage for clean iters
    )
    scene, cam = build_scene("bunny", cfg)
    scene = jax.device_put(scene)
    print(f"tris={scene.num_triangles} mega_rows={scene.mega_rows.shape}",
          file=sys.stderr)

    def run(x0, y0):
        out, segs = _render_tile_impl(
            scene, cam, jnp.asarray([x0, y0, 0, 0], jnp.int32),
            tile_h=256, tile_w=256, width=cfg.width, height=cfg.height,
            rays_per_pixel=cfg.rays_per_pixel, max_bounces=cfg.max_bounces,
            seed_mode=cfg.seed_mode, invisible_budget=cfg.invisible_budget,
            bruteforce_threshold=cfg.bruteforce_threshold,
            subpixel_jitter=cfg.subpixel_jitter, engine=cfg.engine,
        )
        return out, segs

    # _render_tile_impl returns (tile, segs); iters are inside
    # run_megakernel — re-jit a variant that returns them.
    import functools
    from tpurt.core.camera import make_ray, pixel_uv
    from tpurt.render.renderer import _tile_pixel_coords
    from tpurt.render.megakernel import run_megakernel

    @functools.partial(jax.jit, static_argnames=())
    def run_iters(coords):
        x0, y0 = coords[0], coords[1]
        xs, ys = _tile_pixel_coords(256, 256, x0, y0)
        pix = ys.astype(jnp.uint32) * jnp.uint32(cfg.width) + xs.astype(jnp.uint32)
        uv = pixel_uv(xs, ys, cfg.width, cfg.height)
        ro0, rd0 = make_ray(cam, uv)
        mean, segs, iters = run_megakernel(
            scene, ro0, rd0, pix, coords[2],
            rays_per_pixel=cfg.rays_per_pixel, max_bounces=cfg.max_bounces,
            seed_mode=cfg.seed_mode, invisible_budget=cfg.invisible_budget,
            sample_offset=coords[3], subpixel_jitter=False,
            camera=cam, width=cfg.width, height=cfg.height,
        )
        return jnp.sum(mean), segs, iters

    R = 256 * 256
    tot_segs = tot_iters = tot_time = 0.0
    for (tx, ty) in [(3, 2), (1, 1), (0, 0), (5, 3)]:
        coords = jax.device_put(
            np.asarray([tx * 256, ty * 256, 0, 0], np.int32))
        run_iters(coords)  # warm
        t0 = time.perf_counter()
        s, segs, iters = run_iters(coords)
        segs = float(segs); iters = int(iters); np.asarray(s)
        dt = time.perf_counter() - t0
        tot_segs += segs; tot_iters += iters; tot_time += dt
        print(f"tile ({tx},{ty}): {iters} iters, {segs:.0f} segs, "
              f"{dt*1e3:.1f} ms -> {dt/iters*1e6:.0f} us/iter, "
              f"{iters*R/segs:.1f} rows/seg, {segs/dt/1e6:.2f} Mseg/s")
    print(f"TOTAL: {tot_iters} iters {tot_time*1e3:.0f} ms "
          f"{tot_iters*R/tot_segs:.1f} rows/seg "
          f"{tot_segs/tot_time/1e6:.2f} Mseg/s")


if __name__ == "__main__":
    main()
