"""Probe: Pallas megakernel body vs XLA body on the TPU.

Compares numerics (radiance) and speed on bunny flat batches."""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.render.renderer import render_batch_flat

    base = RenderConfig(
        width=1920, height=1080, rays_per_pixel=8, max_bounces=4,
        tile_size=256, compaction_threshold=0,
    )
    scene, cam = build_scene("bunny", base)
    scene = jax.device_put(scene)

    def run(tag, cfg, starts):
        m, s, it = render_batch_flat(scene, cam, cfg, starts[0])
        np.asarray(m)  # warm
        t0 = time.perf_counter()
        segs = 0.0
        iters = 0
        outs = []
        for st in starts:
            m, s, it = render_batch_flat(scene, cam, cfg, st)
            segs += float(s)
            iters += int(it) if it is not None else 0
            outs.append(np.asarray(m))
        dt = time.perf_counter() - t0
        msg = (f"[{tag}] {dt:.3f}s {segs/1e6:.2f}M segs "
               f"=> {segs/dt/1e6:.2f} Mseg/s")
        if iters:
            msg += f" | {iters} iters {dt/iters*1e6:.0f} us/iter"
        print(msg, file=sys.stderr)
        return outs

    b = base.rays_per_batch
    # mid-frame batches (bunny-heavy)
    starts = [3 * b, 4 * b]
    out_x = run("xla   262k", base, starts)
    out_p = run("pallas 262k", base.replace(mega_body="pallas"), starts)
    for ox, op in zip(out_x, out_p):
        close = np.allclose(ox, op, rtol=2e-5, atol=2e-6)
        exact = np.array_equal(ox, op)
        frac = np.mean(np.abs(ox - op) > (2e-5 * np.abs(ox) + 2e-6))
        print(f"batch: exact={exact} allclose={close} "
              f"frac_diff={frac:.2e}", file=sys.stderr)


if __name__ == "__main__":
    main()
