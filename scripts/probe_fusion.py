"""Probe: does forcing materialisation of the transposed row bank (via
optimization_barrier) fix the column-extract cost inside the loop body?

Variants at fixed lanes/iters:
  g1   gather, 1 column use                      (baseline overhead)
  g1b  gather + barrier, 1 column use
  gt   gather + .T, 1 column use
  gtb  gather + .T + barrier, 1 column use
  mt   gather + .T + 8 leaf MTs                  (the expensive case)
  mtb  gather + .T + barrier + 8 leaf MTs
  mtr  gather (no T) + barrier + 8 leaf MTs on (R,W) slices
  w40  gather of a 40-wide bank + barrier + 2 MTs (width effect)
"""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, "/root/repo")
    from bench import build_scene
    from tpurt.config import RenderConfig
    from tpurt.core import v3 as v3lib
    from tpurt.core.camera import make_ray, pixel_uv
    from tpurt.core.v3 import V3
    from tpurt.render import megakernel as M

    R = int(sys.argv[sys.argv.index("--lanes") + 1]) if "--lanes" in sys.argv else 65536
    ITERS = 64

    cfg = RenderConfig(width=1920, height=1080, rays_per_pixel=8,
                       max_bounces=4, tile_size=256)
    scene, cam = build_scene("bunny", cfg)
    scene = jax.device_put(scene)
    rows = scene.mega_rows
    n_rows = rows.shape[0]
    print(f"rows={rows.shape} R={R} iters={ITERS}", file=sys.stderr)

    xs = jnp.arange(R, dtype=jnp.int32) % 1920
    ys = (jnp.arange(R, dtype=jnp.int32) // 1920) % 1080
    uv = pixel_uv(xs, ys, 1920, 1080)
    ro_r, rd_r = make_ray(cam, uv)
    ro = v3lib.from_rows(ro_r)
    rd = v3lib.from_rows(rd_r)
    idx0 = (xs * 7919 + ys) % n_rows

    def timed(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        dt = time.perf_counter() - t0
        print(f"[{name:34s}] {dt/ITERS*1e6:8.0f} us/iter", file=sys.stderr)

    def loop(body):
        def cond(c):
            return c[0] < ITERS
        return lambda idx: lax.while_loop(
            cond, body, (jnp.int32(0), idx, jnp.zeros((R,), jnp.float32)))

    @jax.jit
    @loop
    def g1(c):
        i, idx, acc = c
        row = rows[idx]
        nxt = (lax.bitcast_convert_type(row[:, 9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + row[:, 0]

    @jax.jit
    @loop
    def g1b(c):
        i, idx, acc = c
        row = lax.optimization_barrier(rows[idx])
        nxt = (lax.bitcast_convert_type(row[:, 9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + row[:, 0]

    @jax.jit
    @loop
    def gt(c):
        i, idx, acc = c
        rowt = rows[idx].T
        nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + rowt[0]

    @jax.jit
    @loop
    def gtb(c):
        i, idx, acc = c
        rowt = lax.optimization_barrier(rows[idx].T)
        nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + rowt[0]

    def leaf_mts(rowt_like, col):
        lt = jnp.full((R,), np.inf, jnp.float32)
        for k in range(M.MEGA_LEAF_TRIS):
            base = 19 * k
            pa = V3(col(base), col(base + 1), col(base + 2))
            pb = V3(col(base + 3), col(base + 4), col(base + 5))
            pc = V3(col(base + 6), col(base + 7), col(base + 8))
            na = V3(col(base + 9), col(base + 10), col(base + 11))
            nb = V3(col(base + 12), col(base + 13), col(base + 14))
            nc = V3(col(base + 15), col(base + 16), col(base + 17))
            ok, t, n, bf = M._mt_core(ro, rd, pa, pb, pc, na, nb, nc,
                                      jnp.asarray(True))
            win = ok & (t < lt)
            lt = jnp.where(win, t, lt)
        return lt

    @jax.jit
    @loop
    def mt(c):
        i, idx, acc = c
        rowt = rows[idx].T
        lt = leaf_mts(rowt, lambda j: rowt[j])
        nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + lt * 0.0

    @jax.jit
    @loop
    def mtb(c):
        i, idx, acc = c
        rowt = lax.optimization_barrier(rows[idx].T)
        lt = leaf_mts(rowt, lambda j: rowt[j])
        nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + lt * 0.0

    @jax.jit
    @loop
    def mtr(c):
        i, idx, acc = c
        row = lax.optimization_barrier(rows[idx])  # (R, W), no transpose
        lt = leaf_mts(row, lambda j: row[:, j])
        nxt = (lax.bitcast_convert_type(row[:, 9], jnp.int32) + idx + 1) % n_rows
        return i + 1, nxt, acc + lt * 0.0

    timed("g1   gather, 1 col", g1, idx0)
    timed("g1b  gather+barrier, 1 col", g1b, idx0)
    timed("gt   gather+T, 1 col", gt, idx0)
    timed("gtb  gather+T+barrier, 1 col", gtb, idx0)
    timed("mt   gather+T, 8 MT", mt, idx0)
    timed("mtb  gather+T+barrier, 8 MT", mtb, idx0)
    timed("mtr  gather+barrier (R,W), 8 MT", mtr, idx0)


if __name__ == "__main__":
    main()
