"""Probe: decompose the megakernel body cost at fixed lane count.

Times while_loops of increasing body complexity against the real bunny
row bank: gather only, +transpose, +leaf MT slots, +node slots,
+static stage, +shade. Each runs a fixed iteration count so us/iter is
exact. Run on the TPU to find where the milliseconds live."""

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
    from tpurt.render.shading import shade_hit_soa

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
    lid = V3(1.0 / rd.x, 1.0 / rd.y, 1.0 / rd.z)
    pix = (ys.astype(jnp.uint32) * np.uint32(1920) + xs.astype(jnp.uint32))

    params = M._chain_params(scene)
    e_count = len(scene.mega_chain)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # warm
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        dt = time.perf_counter() - t0
        print(f"[{name:28s}] {dt*1e3:8.1f} ms total, "
              f"{dt/ITERS*1e6:8.0f} us/iter", file=sys.stderr)

    idx0 = (pix.astype(jnp.int32) * 7919) % n_rows

    # (a) gather only: dependent-chain row fetch, checksum column feeds idx
    @jax.jit
    def gather_only(idx):
        def body(c):
            i, idx, acc = c
            row = rows[idx]  # (R, W)
            nxt = (lax.bitcast_convert_type(row[:, 9], jnp.int32) + idx + 1) % n_rows
            return i + 1, nxt, acc + row[:, 0]
        return lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(0), idx, jnp.zeros((R,), jnp.float32)))

    # (b) gather + transpose
    @jax.jit
    def gather_t(idx):
        def body(c):
            i, idx, acc = c
            rowt = rows[idx].T  # (W, R)
            nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
            return i + 1, nxt, acc + rowt[0]
        return lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(0), idx, jnp.zeros((R,), jnp.float32)))

    # (c) gather + transpose + 8 leaf MTs
    @jax.jit
    def gather_leaf(idx):
        def body(c):
            i, idx, lt = c
            rowt = rows[idx].T
            lt2 = lt
            for k in range(M.MEGA_LEAF_TRIS):
                ok, t, n, bf, aux = M._mt_inline(ro, rd, rowt, 19 * k,
                                                 jnp.asarray(True))
                win = ok & (t < lt2)
                lt2 = jnp.where(win, t, lt2)
            nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + 1) % n_rows
            return i + 1, nxt, lt2
        return lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(0), idx, jnp.full((R,), np.inf, jnp.float32)))

    # (d) gather + transpose + 16 node slots
    @jax.jit
    def gather_nodes(idx):
        def body(c):
            i, idx, acc = c
            rowt = rows[idx].T
            grid_o = M._col_v3(rowt, 0)
            grid_s = M._col_v3(rowt, 3)
            best = jnp.full((R,), M.MEGA_ARITY, jnp.int32)
            m8 = np.uint32(0xFF)
            for slot in range(M.MEGA_ARITY):
                base = 7 + 3 * slot
                w0 = lax.bitcast_convert_type(rowt[base], jnp.uint32)
                w1 = lax.bitcast_convert_type(rowt[base + 1], jnp.uint32)
                q_lo = V3((w0 & m8).astype(jnp.float32),
                          ((w0 >> np.uint32(8)) & m8).astype(jnp.float32),
                          ((w0 >> np.uint32(16)) & m8).astype(jnp.float32))
                q_hi = V3(((w0 >> np.uint32(24)) & m8).astype(jnp.float32),
                          (w1 & m8).astype(jnp.float32),
                          ((w1 >> np.uint32(8)) & m8).astype(jnp.float32))
                bmin = grid_o + q_lo * grid_s
                bmax = grid_o + q_hi * grid_s
                hit, _ = M._aabb_soa(ro, lid, bmin, bmax, acc)
                best = jnp.where(hit & (slot < best), slot, best)
            nxt = (lax.bitcast_convert_type(rowt[9], jnp.int32) + idx + best + 1) % n_rows
            return i + 1, nxt, acc
        return lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(0), idx, jnp.full((R,), np.inf, jnp.float32)))

    # (e) static stage alone (no gather)
    @jax.jit
    def static_only():
        def body(c):
            i, o = c
            sv, sd, sp, sn, sb, sm = M._static_stage(
                scene, jnp.ones((R,), bool), o, rd)
            return i + 1, V3(o.x + sd * 0.0, o.y, o.z)
        return lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), ro))

    # (f) shade alone (no gather)
    @jax.jit
    def shade_only():
        rng0 = pix
        tp = V3(*(jnp.ones((R,), jnp.float32),) * 3)
        def body(c):
            i, rng, light = c
            res = shade_hit_soa(
                scene, jnp.ones((R,), bool), jnp.ones((R,), bool),
                ro, rd, jnp.zeros((R,), bool),
                (pix % np.uint32(8)).astype(jnp.int32),
                ro, rd, tp, light, rng,
                jnp.zeros((R,), jnp.int32), 4)
            return i + 1, res.rng, res.light
        z = V3(*(jnp.zeros((R,), jnp.float32),) * 3)
        return lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), rng0, z))

    # (g) enter (WorldToLocalRay + pretest) alone
    @jax.jit
    def enter_only():
        def body(c):
            i, acc = c
            lo2, ld2, lid2, root2, leaf2 = M._enter(
                params, e_count, jnp.zeros((R,), jnp.int32), ro, rd)
            ok = M._pretest(params, e_count, jnp.zeros((R,), jnp.int32),
                            lo2, lid2, acc)
            return i + 1, acc + ok.astype(jnp.float32)
        return lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(0), jnp.full((R,), 1e9, jnp.float32)))

    timed("gather only", gather_only, idx0)
    timed("gather + transpose", gather_t, idx0)
    timed("gather + T + 8 leaf MT", gather_leaf, idx0)
    timed("gather + T + 16 node slots", gather_nodes, idx0)
    timed("static stage (14 tris)", static_only)
    timed("shade step", shade_only)
    timed("enter + pretest", enter_only)


if __name__ == "__main__":
    main()
