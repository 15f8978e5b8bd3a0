"""Probe r52 (TPU): WHAT binds the dense sweep at ~60 ms / 0.94 Gpairs
(r51: five structural variants all land within 10%)?

Legs on the r51 'inv' structure (tris outer, aliased accumulators,
unpadded feats), each stripping part of the per-block work:
  dotonly   4 dots + min(t_num) fold only (no division, no accepts)
  nodiv     dots + accepts in MULTIPLY form (sign-weighted, no 1/det)
            + min fold on t_num*s (NOT the real semantics — pricing
            the reciprocal+where chain, not proposing this fold)
  full      the r51 inv leg (anchor semantics)
Also prints mismatch stats of full-vs-shipped (r51 saw bitwise=False:
is the aliased accumulate broken, or is it ulp-level dot drift?).
MXU floor for reference: ~12 ms at K128 on these shapes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

R = 131072
TPAD = 7168
RB = 256
TC = 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    lo = tuple(jax.random.normal(ks[i], (R,), jnp.float32) for i in range(3))
    ld = tuple(jax.random.normal(ks[3 + i], (R,), jnp.float32)
               for i in range(3))
    coeffs = jax.random.normal(ks[6], (4, 128, TPAD), jnp.float32)
    ids = jnp.ones((1, TPAD), jnp.int32)
    entry = jnp.zeros((1, TPAD), jnp.int32)
    cull = jnp.zeros((1, TPAD), jnp.float32)
    orient = jnp.ones((1, TPAD), jnp.float32)
    lane_entry = jnp.zeros((R,), jnp.int32)
    # Shipped-kernel epsilon (tpurt.config.EPSILON): the probe's
    # accept tests must match plucker_fused._sweep_kernel exactly
    # or the full-vs-shipped diff legs confound eps-window accepts
    # with dot accumulation-order flips (advisor round-3 finding).
    from tpurt.config import EPSILON
    eps = np.float32(EPSILON)

    def timeit(label, fn, args, reps=6):
        try:
            f = jax.jit(fn)
            for _ in range(2):
                out = f(*args)
                jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        except Exception as e:
            print(f"[{label}] FAILED: {str(e)[:160]}", flush=True)
            return None, None
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"[{label}] {best*1e3:.2f} ms -> {R*TPAD/best/1e9:.1f} "
              f"Gpairs/s", flush=True)
        return best, f

    nch = TPAD // TC

    def make(mode):
        def kernel(feats_ref, le_ref, c_ref, ids_ref, ent_ref, cull_ref,
                   or_ref, tin_ref, cin_ref, t_ref, col_ref):
            j = pl.program_id(0)
            fr = feats_ref[...]
            feats = jnp.concatenate(
                [fr, jnp.zeros((RB, 112), jnp.float32)], axis=1)
            det = jnp.dot(feats, c_ref[0], preferred_element_type=jnp.float32)
            u_num = jnp.dot(feats, c_ref[1],
                            preferred_element_type=jnp.float32)
            v_num = jnp.dot(feats, c_ref[2],
                            preferred_element_type=jnp.float32)
            t_num = jnp.dot(feats, c_ref[3],
                            preferred_element_type=jnp.float32)
            big = jnp.int32(2 ** 30)
            if mode == "dotonly":
                t = t_num + det + u_num + v_num
                t_min = jnp.min(t, axis=1, keepdims=True)
                col_min = jnp.full((RB, 1), 1, jnp.int32)
            elif mode == "nodiv":
                s = jnp.where(det >= 0.0, 1.0, -1.0)
                ad = det * s
                un = u_num * s
                vn = v_num * s
                tn = t_num * s
                ok = ad >= eps
                ok &= (un >= 0.0) & (un <= ad)
                ok &= (vn >= 0.0) & (un + vn <= ad)
                ok &= tn > eps * ad
                ok &= ids_ref[...] >= 0
                ok &= ent_ref[...] == le_ref[...]
                backface = det * or_ref[...] < 0.0
                ok &= ~((cull_ref[...] != 0.0) & backface)
                t = jnp.where(ok, tn, np.float32(np.inf))
                t_min = jnp.min(t, axis=1, keepdims=True)
                col_iota = (jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
                            + j * jnp.int32(TC))
                col_min = jnp.min(
                    jnp.where((t == t_min) & ok,
                              jnp.broadcast_to(col_iota, t.shape), big),
                    axis=1, keepdims=True)
            else:  # full
                f = 1.0 / det
                u = f * u_num
                v = f * v_num
                t = f * t_num
                ok = jnp.abs(det) >= eps
                ok &= (u >= 0.0) & (u <= 1.0)
                ok &= (v >= 0.0) & (u + v <= 1.0)
                ok &= t > eps
                ok &= ids_ref[...] >= 0
                ok &= ent_ref[...] == le_ref[...]
                backface = det * or_ref[...] < 0.0
                ok &= ~((cull_ref[...] != 0.0) & backface)
                t = jnp.where(ok, t, np.float32(np.inf))
                t_min = jnp.min(t, axis=1, keepdims=True)
                col_iota = (jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
                            + j * jnp.int32(TC))
                col_min = jnp.min(
                    jnp.where((t == t_min) & ok,
                              jnp.broadcast_to(col_iota, t.shape), big),
                    axis=1, keepdims=True)
            t_prev = tin_ref[...]
            c_prev = cin_ref[...]
            closer = (t_min < t_prev) & (col_min < big)
            t_ref[...] = jnp.where(closer, t_min, t_prev)
            col_ref[...] = jnp.where(closer, col_min, c_prev)

        call = pl.pallas_call(
            kernel,
            grid=(nch, R // RB),
            in_specs=[
                pl.BlockSpec((RB, 16), lambda j, i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((4, 128, TC), lambda j, i: (0, 0, j)),
                pl.BlockSpec((1, TC), lambda j, i: (0, j)),
                pl.BlockSpec((1, TC), lambda j, i: (0, j)),
                pl.BlockSpec((1, TC), lambda j, i: (0, j)),
                pl.BlockSpec((1, TC), lambda j, i: (0, j)),
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, 1), jnp.int32),
            ],
            input_output_aliases={7: 0, 8: 1},
        )

        def run(lox, loy, loz, ldx, ldy, ldz, le):
            one = jnp.ones((R,), jnp.float32)
            wx = ldy * loz - ldz * loy
            wy = ldz * lox - ldx * loz
            wz = ldx * loy - ldy * lox
            feats = jnp.stack(
                [ldx, ldy, ldz, wx, wy, wz, lox, loy, loz, one], axis=1)
            feats = jnp.pad(feats, ((0, 0), (0, 6)))
            t0 = jnp.full((R, 1), np.float32(np.inf), jnp.float32)
            c0 = jnp.full((R, 1), -1, jnp.int32)
            t_out, col_out = call(
                feats, le.reshape(R, 1), coeffs, ids, entry, cull, orient,
                t0, c0)
            return t_out[:, 0], col_out[:, 0]

        return run

    for mode in ("dotonly", "nodiv", "full"):
        best, f = timeit(mode, make(mode), (*lo, *ld, lane_entry))
        if mode == "full" and f is not None:
            from tpurt.render.plucker_fused import (FusedDenseTable,
                                                    sweep_entry_local)

            class V3:
                def __init__(s, x, y, z):
                    s.x, s.y, s.z = x, y, z

            table = FusedDenseTable(coeffs=coeffs, ids=ids, owner=entry,
                                    entry=entry, cull=cull, orient=orient,
                                    count=TPAD)
            ta, ca = (np.asarray(x) for x in jax.jit(
                lambda *a: sweep_entry_local(V3(*a[:3]), V3(*a[3:6]), a[6],
                                             table, interpret=False)
            )(*lo, *ld, lane_entry))
            tv, cv = (np.asarray(x) for x in f(*lo, *ld, lane_entry))
            nt = int((ta != tv).sum())
            nc = int((ca != cv).sum())
            both = np.isfinite(ta) & np.isfinite(tv)
            md = float(np.max(np.abs(ta[both] - tv[both]))) if both.any() \
                else 0.0
            print(f"[diff] t mismatches {nt}/{R} col {nc}/{R} "
                  f"max|dt|={md:.3e}", flush=True)


if __name__ == "__main__":
    main()
