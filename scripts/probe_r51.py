"""Probe r51 (TPU): dense-sweep kernel restructures vs the shipped
plucker_fused kernel (teapot-class shapes: r=131072 rays, tpad=7168).

The shipped kernel's grid is (rays, tris) with TRIS fastest, so the
2 MB coefficient block re-streams per 256-ray block: ~15 GB HBM
traffic per sweep = the whole measured 37 ms/iter (notes, session-5).
Variants:

  anchor   shipped sweep_entry_local on a synthetic table
  inv      grid inverted (tris OUTER, rays inner): each coeff chunk
           loads ONCE (constant index across the inner sweep); the
           running (t, col) fold rides in input_output_aliased (RB,1)
           blocks re-fetched per visit; feats DMA'd UNPADDED (r,16)
           and zero-extended in VMEM (the shipped kernel streams
           128-wide feats that are 88% zero padding)
  one      inv + the four plane dots fused into ONE
           (rb,128)x(128,4*tc) dot (coeffs pre-concatenated along N)
  k64/k32  one + K_PAD 64/32 (less padded MXU work; r3c found K=16
           scalarises — find the narrowest K that still lowers).
           Bitwise-safe: feats cols >= 16 are zero, so truncated
           coeff rows multiply zeros and MXU accumulation of zeros
           is exact.

Report Gpairs/s (= r*tpad / time). MXU padded-flop ceilings at 80
TFLOP/s f32: K128 ~78 Gpairs/s, K64 ~156, K32 ~312.
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

    class V3:
        def __init__(s, x, y, z):
            s.x, s.y, s.z = x, y, z

    def timeit(label, fn, args, reps=8):
        try:
            f = jax.jit(fn)
            for _ in range(2):
                out = f(*args)
                jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"[{label}] FAILED: {msg}", flush=True)
            return None, None
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        gp = R * TPAD / best / 1e9
        print(f"[{label}] {best*1e3:.2f} ms -> {gp:.1f} Gpairs/s", flush=True)
        return best, f

    # ---------------- anchor: shipped kernel --------------------------
    from tpurt.render.plucker_fused import FusedDenseTable, sweep_entry_local

    table = FusedDenseTable(coeffs=coeffs, ids=ids, owner=entry, entry=entry,
                            cull=cull, orient=orient, count=TPAD)

    def anchor(lox, loy, loz, ldx, ldy, ldz, le):
        return sweep_entry_local(V3(lox, loy, loz), V3(ldx, ldy, ldz), le,
                                 table, interpret=False)

    _, fa = timeit("anchor (shipped)", anchor, (*lo, *ld, lane_entry))

    # ---------------- restructured variants ---------------------------
    # Shipped-kernel epsilon (tpurt.config.EPSILON): the probe's
    # accept tests must match plucker_fused._sweep_kernel exactly
    # or the full-vs-shipped diff legs confound eps-window accepts
    # with dot accumulation-order flips (advisor round-3 finding).
    from tpurt.config import EPSILON
    eps = np.float32(EPSILON)

    def make_variant(kpad, fuse_dot):
        cs = coeffs[:, :kpad, :]                      # (4, kpad, TPAD)
        nch = TPAD // TC
        # per-chunk plane concat: (nch, kpad, 4*TC)
        cf = (cs.reshape(4, kpad, nch, TC).transpose(2, 1, 0, 3)
                .reshape(nch, kpad, 4 * TC))

        def kernel(feats_ref, le_ref, c_ref, ids_ref, ent_ref, cull_ref,
                   or_ref, tin_ref, cin_ref, t_ref, col_ref):
            j = pl.program_id(0)

            fr = feats_ref[...]                        # (RB, 16)
            feats = jnp.concatenate(
                [fr, jnp.zeros((RB, kpad - 16), jnp.float32)], axis=1)
            if fuse_dot:
                planes = jnp.dot(feats, c_ref[0],
                                 preferred_element_type=jnp.float32)
                det = planes[:, 0 * TC:1 * TC]
                u_num = planes[:, 1 * TC:2 * TC]
                v_num = planes[:, 2 * TC:3 * TC]
                t_num = planes[:, 3 * TC:4 * TC]
            else:
                det = jnp.dot(feats, c_ref[0, :, 0 * TC:1 * TC],
                              preferred_element_type=jnp.float32)
                u_num = jnp.dot(feats, c_ref[0, :, 1 * TC:2 * TC],
                                preferred_element_type=jnp.float32)
                v_num = jnp.dot(feats, c_ref[0, :, 2 * TC:3 * TC],
                                preferred_element_type=jnp.float32)
                t_num = jnp.dot(feats, c_ref[0, :, 3 * TC:4 * TC],
                                preferred_element_type=jnp.float32)
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
            big = jnp.int32(2 ** 30)
            col_min = jnp.min(
                jnp.where((t == t_min) & ok,
                          jnp.broadcast_to(col_iota, t.shape), big),
                axis=1, keepdims=True)
            t_prev = tin_ref[...]
            c_prev = cin_ref[...]
            closer = (t_min < t_prev) & (col_min < big)
            t_ref[...] = jnp.where(closer, t_min, t_prev)
            col_ref[...] = jnp.where(closer, col_min, c_prev)

        nch = TPAD // TC
        grid = (nch, R // RB)          # tris OUTER, rays inner
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RB, 16), lambda j, i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((1, kpad, 4 * TC), lambda j, i: (j, 0, 0)),
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
            # HAZARD (advisor round-3): this aliases the running (t,col)
            # fold through input_output_aliases, with blocks written at
            # grid step (j,i) re-read as input at (j+1,i) ~512 steps
            # later. Pallas does NOT order an aliased output DMA against
            # a later grid step's input prefetch — it happens to work at
            # this separation but is undefined-by-contract, and is a
            # candidate cause of this probe's observed lane mismatches.
            # Do NOT promote this structure into a shipped kernel;
            # prefer a VMEM scratch accumulator with tris innermost (as
            # plucker_fused does).
            input_output_aliases={7: 0, 8: 1},
        )

        def run(lox, loy, loz, ldx, ldy, ldz, le):
            one = jnp.ones((R,), jnp.float32)
            wx = ldy * loz - ldz * loy
            wy = ldz * lox - ldx * loz
            wz = ldx * loy - ldy * lox
            feats = jnp.stack(
                [ldx, ldy, ldz, wx, wy, wz, lox, loy, loz, one], axis=1)
            feats = jnp.pad(feats, ((0, 0), (0, 6)))   # (R, 16)
            t0 = jnp.full((R, 1), np.float32(np.inf), jnp.float32)
            c0 = jnp.full((R, 1), -1, jnp.int32)
            t_out, col_out = call(
                feats, le.reshape(R, 1), cf, ids, entry, cull, orient,
                t0, c0)
            return t_out[:, 0], col_out[:, 0]

        return run

    ref_out = None
    if fa is not None:
        ref_out = [np.asarray(x) for x in fa(*lo, *ld, lane_entry)]

    for kpad, fuse, label in (
        (128, False, "inv K128 4-dot"),
        (128, True, "one K128 fused-dot"),
        (64, True, "k64 fused-dot"),
        (32, True, "k32 fused-dot"),
    ):
        run = make_variant(kpad, fuse)
        best, f = timeit(label, run, (*lo, *ld, lane_entry))
        if f is not None and ref_out is not None:
            got = [np.asarray(x) for x in f(*lo, *ld, lane_entry)]
            t_ok = np.array_equal(got[0], ref_out[0])
            c_ok = np.array_equal(got[1], ref_out[1])
            print(f"    bitwise vs anchor: t={t_ok} col={c_ok}", flush=True)


if __name__ == "__main__":
    main()
