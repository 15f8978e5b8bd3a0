"""Mosaic (Pallas) backend for the megakernel loop body.

Why: measured on the v5e tunnel, the XLA while_loop body costs
~60-110 ns per lane-iteration because XLA barely fuses the long
elementwise chains (each vector op streams (R,) f32 through HBM at
~50 GB/s), while the row gather itself costs a fixed ~17-35 ns/lane.
Fusing the ENTIRE post-gather body into ONE Pallas kernel keeps every
intermediate in VMEM/registers, so the body drops to roughly the cost
of streaming the lane state + the gathered rows once.

Shape strategy: each (R,) state leaf is reshaped to (R/128, 128) (lane
dim minor — the native VPU tile), blocked (BLOCK_SUBLANES, 128) over a
1-D grid; the gathered (R, W) rows are transposed in XLA to (W, R) and
reshaped (W, R/128, 128) so every in-kernel column read
``row_ref[j]`` is a contiguous (BLOCK_SUBLANES, 128) tile. Chain
params, materials, static triangle rows, and the (frame, sample_offset)
pair ride in SMEM and are read as scalars — exactly the accesses
megakernel._body_math already makes, so the SAME transcription runs
here (refs) and in the XLA engine (jnp arrays); there is no second
copy of the algorithm.

Numerics: interpret mode (CPU tests) is bit-identical to the XLA body
by construction. Compiled Mosaic may differ from XLA in transcendental
ULPs (log/cos/sqrt in Box-Muller, rsqrt in normalisation), so the XLA
body remains the parity anchor and RenderConfig.mega_body selects the
backend explicitly.

Bool state leaves travel as uint32 (Mosaic has no i1 memrefs); the
wrapper converts at the pallas_call boundary. Lane counts are padded
to the block size once per launch (padded lanes are born done).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

#: Lanes per grid block (default; live value reads
#: tpurt.config.MEGA_BLOCK_LANES at trace time). VMEM per block at 4096
#: lanes: ~1.3 MB state in + 1.3 MB out + 2.6 MB rows + Mosaic scratch —
#: measured AT the default 16 MB scoped ceiling for the tail3+expansion
#: body (probe_r34).
BLOCK_LANES = 4096
_SUBLANES = BLOCK_LANES // 128


def _block_lanes() -> int:
    import tpurt.config as _c

    return int(getattr(_c, "MEGA_BLOCK_LANES", BLOCK_LANES))


def _compiler_params():
    """CompilerParams with a raised VMEM limit when configured."""
    import tpurt.config as _c

    mb = int(getattr(_c, "MEGA_VMEM_LIMIT_MB", 0))
    if mb > 0 and _HAS_PLTPU:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=mb * 1024 * 1024
        )}
    return {}


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def make_pallas_body(scene, params, slot_rays, frame_index, sample_offset,
                     body_kw, interpret: bool = None):
    """Returns fn(state: _Lane, row: (W, R) f32 or None) -> _Lane
    running megakernel._body_math as one fused Mosaic kernel.

    ``params`` is the packed _ChainParams; ``body_kw`` the static
    keyword config for _body_math. frame_index / sample_offset may be
    traced scalars.
    """
    from tpurt.render.megakernel import _ChainParams, _body_math
    from tpurt.render.shading import pack_materials

    if interpret is None:
        interpret = _interpret_default()

    e_count = body_kw["e_count"]
    mats = pack_materials(scene)
    srows = scene.mega_static_rows
    if srows.shape[0] == 0:  # placeholder; never indexed when s_count == 0
        srows = jnp.zeros((1, 19), jnp.float32)
    fo = jnp.stack(
        [jnp.asarray(frame_index, jnp.int32),
         jnp.asarray(sample_offset, jnp.int32)]
    ).reshape(1, 2)
    ptab = params.table if params is not None else jnp.zeros((1, 1), jnp.float32)
    # Root-expansion tables ride in SMEM like ptab (scalar reads only);
    # dummies when no entry expands so the operand list stays fixed.
    rootsf = (
        params.roots_f
        if params is not None and params.roots_f is not None
        else jnp.zeros((1, 1), jnp.float32)
    )
    rootsi = (
        params.roots_i
        if params is not None and params.roots_i is not None
        else jnp.zeros((1, 1), jnp.int32)
    )
    static_meta = (
        (params.root, params.root_leaf, params.mesh, params.expand)
        if params is not None
        else ((), (), (), ())
    )
    # Quota-slot primary rays: (R,) f32 leaves, blocked like the lane
    # state (read-only; no output twins).
    slot_leaves, slot_treedef = jax.tree_util.tree_flatten(slot_rays)

    def call(state, row):
        # --- flatten the lane state (iters stays outside) -------------
        core = state._replace(iters=None)
        leaves, treedef = jax.tree_util.tree_flatten(core)
        r = leaves[0].shape[0]
        dtypes = [l.dtype for l in leaves]

        block = min(_block_lanes(), max(128, -(-r // 128) * 128))
        r_pad = -(-r // block) * block
        grid = r_pad // block
        subl = block // 128

        def prep(leaf):
            v = leaf.astype(jnp.uint32) if leaf.dtype == bool else leaf
            if r_pad != r:
                pad = jnp.zeros((r_pad - r,), v.dtype)
                if leaf is state.done:  # padded lanes are born done
                    pad = jnp.ones((r_pad - r,), v.dtype)
                v = jnp.concatenate([v, pad])
            return v.reshape(r_pad // 128, 128)

        xs = [prep(l) for l in leaves]

        vm = {} if not _HAS_PLTPU else {"memory_space": pltpu.VMEM}
        sm = {} if not _HAS_PLTPU else {"memory_space": pltpu.SMEM}
        slot_xs = [prep(l) for l in slot_leaves]
        in_specs = [
            pl.BlockSpec(ptab.shape, lambda i: (0, 0), **sm),
            pl.BlockSpec(mats.shape, lambda i: (0, 0), **sm),
            pl.BlockSpec(srows.shape, lambda i: (0, 0), **sm),
            pl.BlockSpec(fo.shape, lambda i: (0, 0), **sm),
            pl.BlockSpec(rootsf.shape, lambda i: (0, 0), **sm),
            pl.BlockSpec(rootsi.shape, lambda i: (0, 0), **sm),
        ]
        in_specs += [
            pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
            for _ in xs
        ]
        in_specs += [
            pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
            for _ in slot_xs
        ]
        inputs = [ptab, mats, srows, fo, rootsf, rootsi] + xs + slot_xs
        if e_count:
            rowt = row  # already (W, R): gathered from the transposed bank
            w = rowt.shape[0]
            if r_pad != r:
                rowt = jnp.concatenate(
                    [rowt, jnp.zeros((w, r_pad - r), jnp.float32)], axis=1
                )
            rowt = rowt.reshape(w, r_pad // 128, 128)
            in_specs.append(
                pl.BlockSpec((w, subl, 128), lambda i: (0, i, 0), **vm)
            )
            inputs.append(rowt)

        out_specs = [
            pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm) for _ in xs
        ]
        out_shape = [
            jax.ShapeDtypeStruct((r_pad // 128, 128), x.dtype) for x in xs
        ]

        n_state = len(xs)

        n_slot = len(slot_xs)

        def kernel(*refs):
            (ptab_ref, mats_ref, srows_ref, fo_ref,
             rootsf_ref, rootsi_ref) = refs[:6]
            state_refs = refs[6 : 6 + n_state]
            slot_refs = refs[6 + n_state : 6 + n_state + n_slot]
            pos = 6 + n_state + n_slot
            row_ref = refs[pos] if e_count else None
            out_refs = refs[pos + (1 if e_count else 0):]

            vals = []
            for ref, dt in zip(state_refs, dtypes):
                v = ref[...]
                if dt == bool:
                    v = v != 0
                vals.append(v)
            s = jax.tree_util.tree_unflatten(treedef, vals)
            s = s._replace(iters=jnp.int32(0))

            col = (lambda j: row_ref[j]) if e_count else None
            params_k = _ChainParams(table=ptab_ref, root=static_meta[0],
                                    root_leaf=static_meta[1],
                                    mesh=static_meta[2],
                                    roots_f=rootsf_ref, roots_i=rootsi_ref,
                                    expand=static_meta[3])
            slots_k = jax.tree_util.tree_unflatten(
                slot_treedef, [ref[...] for ref in slot_refs]
            )
            s2 = _body_math(
                s, col, srows_ref, mats_ref, params_k, slots_k,
                fo_ref[0, 0], fo_ref[0, 1],
                lambda ro0, rd0, pix, su: (ro0, rd0),
                **body_kw,
            )
            out_leaves = jax.tree_util.tree_flatten(
                s2._replace(iters=None))[0]
            for ref, v, dt in zip(out_refs, out_leaves, dtypes):
                ref[...] = v.astype(jnp.uint32) if dt == bool else v

        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            **_compiler_params(),
        )(*inputs)

        new_leaves = []
        for o, dt in zip(outs, dtypes):
            v = o.reshape(r_pad)[:r]
            if dt == bool:
                v = v != 0
            new_leaves.append(v)
        s2 = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return s2._replace(iters=state.iters)

    return call
