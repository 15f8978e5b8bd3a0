"""Probe r43 (TPU): what is the ~750 us fixed cost of an identity
pallas_call over 65536 lanes (probe_r42 leg B)?

Candidates: per-BLOCK overhead (grid=16 at block 4096), per-OPERAND
DMA setup (110 separate (subl,128) windows per block), or per-CALL
dispatch. Legs vary leaves x block x lanes, plus the candidate fix —
the whole state PACKED as ONE (L, R/128, 128) operand — and each leg
runs twice (non-adjacent) to bound box noise.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CAP = 48


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vm = {"memory_space": pltpu.VMEM}
    except Exception:
        vm = {}

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    def make_leg(n_leaves, block, lanes, packed=False):
        subl = block // 128
        grid = lanes // block

        if packed:
            def kernel(i_ref, o_ref):
                o_ref[...] = i_ref[...] + 1.0

            call = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((n_leaves, subl, 128),
                                       lambda i: (0, i, 0), **vm)],
                out_specs=pl.BlockSpec((n_leaves, subl, 128),
                                       lambda i: (0, i, 0), **vm),
                out_shape=jax.ShapeDtypeStruct(
                    (n_leaves, lanes // 128, 128), jnp.float32),
            )

            def body(_, x):
                return call(x)

            def run():
                x = jnp.zeros((n_leaves, lanes // 128, 128), jnp.float32)
                return lax.fori_loop(0, CAP, body, x)
        else:
            def kernel(*refs):
                ins, outs = refs[:n_leaves], refs[n_leaves:]
                for i, o in zip(ins, outs):
                    o[...] = i[...] + 1.0

            call = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                          for _ in range(n_leaves)],
                out_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                           for _ in range(n_leaves)],
                out_shape=[jax.ShapeDtypeStruct((lanes // 128, 128),
                                                jnp.float32)
                           for _ in range(n_leaves)],
            )

            def body(_, leaves):
                return call(*leaves)

            def run():
                leaves = tuple(jnp.zeros((lanes // 128, 128), jnp.float32)
                               for _ in range(n_leaves))
                return lax.fori_loop(0, CAP, body, leaves)

        return run

    legs = [
        ("L110 b4096 r64k", make_leg(110, 4096, 65536)),
        ("L40  b4096 r64k", make_leg(40, 4096, 65536)),
        ("L8   b4096 r64k", make_leg(8, 4096, 65536)),
        ("L110 b2048 r64k", make_leg(110, 2048, 65536)),
        ("L110 b4096 r16k", make_leg(110, 4096, 16384)),
        ("PACK110 b4096 r64k", make_leg(110, 4096, 65536, packed=True)),
        ("PACK110 b8192 r64k", make_leg(110, 8192, 65536, packed=True)),
        ("PACK110 b4096 r256k", make_leg(110, 4096, 262144, packed=True)),
    ]

    jitted = {}
    for name, run in legs:
        jitted[name] = jax.jit(run)

    def timeit(name):
        f = jitted[name]
        out = f()
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / CAP * 1e6

    # two non-adjacent rounds per leg to bound noise
    for rnd in range(2):
        print(f"--- round {rnd} ---", flush=True)
        for name, _ in legs:
            us = timeit(name)
            print(f"[{name}] {us:.0f} us/iter", flush=True)


if __name__ == "__main__":
    main()
