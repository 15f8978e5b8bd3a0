"""Probe r44 (TPU): latency vs throughput of pallas_call dispatch.

probe_r43: an identity pallas_call in a fori_loop costs ~700-800 us/iter
INDEPENDENT of payload (8..110 leaves, 16k..64k lanes, block 2k..4k) —
a fixed per-call latency. Production (il4 + unroll2 = 8 calls/trip in 4
independent chains) nonetheless beats il2/il1, so the latencies must
overlap across independent chains. This probe maps the dispatch model:
a trip holds k INDEPENDENT chains x d DEPENDENT identity calls each
(lanes 65536/k per chain, 16 f32 leaves), plus an XLA-only body leg.

us/trip tells us: if cost ~ d x 700 (k-invariant) => per-call latency
pipelines across chains (production floor = unroll depth x 700); if
cost ~ k*d x 700 => serial dispatch (interleave should LOSE, contradiction);
if cost ~ 700 + (k*d-1)*small => full pipelining after the first.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CAP = 48
R = 65536
L = 16


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

    def make_call(lanes):
        subl = 4096 // 128
        grid = lanes // 4096

        def kernel(*refs):
            ins, outs = refs[:L], refs[L:]
            for i, o in zip(ins, outs):
                o[...] = i[...] + 1.0

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                      for _ in range(L)],
            out_specs=[pl.BlockSpec((subl, 128), lambda i: (i, 0), **vm)
                       for _ in range(L)],
            out_shape=[jax.ShapeDtypeStruct((lanes // 128, 128), jnp.float32)
                       for _ in range(L)],
        )

    def make_leg(k, d, xla_only=False):
        lanes = R // k
        call = None if xla_only else make_call(lanes)

        def body(_, chains):
            out = []
            for c in chains:
                for _ in range(d):
                    if xla_only:
                        c = tuple(x + 1.0 for x in c)
                    else:
                        c = call(*c)
                out.append(c)
            return tuple(out)

        def run():
            chains = tuple(
                tuple(jnp.zeros((lanes // 128, 128), jnp.float32)
                      for _ in range(L))
                for _ in range(k)
            )
            return lax.fori_loop(0, CAP, body, chains)

        return jax.jit(run)

    legs = [
        ("k1 d1", make_leg(1, 1)),
        ("k1 d2", make_leg(1, 2)),
        ("k1 d4", make_leg(1, 4)),
        ("k4 d1", make_leg(4, 1)),
        ("k4 d2", make_leg(4, 2)),
        ("k2 d2", make_leg(2, 2)),
        ("k1 d1 xla", make_leg(1, 1, xla_only=True)),
        ("k1 d4 xla", make_leg(1, 4, xla_only=True)),
    ]

    def timeit(f):
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

    for rnd in range(2):
        print(f"--- round {rnd} (us/TRIP; 48 trips) ---", flush=True)
        for name, f in legs:
            print(f"[{name}] {timeit(f):.0f}", flush=True)


if __name__ == "__main__":
    main()
