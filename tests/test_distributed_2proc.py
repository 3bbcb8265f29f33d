"""Two-process ``jax.distributed`` bootstrap test (SURVEY §5.8).

``init_distributed`` (parallel/mesh.py) is the pod-slice bootstrap the
SCALING.md story leans on; everything else distributed is covered on the
single-process 8-device virtual mesh, but process-SPANNING mesh construction
and cross-process collectives only exist once ``jax.distributed.initialize``
has run in every process (VERDICT r4 missing #3). This spawns two local CPU
processes (coordinator on localhost), builds a 2x4 mesh spanning both
(4 devices each), runs one small ``solve_poisson_dd`` across it, and each
process checks its addressable output shards against the NumPy DST oracle —
validating that the halo ppermutes and the replicated-coarse collectives
really cross the process boundary.

Skipped (not failed) when the sandbox forbids localhost sockets or the jax
build lacks multi-process CPU support; any in-protocol failure is a real
failure.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys

pid = int(sys.argv[1]); port = sys.argv[2]; repo = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

sys.path.insert(0, repo)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from seamlesscloneoptimization_tpu.parallel.mesh import init_distributed, make_tile_mesh
from seamlesscloneoptimization_tpu.parallel.tiled import solve_poisson_dd
from seamlesscloneoptimization_tpu.core.reference import poisson_solve_dst

init_distributed()  # second call must be a no-op (already initialized)

mesh = make_tile_mesh(shape=(2, 4))  # spans BOTH processes
sh = NamedSharding(mesh, P(None, "ty", "tx"))

rng = np.random.default_rng(0)
g = (rng.normal(size=(1, 40, 56)) * 10).astype(np.float32)
g_arr = jax.make_array_from_callback(g.shape, sh, lambda idx: g[idx])

fn = jax.jit(lambda x: solve_poisson_dd(x, mesh, tol=1e-6),
             out_shardings=sh)
u = fn(g_arr)

u_ref = poisson_solve_dst(np.transpose(g, (1, 2, 0)))[:, :, 0]
scale = float(np.abs(u_ref).max())
for shard in u.addressable_shards:
    got = np.asarray(shard.data)[0]
    want = u_ref[shard.index[1], shard.index[2]]
    err = np.abs(got - want).max() / scale
    assert err < 1e-4, f"proc {pid} shard {shard.index}: rel err {err}"
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_dd_solve(tmp_path):
    try:
        port = _free_port()
    except OSError as e:  # sandbox forbids sockets entirely
        pytest.skip(f"no localhost sockets: {e}")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process solve timed out:\n" + "\n".join(outs))
    joined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        low = joined.lower()
        # environment-level inability (no sockets / no multiprocess CPU
        # backend in this jax build) -> skip; in-protocol errors -> fail
        for marker in ("permission denied", "address already in use",
                       "unavailable: connection",
                       "distributed is not supported"):
            if marker in low:
                pytest.skip(f"platform forbids 2-process jax: {marker}")
        pytest.fail(joined[-4000:])
    assert "proc 0 OK" in joined and "proc 1 OK" in joined, joined[-2000:]
