"""Multi-host simulation: 2 OS processes × 4 virtual CPU devices each run
the sharded clustering step via ``jax.distributed`` and must both see the
same global result as the single-chip engine."""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); num_procs = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=num_procs,
                           process_id=proc_id)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from kmerlsh_tpu.parallel import dist
from kmerlsh_tpu.parallel.mesh import ROWS

assert len(jax.devices()) == 8, jax.devices()
mesh = Mesh(np.array(jax.devices()), (ROWS,))

rng = np.random.default_rng(0)
centers = rng.normal(size=(4, 8)).astype(np.float32)
X = np.repeat(centers, 16, axis=0) + 0.001 * rng.normal(size=(64, 8)).astype(np.float32)
sizes = np.ones(64, np.int32)

XT = np.ascontiguousarray(X.T)  # engine layout: sample-major [S, N]
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, ROWS)), XT[:, proc_id * 32:(proc_id + 1) * 32])
ss = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(ROWS)), sizes[proc_id * 32:(proc_id + 1) * 32])

# drive the real sharded programs (head + chunk) across both processes;
# the replicated n_alive scalar is addressable everywhere
progs = dist._dist_programs(mesh, 16)
head_values, chunk = progs[1], progs[2]
thr = (0.95 - 0.005 * np.arange(8)).astype(np.float32)
vt, sz, sl, par, na, ma = head_values(
    xs, ss, jax.random.PRNGKey(1), jnp.asarray(thr[:4]))
vt, sz, sl, par, na, ma = chunk(
    vt, sz, sl, par, jax.random.PRNGKey(1), jnp.asarray(thr[4:]),
    jnp.int32(4))
print(f"RESULT proc={proc_id} n_alive={int(na)}", flush=True)
assert int(na) == 4, int(na)
"""


@pytest.mark.skipif(os.environ.get("KMERLSH_SKIP_MULTIPROC") == "1",
                    reason="explicitly disabled")
def test_two_process_distributed_clustering(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"RESULT proc={i} n_alive=4" in out
