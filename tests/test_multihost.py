"""Multi-host scaffolding: the distributed pose-graph backend must run under
`jax.distributed` with more than one PROCESS (SURVEY.md §5.8 — no TPU pod is
available in CI, so this uses 2 CPU processes x 4 virtual devices each and
proves the code path does not assume a single controller).

Each process builds the same replicated graph, runs `sharded_optimize` over
the GLOBAL 8-device mesh, and checks convergence; the parent asserts both
processes succeed and agree.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np

sys.path.insert(0, os.environ["REPO"])
from jax.sharding import NamedSharding, PartitionSpec as P

from funny_lidar_slam_tpu.backend.distributed import AXIS, make_mesh, sharded_optimize
from funny_lidar_slam_tpu.io.simulator import noisy_circle_graph

b, gt = noisy_circle_graph(n=40, seed=0)
g = b.to_device()
mesh = make_mesh(jax.devices())

# replicate the (identical on every process) host graph onto the global mesh
rep = NamedSharding(mesh, P())
g = jax.tree.map(lambda x: jax.device_put(x, rep), g)

out = sharded_optimize(mesh, g, iterations=15)
poses = np.asarray(jax.device_get(out.poses))[:40]
err = np.linalg.norm(poses[:, :3, 3] - np.stack(gt)[:, :3, 3], axis=1).max()
print(f"proc {proc_id} max_err {err:.6f}", flush=True)
assert err < 2e-3, f"multihost solve error {err}"
print(f"proc {proc_id} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_optimize(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, REPO=repo)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), coord],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multihost worker {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
    # both processes computed the same replicated solution
    e0 = [l for l in outs[0].splitlines() if "max_err" in l]
    e1 = [l for l in outs[1].splitlines() if "max_err" in l]
    assert e0 and e1 and e0[0].split()[-1] == e1[0].split()[-1], (e0, e1)
