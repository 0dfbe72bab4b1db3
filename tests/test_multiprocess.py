"""Real multi-process distributed init: 2 CPU processes federate via
``parallel.distributed_init`` (gloo collectives) and a batch-sharded
gradient reduction crosses the process boundary.

This exercises the actual ``jax.distributed.initialize`` path — the piece a
virtual single-process device farm (conftest's 8 CPU devices) cannot reach.
Reference has nothing to compare against (SURVEY.md §2.6: no distributed
backend at all).
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]

sys.path.insert(0, os.getcwd())
from lbfgs_ffnn_tpu.parallel import distributed_init, make_mesh

distributed_init(coordinator_address=f"localhost:{port}",
                 num_processes=n, process_id=pid)
assert jax.process_count() == n, jax.process_count()
assert jax.device_count() == n, jax.device_count()

import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(axis_name="data")

# Global batch split across processes; replicated weights; grad of the
# global mean-squared loss must equal the single-process value.
w = jnp.array([0.5, -1.0, 2.0])
x_local = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3) + 4 * 3 * pid
y_local = jnp.ones((4,), dtype=jnp.float32)
gx = multihost_utils.host_local_array_to_global_array(x_local, mesh, P("data"))
gy = multihost_utils.host_local_array_to_global_array(y_local, mesh, P("data"))

def loss(w, x, y):
    return 0.5 * jnp.mean((x @ w - y) ** 2)

g = jax.jit(jax.grad(loss),
            out_shardings=NamedSharding(mesh, P()))(w, gx, gy)
print(f"RESULT {pid} " + ",".join(f"{v:.8f}" for v in np.asarray(g)), flush=True)
import numpy as np  # noqa: E402 (used above via closure)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_gradient(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text("import numpy as np\n" + _WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            cwd=str(Path(__file__).resolve().parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    grads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, vec = line.split(" ", 2)
                grads[int(pid)] = np.array([float(v) for v in vec.split(",")])
    assert set(grads) == {0, 1}
    # Both processes hold the same replicated global gradient...
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-6)
    # ...equal to the single-process oracle over the concatenated batch.
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    y = np.ones(8, dtype=np.float32)
    w = np.array([0.5, -1.0, 2.0], dtype=np.float32)
    r = x @ w - y
    oracle = (x * r[:, None]).mean(axis=0)
    np.testing.assert_allclose(grads[0], oracle, rtol=1e-5)
