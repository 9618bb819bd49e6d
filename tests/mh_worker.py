"""Worker process for the multi-host (2-process) DP test.

Launched by tests/test_multihost.py: each process owns 2 virtual CPU devices,
joins a jax.distributed pod of 2 processes, builds the global 4-device mesh
with the same helpers the trainers use, and runs one jitted DP step whose
gradient all-reduce must cross the process boundary (the SURVEY §5 DCN path,
executed rather than assumed).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A sitecustomize may have imported jax (and registered a TPU relay platform)
# before this script ran; the config update beats the env var in that case.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from crdr_tpu.parallel.distributed import init_distributed  # noqa: E402

multi = init_distributed(f"localhost:{port}", 2, pid)
assert multi, "init_distributed returned single-host in a configured pod"

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from crdr_tpu.parallel.mesh import make_mesh, replicated  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()

mesh = make_mesh(4)
dp = NamedSharding(mesh, P("data"))
rep = replicated(mesh)

# Each process contributes a DISTINCT local batch shard; the correct global
# loss/grad is only reachable if the all-reduce spans both processes.
local = (np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 1.0) * (pid + 1)
batch = jax.make_array_from_process_local_data(dp, local, (4, 3))
w = jax.device_put(jnp.ones((3,), jnp.float32), rep)


def loss_fn(w, x):
    return jnp.mean((x @ w) ** 2)


@jax.jit
def step(w, x):
    loss, g = jax.value_and_grad(lambda p: loss_fn(p, x))(w)
    return w - 0.01 * g, loss


w2, loss = step(w, batch)
print(f"MHOK pid={pid} loss={float(loss):.6f} "
      f"w={' '.join(f'{float(v):.6f}' for v in np.asarray(w2))}", flush=True)
