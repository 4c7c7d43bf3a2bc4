"""Multi-host bootstrap (core/sharding.maybe_initialize_distributed).

`jax.distributed.initialize` must run before backend init, so the test
drives a fresh subprocess: single-process "cluster" on CPU, global mesh,
one sharded computation. On a real pod the same call spans hosts and the
device-data training path needs no further changes (batches are generated
inside the step jit); see core/sharding.py.
"""

import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:12723"
os.environ["JAX_NUM_PROCESSES"] = "1"
os.environ["JAX_PROCESS_ID"] = "0"
import sys
sys.path.insert(0, %(repo)r)
from puzzlenet_tpu.core.sharding import (make_mesh,
                                         maybe_initialize_distributed,
                                         shard_batch)
assert maybe_initialize_distributed() is True
assert jax.process_count() == 1
import jax.numpy as jnp
mesh = make_mesh(batch_size=8)
assert mesh.shape["data"] == 4
x = shard_batch(mesh, jnp.arange(8.0).reshape(8, 1))
total = jax.jit(lambda x: jnp.sum(x))(x)
assert float(total) == 28.0
jax.distributed.shutdown()
print("MULTIHOST_OK")
"""


def test_single_process_distributed_bootstrap(tmp_path):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": repo}],
        capture_output=True, text=True, timeout=300, env=env)
    assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
