"""Device mesh and sharding layout.

The reference is single-GPU (pl.Trainer(devices=[opt.device]), train.py:126;
SURVEY.md §2.3 records no multi-device parallelism of any kind). The
TPU-native design scales over an ICI mesh from day one:

* ``data`` axis — batch sharding (piece-pairs are embarrassingly parallel);
  gradients all-reduce automatically under jit when the batch is sharded.
* ``model`` axis — optional tensor parallelism: the largest Dense kernels
  (pose MLP 2048x1024, encoder projection 1280x1024) are column-sharded;
  XLA inserts the all-gathers. The model is ~10 M params so this is reserve
  capacity, but the mesh layout is real and exercised by dryrun_multichip.

Works identically on 1 real chip (1x1 mesh) and N virtual CPU devices.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(cfg=None):
    """Multi-host (DCN) bootstrap: call ``jax.distributed.initialize`` when
    requested, before any backend touch.

    Triggers: ``--multihost`` flag, or standard cluster env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``COORDINATOR_ADDRESS``). On TPU pods
    ``initialize()`` auto-discovers coordinator/process ids from the
    metadata server; elsewhere the env vars supply them. After this,
    ``jax.devices()`` spans every host, so ``make_mesh`` builds one global
    mesh and jit inserts DCN collectives where shardings demand them.

    The device-data training path composes with this for free: batches are
    generated on device *inside* the step jit from a replicated cloud
    stack and the (replicated) PRNG key, so there is no per-host input
    pipeline to shard. Host-loader paths feed per-process batches and
    would need jax.make_array_from_process_local_data; device_data=True
    is the supported multi-host mode.

    Returns True if distributed was initialized.
    """
    # Opt-in only: --multihost or the JAX-specific env var. The generic
    # COORDINATOR_ADDRESS is NOT honored on its own — a stray env var from
    # another system would make single-host training block waiting for a
    # coordinator that never answers.
    want = (cfg is not None and getattr(cfg, "multihost", False)) or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not want:
        return False
    kwargs = {}
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs["coordinator_address"] = addr
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(data=-1, model=1, devices=None, batch_size=None):
    """Build a ('data', 'model') mesh. data=-1 uses all remaining devices;
    when ``batch_size`` is given, the data axis is clamped to its largest
    divisor so batch sharding always divides evenly."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    assert data * model <= n, (data, model, n)
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(mesh, batch):
    """Shard every leaf of a batch pytree along its leading (batch) axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicated(mesh):
    return NamedSharding(mesh, P())


def param_sharding_rule(mesh, min_size=1 << 18):
    """Sharding fn for a param leaf: column-shard big 2-D kernels over
    'model', replicate everything else."""
    model_size = mesh.shape["model"]

    def rule(x):
        if (x.ndim == 2 and x.size >= min_size
                and x.shape[1] % model_size == 0 and model_size > 1):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return rule


def shard_params(mesh, params, min_size=1 << 18):
    """device_put every param leaf according to the TP rule."""
    rule = param_sharding_rule(mesh, min_size)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)),
                                  params)
