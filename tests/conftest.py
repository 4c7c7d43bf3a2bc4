"""Test configuration: run everything on a virtual 8-device CPU backend.

Multi-chip sharding tests run on CPU via 8 virtual host devices — the
standard JAX fake-backend trick (the TPU answer to "test multi-node without
a cluster", SURVEY.md §4).

Note: env vars (JAX_PLATFORMS / XLA_FLAGS) are NOT enough here — the
jaxtyping pytest plugin imports jax before any conftest runs, and jax
snapshots those env vars at import. ``jax.config.update`` still works after
import (as long as no backend has been initialized), so use that.
"""

import os

if os.environ.get("PUZZLENET_TEST_TPU") == "1":
    # opt-in hardware mode: leave the platform alone so
    # tests/test_tpu_kernels.py can exercise the Pallas kernels
    import jax
else:
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
