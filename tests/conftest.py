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


# ---- two-tier suite --------------------------------------------------------
# The full suite is ~30 min on a 1-CPU VM (291 tests) — a real iteration
# tax. Heavy e2e modules (training loops, assembly solves, serving
# sessions) carry ``pytestmark = pytest.mark.slow``; the DEFAULT run skips
# them (`pytest tests/ -q` ~ the quick tier). Opt in to everything with
#   PUZZLENET_TEST_FULL=1 python -m pytest tests/ -q
# or select explicitly with -m slow / -m "not slow".

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy e2e test (excluded from the default quick "
                   "tier; run with PUZZLENET_TEST_FULL=1 or -m slow)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PUZZLENET_TEST_FULL") == "1":
        return
    if config.getoption("-m"):
        return  # an explicit marker expression overrides the tiering
    skip = pytest.mark.skip(reason="slow tier (set PUZZLENET_TEST_FULL=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
