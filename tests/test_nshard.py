"""N-axis (point-axis) sharding parity tests on the 8-device CPU mesh.

Validates core/nshard.py's shard_map primitives against the dense
ops/pointops.py implementations: exact FPS chain equality, exact gather,
and set-abstraction output parity (the merged local-top-k candidate set
contains the global kNN set, so the stage output matches the dense path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puzzlenet_tpu.core.nshard import (make_n_mesh, nshard_fps,
                                       nshard_gather,
                                       nshard_set_abstraction)
from puzzlenet_tpu.ops.pointops import (farthest_point_sample, index_points,
                                        knn_indices)
from puzzlenet_tpu.ops.sg_pallas import _mlp_max_from_idx


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_n_mesh(8)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 2048, 3)).astype(np.float32))


class TestNShardGather:
    def test_matches_dense_gather(self, mesh, cloud):
        rng = np.random.default_rng(1)
        idx = jnp.asarray(rng.integers(0, 2048, size=(2, 64)), jnp.int32)
        got = nshard_gather(cloud, idx, mesh)
        want = index_points(cloud, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)


class TestNShardFPS:
    def test_matches_dense_fps(self, mesh, cloud):
        got = nshard_fps(cloud, 64, mesh)
        want = farthest_point_sample(cloud, 64, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_nonzero_start(self, mesh, cloud):
        start = jnp.asarray([5, 1900], jnp.int32)
        got = nshard_fps(cloud, 32, mesh, start_idx=start)
        want = farthest_point_sample(cloud, 32, start_idx=start,
                                     use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_jit_under_mesh(self, mesh, cloud):
        f = jax.jit(lambda x: nshard_fps(x, 16, mesh))
        got = f(cloud)
        want = farthest_point_sample(cloud, 16, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestNShardSetAbstraction:
    def test_matches_dense_stage(self, mesh, cloud):
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.normal(size=(2, 2048, 16)).astype(np.float32))
        q = index_points(cloud, farthest_point_sample(cloud, 128,
                                                      use_pallas=False))
        w1 = jnp.asarray(rng.normal(size=(19, 32)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(32)
        w2 = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(32)
        got = nshard_set_abstraction(q, cloud, feats, w1, b1, w2, b2, 8,
                                     mesh)
        idx = knn_indices(q, cloud, 8)
        want = _mlp_max_from_idx(q, cloud, feats, w1, b1, w2, b2, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_big_cloud_end_to_end(self, mesh):
        """A 16k-point cloud (beyond the reference's ~11k ceiling) through
        FPS + set abstraction entirely on the sharded path."""
        rng = np.random.default_rng(3)
        big = jnp.asarray(rng.normal(size=(1, 16384, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 16384, 8)).astype(np.float32))
        idx = nshard_fps(big, 64, mesh)
        q = nshard_gather(big, idx, mesh)
        w1 = jnp.asarray(rng.normal(size=(11, 16)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(16)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(16)
        out = nshard_set_abstraction(q, big, feats, w1, b1, w2, b2, 16,
                                     mesh)
        assert out.shape == (1, 64, 16)
        dense = _mlp_max_from_idx(q, big, feats, w1, b1, w2, b2,
                                  knn_indices(q, big, 16))
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)


class TestNShardGrad:
    """Backward parity: the sharded ops are fully differentiable (shard_map
    transposes the collectives) and their grads match the dense path. All
    three run with check_vma=True — _sg_local re-establishes the replicated
    output type with a masked psum (see core/nshard.py)."""

    def test_set_abstraction_grad_matches_dense(self, mesh, cloud):
        from puzzlenet_tpu.ops import knn_indices

        rng = np.random.default_rng(7)
        feats = jnp.asarray(
            rng.normal(size=(2, 2048, 8)).astype(np.float32))
        q = cloud[:, :32]
        w1 = jnp.asarray(rng.normal(size=(11, 16)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(16)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(16)

        def sharded(xyz, feats, w1, b1, w2, b2):
            return jnp.sum(nshard_set_abstraction(
                q, xyz, feats, w1, b1, w2, b2, 8, mesh) ** 2)

        def dense(xyz, feats, w1, b1, w2, b2):
            idx = knn_indices(q, xyz, 8)
            return jnp.sum(_mlp_max_from_idx(
                q, xyz, feats, w1, b1, w2, b2, idx) ** 2)

        args = (cloud, feats, w1, b1, w2, b2)
        gs = jax.grad(sharded, argnums=tuple(range(6)))(*args)
        gd = jax.grad(dense, argnums=tuple(range(6)))(*args)
        for a, b in zip(gs, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_gather_grad_matches_dense(self, mesh, cloud):
        idx = jnp.tile(jnp.arange(0, 2048, 64, dtype=jnp.int32)[None],
                       (2, 1))

        gs = jax.grad(
            lambda x: jnp.sum(nshard_gather(x, idx, mesh) ** 3))(cloud)
        gd = jax.grad(
            lambda x: jnp.sum(index_points(x, idx) ** 3))(cloud)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                                   rtol=1e-5, atol=1e-6)

    def test_sharded_train_step(self, mesh, cloud):
        """One SGD step through the sharded stage moves the loss down —
        the inference-only caveat from round 2 is closed."""
        rng = np.random.default_rng(8)
        feats = jnp.asarray(
            rng.normal(size=(2, 2048, 8)).astype(np.float32))
        q = cloud[:, :32]
        w1 = jnp.asarray(rng.normal(size=(11, 16)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(16)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(16)
        target = jnp.ones((2, 32, 16))

        @jax.jit
        def step(params):
            def loss(p):
                out = nshard_set_abstraction(q, cloud, feats, p["w1"],
                                             p["b1"], p["w2"], p["b2"], 8,
                                             mesh)
                return jnp.mean((out - target) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            return l, jax.tree.map(lambda p, g: p - 0.05 * g, params, g)

        params = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}
        l0, params = step(params)
        for _ in range(5):
            l1, params = step(params)
        assert float(l1) < float(l0), (float(l0), float(l1))
