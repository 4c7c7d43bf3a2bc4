"""Fused set-abstraction kernel: kNN + gather + shared MLP + max (Pallas).

The encoder's hot path per stage is: kNN top-32 over a dense [S, N] distance
matrix, a [B, S, 32, C] neighbor gather (a 256 MB materialization at stage 1),
a two-layer pointwise MLP, and a max over neighbors
(pointnet_util.py:99-136 + model5_b.py:449-461). Dispatched separately,
top_k's sort and the gather/scatter pairs dominate the profile (~24 ms of a
43 ms encoder forward at B=64).

This kernel runs the whole stage per (batch, centroid-block) grid step with
everything resident in VMEM:

  * distances computed elementwise in f32 (exact),
  * the 32 neighbors selected by iterative argmin + masking (same order and
    tie-breaking as sorted top-k),
  * each neighbor fetched by a one-hot MXU matmul — exact: exactly one
    nonzero per row, so no accumulation error, only bf16 rounding of the
    fetched value (the same rounding every XLA-default Dense applies),
  * the two Dense layers + relu applied per neighbor and max-accumulated,
    so the [S, 32, C] grouped tensor never exists anywhere.

The kernel also emits the neighbor indices; the custom VJP gathers by those
saved indices and differentiates the (gather -> MLP -> max) graph, skipping
the kNN recomputation entirely. Off-TPU the module falls back to the
reference-shaped unfused path (identical math).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pointops import index_points, knn_indices

_S_BLK = 256


def _xdot(a, b):
    """Exact f32 dot (HIGHEST): forward activations and their backward
    recompute must round identically, otherwise relu masks flip at
    near-zero pre-activations and the custom VJP acquires O(1) noise."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def pallas_supported():
    return jax.default_backend() == "tpu"


def _sg_kernel(k_neighbors, precise, q_ref, xyz_ref, feats_ref, w1_ref,
               b1_ref, w2_ref, b2_ref, out_ref, idx_ref, amax_ref):
    q = q_ref[0]                      # [s, 3]
    xyz = xyz_ref[0]                  # [N, 3]
    feats = feats_ref[0]              # [N, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    s, n = q.shape[0], xyz.shape[0]
    h2 = w2.shape[1]

    dx = q[:, 0:1] - xyz[:, 0:1].T
    dy = q[:, 1:2] - xyz[:, 1:2].T
    dz = q[:, 2:3] - xyz[:, 2:3].T
    d0 = dx * dx + dy * dy + dz * dz            # [s, n] f32, exact

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    cat = jnp.concatenate([xyz, feats], axis=1)  # [n, 3 + C]
    kcols = lax.broadcasted_iota(jnp.int32, (s, k_neighbors), 1)

    def body(k, carry):
        d, acc, idx_acc, amax = carry
        sel = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]   # [s, 1]
        idx_acc = jnp.where(kcols == k, sel, idx_acc)
        onehot = (lane == sel).astype(jnp.float32)               # [s, n]
        # explicit-bf16 one-hot gather: exactly one nonzero per row and
        # single-pass bf16 products make the result deterministic across
        # kernels (the default f32 dot's 3-pass bf16 decomposition is
        # tiling-dependent, which would flip relu masks in the backward)
        nb = jnp.dot(onehot.astype(jnp.bfloat16), cat.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        rel = nb[:, :3] - q
        g = jnp.concatenate([rel, nb[:, 3:]], axis=1)            # [s, 3+C]
        mm = _xdot if precise else (
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        h = jnp.maximum(mm(g, w1) + b1, 0.0)
        h = jnp.maximum(mm(h, w2) + b2, 0.0)
        # argmax-k per channel: the backward masks by index, immune to
        # recompute rounding (first max wins, like lax reduce argmax)
        amax = jnp.where(h > acc, k, amax)
        acc = jnp.maximum(acc, h)
        d = jnp.where(onehot > 0, jnp.inf, d)
        return d, acc, idx_acc, amax

    init = (d0, jnp.full((s, h2), -jnp.inf, jnp.float32),
            jnp.zeros((s, k_neighbors), jnp.int32),
            jnp.zeros((s, h2), jnp.int32))
    _, acc, idx_acc, amax = lax.fori_loop(0, k_neighbors, body, init)
    out_ref[0] = acc
    idx_ref[0] = idx_acc
    amax_ref[0] = amax


def _fused_forward(new_xyz, xyz, feats, w1, b1, w2, b2, k, precise=True):
    """``precise=True`` runs the MLP dots at HIGHEST precision so the
    backward kernel's recomputed relu masks match bit-for-bit (required
    under grad). ``precise=False`` is the inference fast path (~30% faster;
    default-precision dots like every XLA Dense)."""
    B, S, _ = new_xyz.shape
    N, C = feats.shape[1], feats.shape[2]
    H, H2 = w1.shape[1], w2.shape[1]
    s_blk = min(_S_BLK, S)
    assert S % s_blk == 0, (S, s_blk)
    b1r = b1.reshape(1, H)
    b2r = b2.reshape(1, H2)

    grid = (B, S // s_blk)
    out, idx, amax = pl.pallas_call(
        functools.partial(_sg_kernel, k, precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, H2), jnp.float32),
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            jax.ShapeDtypeStruct((B, S, H2), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(new_xyz, xyz, feats, w1, b1r, w2, b2r)
    return out, idx, amax


def _sg_bwd_kernel(k_neighbors, q_ref, xyz_ref, feats_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, idx_ref, amax_ref, g_ref,
                   dq_ref, dcat_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """Backward of the fused stage, recomputing per-neighbor activations
    from the saved indices. Gradient conventions:
      * max backward: cotangent routed by the argmax-k index saved by the
        forward kernel (value-equality masks would drop gradient wherever
        bf16 recompute rounds differently);
      * feats/xyz cotangents scattered via one-hot^T MXU matmuls;
      * dW/db accumulated across the whole grid (single revisited block).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    xyz = xyz_ref[0]
    feats = feats_ref[0]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    idxmat = idx_ref[0]                    # [s, K]
    amax = amax_ref[0]                     # [s, H2] argmax neighbor index
    g = g_ref[0]                           # [s, H2]
    s, n = q.shape[0], xyz.shape[0]
    c_in = w1.shape[0]

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (s, k_neighbors), 1)
    cat = jnp.concatenate([xyz, feats], axis=1)

    @pl.when(j == 0)
    def _():
        dcat_ref[0] = jnp.zeros(dcat_ref.shape[1:], jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw1_ref[:, :] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[:, :] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[:, :] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:, :] = jnp.zeros(db2_ref.shape, jnp.float32)

    def hi_dot(a, b, dims):
        return lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)

    def body(k, carry):
        dq, dcat, dw1, db1, dw2, db2 = carry
        sel = jnp.sum(jnp.where(kcols == k, idxmat, 0), axis=1,
                      keepdims=True)                        # [s, 1]
        onehot = (lane == sel).astype(jnp.float32)          # [s, n]
        nb = jnp.dot(onehot.astype(jnp.bfloat16), cat.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)    # exact, see fwd
        rel = nb[:, :3] - q
        gk = jnp.concatenate([rel, nb[:, 3:]], axis=1)      # [s, c_in]
        a1 = _xdot(gk, w1) + b1
        h1 = jnp.maximum(a1, 0.0)
        a2 = _xdot(h1, w2) + b2

        dh2 = jnp.where(amax == k, g, 0.0)  # h2 = relu(a2) not needed
        da2 = jnp.where(a2 > 0, dh2, 0.0)
        dw2 = dw2 + hi_dot(h1, da2, ((0,), (0,)))           # [H, H2]
        db2 = db2 + jnp.sum(da2, axis=0, keepdims=True)
        dh1 = hi_dot(da2, w2, ((1,), (1,)))                 # [s, H]
        da1 = jnp.where(a1 > 0, dh1, 0.0)
        dw1 = dw1 + hi_dot(gk, da1, ((0,), (0,)))           # [c_in, H]
        db1 = db1 + jnp.sum(da1, axis=0, keepdims=True)
        dgk = hi_dot(da1, w1, ((1,), (1,)))                 # [s, c_in]
        dq = dq - dgk[:, :3]
        dcat = dcat + hi_dot(onehot, dgk, ((0,), (0,)))     # [n, c_in]
        return dq, dcat, dw1, db1, dw2, db2

    init = (jnp.zeros((s, 3), jnp.float32),
            jnp.zeros((n, c_in), jnp.float32),
            jnp.zeros(dw1_ref.shape, jnp.float32),
            jnp.zeros(db1_ref.shape, jnp.float32),
            jnp.zeros(dw2_ref.shape, jnp.float32),
            jnp.zeros(db2_ref.shape, jnp.float32))
    dq, dcat, dw1, db1, dw2, db2 = lax.fori_loop(0, k_neighbors, body, init)

    dq_ref[0] = dq
    dcat_ref[0] = dcat_ref[0] + dcat
    dw1_ref[:, :] = dw1_ref[:, :] + dw1
    db1_ref[:, :] = db1_ref[:, :] + db1
    dw2_ref[:, :] = dw2_ref[:, :] + dw2
    db2_ref[:, :] = db2_ref[:, :] + db2


def _fused_backward(new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax, g):
    B, S, _ = new_xyz.shape
    N, C = feats.shape[1], feats.shape[2]
    c_in, H = w1.shape
    H2 = w2.shape[1]
    k = idx.shape[-1]
    s_blk = min(_S_BLK, S)
    grid = (B, S // s_blk)

    dq, dcat, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_sg_bwd_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3 + C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 + C), jnp.float32),
            jax.ShapeDtypeStruct((c_in, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(new_xyz, xyz, feats, w1, b1.reshape(1, H), w2, b2.reshape(1, H2),
      idx, amax, g)
    return (dq, dcat[:, :, :3], dcat[:, :, 3:], dw1,
            db1.reshape(b1.shape), dw2, db2.reshape(b2.shape))


def _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx):
    """Reference-shaped math given neighbor indices (used by the VJP and as
    the off-TPU fallback): gather -> concat rel-xyz -> Dense/relu x2 -> max."""
    grouped_xyz = index_points(xyz, idx)                  # [B, S, k, 3]
    rel = grouped_xyz - new_xyz[:, :, None, :]
    grouped = jnp.concatenate([rel, index_points(feats, idx)], axis=-1)
    h = jnp.maximum(grouped @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    return jnp.max(h, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_set_abstraction(new_xyz, xyz, feats, w1, b1, w2, b2, k):
    """[B,S,3], [B,N,3], [B,N,C], MLP params -> [B, S, w2_out].

    TPU: single fused Pallas kernel. Elsewhere: kNN + gather + MLP + max.
    """
    if pallas_supported():
        out, _, _ = _fused_forward(new_xyz, xyz, feats, w1, b1, w2, b2, k,
                                   precise=False)  # inference fast path
        return out
    idx = knn_indices(new_xyz, xyz, k)
    return _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)


def _fsa_fwd(new_xyz, xyz, feats, w1, b1, w2, b2, k):
    if pallas_supported():
        out, idx, amax = _fused_forward(new_xyz, xyz, feats, w1, b1, w2,
                                        b2, k, precise=True)
    else:
        idx = knn_indices(new_xyz, xyz, k)
        out = _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)
        amax = None
    return out, (new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax)


def _fsa_bwd(k, res, g):
    new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax = res
    # differentiate the gather->MLP->max graph at the SAVED indices (the
    # kNN selection itself has zero gradient a.e.)
    if pallas_supported():
        return _fused_backward(new_xyz, xyz, feats, w1, b1, w2, b2, idx,
                               amax, g)

    def f(new_xyz, xyz, feats, w1, b1, w2, b2):
        return _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)

    _, vjp = jax.vjp(f, new_xyz, xyz, feats, w1, b1, w2, b2)
    return vjp(g)


fused_set_abstraction.defvjp(_fsa_fwd, _fsa_bwd)
