"""Ground-truth boundary extraction.

Capability parity with CADDataset.get_boundary (dataset.py:1357-1367): each
side's boundary is its 128 points with smallest cross-chamfer distance
(distance to the nearest point on the other side), plus 0/1 masks.
"""

import jax
import jax.numpy as jnp
import numpy as np


def get_boundary_np(fpc, rpc, k=128):
    """numpy host version: fpc [N,3], rpc [M,3] ->
    (fpcb [k,3], rpcb [k,3], fpc_idx [N], rpc_idx [M]).

    Distances via the GEMM expansion |a|^2 + |b|^2 - 2 a.b^T (BLAS) — the
    same form the device chamfer uses — instead of a broadcast [N, M, 3]
    difference tensor (~15x faster at 1024^2, the host loader's hottest
    non-FPS cost)."""
    a = fpc.astype(np.float32, copy=False)
    b = rpc.astype(np.float32, copy=False)
    d = ((a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :]
         - 2.0 * (a @ b.T))                                  # [N, M]
    # The expansion cancels catastrophically exactly for the near-zero
    # cross-piece distances this labeler ranks, so d can dip slightly
    # negative and top-k membership can differ from the direct (a-b)^2
    # form on near-ties (ulp-level, boundary membership is rank-128 of a
    # continuum — both labelings are valid ground truth). Clamp to keep
    # downstream sqrt/log consumers safe.
    np.maximum(d, 0.0, out=d)
    d_rpc = d.min(axis=0)   # nearest fpc point for each rpc point
    d_fpc = d.min(axis=1)   # nearest rpc point for each fpc point
    rpc_top = np.argsort(d_rpc, kind="stable")[:k]
    fpc_top = np.argsort(d_fpc, kind="stable")[:k]
    fpc_idx = np.zeros(len(fpc), np.float32)
    fpc_idx[fpc_top] = 1
    rpc_idx = np.zeros(len(rpc), np.float32)
    rpc_idx[rpc_top] = 1
    return (fpc[fpc_top].astype(np.float32), rpc[rpc_top].astype(np.float32),
            fpc_idx, rpc_idx)


def get_boundary(fpc, rpc, k=128):
    """jnp device version, batched: fpc [B,N,3], rpc [B,M,3] ->
    (fpcb [B,k,3], rpcb [B,k,3], fpc_idx [B,N], rpc_idx [B,M])."""
    from ..ops import chamfer_distances, index_points

    d_rpc, d_fpc = chamfer_distances(fpc, rpc)   # [B, M], [B, N]
    _, rpc_top = jax.lax.top_k(-d_rpc, k)
    _, fpc_top = jax.lax.top_k(-d_fpc, k)
    fpcb = index_points(fpc, fpc_top)
    rpcb = index_points(rpc, rpc_top)
    fpc_idx = jnp.put_along_axis(jnp.zeros(fpc.shape[:2], jnp.float32),
                                 fpc_top, 1.0, axis=1, inplace=False)
    rpc_idx = jnp.put_along_axis(jnp.zeros(rpc.shape[:2], jnp.float32),
                                 rpc_top, 1.0, axis=1, inplace=False)
    return fpcb, rpcb, fpc_idx, rpc_idx
