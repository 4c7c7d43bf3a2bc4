"""Fully on-device data pipeline (jit, fixed shapes).

The reference generates every training pair on the host: slice -> unbounded
rejection loop -> Python FPS -> 1024x1024 chamfer boundary, at 64 worker
processes (train.py:100-101, SURVEY.md §3.4). This pipeline builds the same
8-tuple batch contract entirely under jit on the accelerator:

  whole clouds [B, M, 3] (resident on device, e.g. the synthetic families
  or preloaded npy payloads)
    -> random plane cut (masked partition, fixed shapes)
    -> masked FPS to 1024 per side (invalid points can never be selected)
    -> top-128 mutual-chamfer boundary + masks
    -> random mag-0.8 twist applied to the up piece (igt recorded)

Cut rejection is handled by drawing K candidate planes per cloud and
selecting the first whose smaller side still has >= 1024 points — a fixed-
shape analogue of the reference's retry loop (dataset.py:1175-1179). The
fallback candidate is the centroid plane along the widest axis, which
always bisects.

This path feeds training/benchmarks at device speed; the host datasets
(datasets.py) remain the reference-faithful generation path (all four
slicers, split_twice).
"""

import functools

import jax
import jax.numpy as jnp

from ..ops import farthest_point_sample
from ..semath import se3
from .boundary import get_boundary
from ..train.losses import Batch

NPOINT = 1024
N_CANDIDATES = 8


def _plane_partition(key, cloud, npoint):
    """Pick a plane cut keeping >= npoint on both sides; return (up_idx,
    down_idx) as fixed-size index sets via sort-by-side trick.

    cloud [M, 3]. A point belongs 'up' if dot(p, n) + z >= 0
    (plane_split semantics, dataset.py:761-775).
    """
    m = cloud.shape[0]
    k_n, k_z = jax.random.split(key)
    normals = jax.random.uniform(k_n, (N_CANDIDATES, 3), dtype=cloud.dtype)
    zs = jax.random.uniform(k_z, (N_CANDIDATES,), dtype=cloud.dtype) / 3
    dis = cloud @ normals.T + zs[None, :]              # [M, K]
    up_counts = jnp.sum(dis >= 0, axis=0)              # [K]
    ok = (up_counts >= npoint) & (m - up_counts >= npoint)
    # fallback: centroid plane along the widest axis always bisects
    extent = cloud.max(0) - cloud.min(0)
    axis = jnp.argmax(extent)
    fb_normal = jax.nn.one_hot(axis, 3, dtype=cloud.dtype)
    fb_dis = cloud @ fb_normal - jnp.median(cloud @ fb_normal)
    choice = jnp.argmax(ok)                            # first ok candidate
    any_ok = jnp.any(ok)
    side = jnp.where(any_ok, dis[:, choice], fb_dis)   # [M]
    return side >= 0                                   # up mask


def _masked_fps_points(xyz, mask, npoint, start_key):
    """FPS restricted to masked points, returning gathered [npoint, 3]."""
    # choose a valid start: first True index
    start = jnp.argmax(mask).astype(jnp.int32)
    idx = farthest_point_sample(xyz[None], npoint, start_idx=start[None],
                                valid_mask=mask[None], use_pallas=False)[0]
    return xyz[idx]


@functools.partial(jax.jit, static_argnames=("npoint", "boundary_k", "mag"))
def make_batch(key, clouds, npoint=NPOINT, boundary_k=128, mag=0.8):
    """clouds [B, M, 3] on device -> Batch (the 8-tuple contract)."""
    B = clouds.shape[0]
    keys = jax.random.split(key, B * 3).reshape(B, 3, 2)

    def per_cloud(cloud, ks):
        up_mask = _plane_partition(ks[0], cloud, npoint)
        up = _masked_fps_points(cloud, up_mask, npoint, ks[1])
        down = _masked_fps_points(cloud, ~up_mask, npoint, ks[1])
        return up, down

    up, down = jax.vmap(per_cloud)(clouds, keys)
    fpcb, rpcb, fpc_idx, rpc_idx = get_boundary(down, up, boundary_k)

    # random mag twist on the up piece (MovedCADDataset2 semantics)
    def per_twist(k):
        x = jax.random.normal(k, (6,), clouds.dtype)
        return x / jnp.linalg.norm(x) * mag

    twists = jax.vmap(per_twist)(keys[:, 2])
    igt = se3.exp(twists)
    mup = se3.transform_points(igt, up)

    return Batch(fpc=down, mrpc=mup, igt=igt, rpc=up, fpcb=fpcb, rpcb=rpcb,
                 fpc_idx=fpc_idx, rpc_idx=rpc_idx)
