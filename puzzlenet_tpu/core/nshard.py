"""N-axis (point-axis) sharding for clouds far beyond one chip's memory.

SURVEY.md §5's long-context analog: the reference caps clouds at ~11k
points because everything is dense [N, N] / [S, N] on one GPU
(/root/reference/pointnet_util.py:36, dataset.py:1147-1163). Here the
POINT axis is block-sharded across a mesh axis, so cloud size scales with
the device count while centroids (S is small) stay replicated:

* ``nshard_fps`` — the exact max-min FPS chain on sharded points. Each
  iteration reduces locally, resolves the global winner with one tiny
  ``all_gather`` of per-shard maxima, and broadcasts the winner's
  coordinates with a ``psum`` of the owner's contribution. Tie-breaking
  matches the dense path exactly (lowest global index): shards are
  contiguous blocks, the device argmax picks the lowest device, and the
  local argmax picks the lowest local index.
* ``nshard_set_abstraction`` — the set-abstraction stage (kNN + gather +
  shared MLP + max, the contract of ops/sg_pallas.py) on sharded points:
  every shard computes its LOCAL top-k candidates (distances + gathered
  features), one ``all_gather`` merges the D*k candidates per centroid,
  and the exact global top-k among them feeds the MLP + neighbor max.
  The global top-k is always a subset of the union of local top-ks, so
  the neighbor SET equals the dense kNN's (tie order aside).
* ``nshard_gather`` — gather points by global indices across shards
  (owner selects, ``psum`` broadcasts).

All three are ``shard_map`` bodies over an ``("n",)`` (or any named) mesh
axis; collectives ride ICI. Everything is jit-compatible with static
shapes, and the test suite validates exact parity with ops/pointops.py on
the 8-device CPU mesh (tests/test_nshard.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map               # jax >= 0.8
except ImportError:                          # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.pointops import index_points, square_distance


def make_n_mesh(n_devices=None):
    """A 1-D ('n',) mesh over the first ``n_devices`` devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), ("n",))


# -- gather by global index ------------------------------------------------

def _gather_local(points, idx, axis):
    d = lax.axis_index(axis)
    nloc = points.shape[1]
    owner = idx // nloc                                   # [B, S]
    mine = jnp.clip(idx - d * nloc, 0, nloc - 1)
    got = index_points(points, mine)                      # [B, S, C]
    got = jnp.where((owner == d)[..., None], got, 0.0)
    return lax.psum(got, axis)


def nshard_gather(points, idx, mesh, axis="n"):
    """points [B, N, C] sharded on N, idx [B, S] GLOBAL indices
    -> [B, S, C] replicated."""
    f = shard_map(functools.partial(_gather_local, axis=axis), mesh=mesh,
                  in_specs=(P(None, axis, None), P(None, None)),
                  out_specs=P(None, None, None))
    return f(points, idx.astype(jnp.int32))


# -- farthest point sampling ------------------------------------------------

def _fps_local(xyz, start_idx, npoint, axis):
    d = lax.axis_index(axis)
    B, nloc, _ = xyz.shape

    def coords_of(gidx):                                  # [B] global idx
        li = jnp.clip(gidx - d * nloc, 0, nloc - 1)
        c = jnp.take_along_axis(xyz, li[:, None, None].astype(jnp.int32),
                                axis=1)[:, 0]             # [B, 3]
        c = jnp.where((gidx // nloc == d)[:, None], c, 0.0)
        return lax.psum(c, axis)

    def body(i, carry):
        acc, dist, far = carry
        acc = lax.dynamic_update_slice(acc, far[:, None], (0, i))
        c = coords_of(far)
        dd = jnp.sum((xyz - c[:, None, :]) ** 2, axis=-1)
        dist = jnp.minimum(dist, dd)
        lval = jnp.max(dist, axis=1)                      # [B]
        lidx = jnp.argmax(dist, axis=1).astype(jnp.int32)
        vals = lax.all_gather(lval, axis)                 # [D, B]
        windev = jnp.argmax(vals, axis=0).astype(jnp.int32)
        far = lax.psum(
            jnp.where(windev == d, lidx + d * nloc,
                      jnp.int32(0)), axis).astype(jnp.int32)
        return acc, dist, far

    acc0 = jnp.zeros((B, npoint), jnp.int32)
    # derive from the sharded operand so the scan carry's varying-axes
    # annotation matches the body output (sharded over the mesh axis)
    dist0 = jnp.full_like(xyz[..., 0], jnp.inf)
    acc, _, _ = lax.fori_loop(0, npoint, body,
                              (acc0, dist0, start_idx.astype(jnp.int32)))
    return acc


def nshard_fps(xyz, npoint, mesh, axis="n", start_idx=None):
    """Exact farthest-point sampling over point-sharded clouds.

    xyz [B, N, 3] sharded on N -> GLOBAL indices [B, npoint] replicated.
    Same chain as ops/pointops.farthest_point_sample (iterated max-min,
    first-max tie-breaking).
    """
    B = xyz.shape[0]
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    f = shard_map(
        functools.partial(_fps_local, npoint=npoint, axis=axis), mesh=mesh,
        in_specs=(P(None, axis, None), P(None)), out_specs=P(None, None))
    return f(xyz, start_idx.astype(jnp.int32))


# -- set abstraction ---------------------------------------------------------

def _sg_local(new_xyz, xyz, feats, w1, b1, w2, b2, k, axis):
    B, S, _ = new_xyz.shape
    d2 = square_distance(new_xyz, xyz)                    # [B, S, nloc]
    nd, lidx = lax.top_k(-d2, k)                          # local top-k
    gx = index_points(xyz, lidx)                          # [B, S, k, 3]
    gf = index_points(feats, lidx)                        # [B, S, k, C]

    cd = lax.all_gather(-nd, axis)                        # [D, B, S, k]
    gx = lax.all_gather(gx, axis)
    gf = lax.all_gather(gf, axis)
    D = cd.shape[0]
    cd = jnp.moveaxis(cd, 0, 2).reshape(B, S, D * k)
    gx = jnp.moveaxis(gx, 0, 2).reshape(B, S, D * k, 3)
    gf = jnp.moveaxis(gf, 0, 2).reshape(B, S, D * k, gf.shape[-1])

    _, sel = lax.top_k(-cd, k)                            # global among cands
    gxs = jnp.take_along_axis(gx, sel[..., None], axis=2)
    gfs = jnp.take_along_axis(gf, sel[..., None], axis=2)
    rel = gxs - new_xyz[:, :, None, :]
    g = jnp.concatenate([rel, gfs], axis=-1)
    h = jnp.maximum(g @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    out = jnp.max(h, axis=-2)
    # Every shard computed the identical `out` from the all_gathered
    # candidates, but the vma type system can't infer that (top_k has no
    # replication rule), so re-establish the replicated type with a
    # masked psum: only shard 0 contributes its copy. Bit-exact (no
    # divide), differentiable (psum transposes; pmax does not), and the
    # cotangent still reaches every shard through the all_gather
    # transpose. Keeps check_vma=True watching the rest of the body.
    d = lax.axis_index(axis)
    return lax.psum(jnp.where(d == 0, out, 0.0), axis)


def nshard_set_abstraction(new_xyz, xyz, feats, w1, b1, w2, b2, k, mesh,
                           axis="n"):
    """Set-abstraction stage over point-sharded clouds.

    new_xyz [B, S, 3] replicated; xyz [B, N, 3] / feats [B, N, C] sharded
    on N -> [B, S, w2_out] replicated. Same neighbor set and math as the
    dense stage (ops/sg_pallas._mlp_max_from_idx over knn_indices).
    """
    f = shard_map(
        functools.partial(_sg_local, k=k, axis=axis), mesh=mesh,
        in_specs=(P(None, None, None), P(None, axis, None),
                  P(None, axis, None), P(None, None), P(None),
                  P(None, None), P(None)),
        out_specs=P(None, None, None))
    return f(new_xyz, xyz, feats, w1, b1, w2, b2)
