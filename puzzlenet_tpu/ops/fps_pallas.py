"""Fused Pallas FPS kernel (TPU).

The lax fallback (pointops.py) runs the npoint-step max-min chain as an XLA
while loop: correct, but each of the ~768 iterations pays loop/dispatch
overhead. This kernel runs the WHOLE chain in one pallas_call with the
batch on sublanes and the point axis on lanes — dist, coords and outputs
stay in VMEM for all iterations, so per-step cost is a handful of VPU ops
on [B_blk, N] tiles.

Replaces the 10x-lever hot spot of the reference (Python/GPU FPS loops,
pointnet_util.py:67-72, dataset.py:1147-1163). Numerically identical to the
lax path (same argmax tie-breaking: first max index).
"""

import functools

import jax
import jax.numpy as jnp

_B_BLK = 64  # batch rows per grid step (8 sublane tiles of f32)


def pallas_supported():
    """Pallas TPU path available on this backend?"""
    return jax.default_backend() == "tpu"


def _fps_kernel(npoint, coords_ref, start_ref, out_ref):
    # coords_ref: [3, B_blk, N] f32; start_ref: [B_blk, 1] i32;
    # out_ref: [B_blk, npoint] i32
    x = coords_ref[0]
    y = coords_ref[1]
    z = coords_ref[2]
    b, n = x.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), dimension=1)

    def body(i, carry):
        # dynamic single-lane stores aren't supported by the Mosaic
        # vector_store lowering, so the output accumulates via select
        dist, far, acc = carry                 # [b,n], [b,1] i32, [b,npoint]
        acc = jnp.where(out_cols == i, far, acc)
        onehot = (lane_ids == far).astype(x.dtype)
        cx = jnp.sum(x * onehot, axis=1, keepdims=True)
        cy = jnp.sum(y * onehot, axis=1, keepdims=True)
        cz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist, d)
        far = jnp.argmax(dist, axis=1).astype(jnp.int32)[:, None]
        return dist, far, acc

    init = (jnp.full((b, n), jnp.inf, x.dtype), start_ref[:, :],
            jnp.zeros((b, npoint), jnp.int32))
    _, _, acc = jax.lax.fori_loop(0, npoint, body, init)
    out_ref[:, :] = acc


# pl imported lazily so CPU-only environments never touch pallas at import
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz, npoint, start):
    """xyz [B, N, 3] f32, start [B] i32 -> indices [B, npoint] i32."""
    B, N, _ = xyz.shape
    coords = jnp.transpose(xyz, (2, 0, 1))          # [3, B, N]
    start2 = start.astype(jnp.int32)[:, None]       # [B, 1]

    # batch rows live on sublanes: the block must be a multiple of the f32
    # sublane tile (8) or Mosaic hits "Not implemented: Sublane broadcast"
    b_blk = min(_B_BLK, ((B + 7) // 8) * 8)
    pad_b = (-B) % b_blk
    if pad_b:
        coords = jnp.pad(coords, ((0, 0), (0, pad_b), (0, 0)))
        start2 = jnp.pad(start2, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        grid=(Bp // b_blk,),
        in_specs=[
            pl.BlockSpec((3, b_blk, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
    )(coords, start2)
    return out[:B]
