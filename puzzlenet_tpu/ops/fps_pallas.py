"""Fused Pallas FPS kernel (TPU), masked and unmasked.

The lax fallback (pointops.py) runs the npoint-step max-min chain as an XLA
while loop: correct, but each of the ~768 iterations pays loop/dispatch
overhead. This kernel runs the WHOLE chain in one pallas_call with the
batch on sublanes and the point axis on lanes — dist, coords and outputs
stay in VMEM for all iterations, so per-step cost is a handful of VPU ops
on [B_blk, N] tiles.

Two hot-loop design points (PERFORMANCE.md headroom #2):

* the per-step argmax runs as a two-level tournament: elementwise max
  across G static 128·k-lane chunks with chunk-id tracking, then one
  narrow cross-lane argmax — no full-width shuffle reduction;
* the winner's coordinates ride the tournament as carried operands
  (selected by the same compare masks), so the classic
  one-hot-multiply-and-reduce extraction of the centroid — three
  full-width cross-lane sums per iteration — disappears entirely.

Masking comes in through the initial distance array: invalid lanes start
at -inf and ``min`` keeps them there, so they can never win the argmax.
The same kernel therefore serves the encoder's plain FPS and the
on-device data pipeline's masked FPS over whole clouds (11k points).

Replaces the 10x-lever hot spot of the reference (Python/GPU FPS loops,
pointnet_util.py:67-72, dataset.py:1147-1163). Numerically identical to
the lax path except on exact cross-chunk distance ties, which on float
clouds only duplicated points produce (identical coordinates, so the
max-min chain is unchanged either way).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_QUANTUM = 1024   # pad N so the tournament splits into 128·k chunks
_VMEM_BUDGET = 8 * 1024 * 1024  # working-set target per grid step


_INTERPRET = False   # run the Pallas kernel in interpret mode (CPU tests)


def pallas_supported():
    """Pallas TPU path available on this backend (or interpret mode)?"""
    return _INTERPRET or jax.default_backend() == "tpu"


def _fps_kernel(npoint, coords_ref, start_ref, dinit_ref, out_ref):
    # coords_ref: [3, B_blk, N] f32; start_ref: [B_blk, 1] i32;
    # dinit_ref: [B_blk, N] f32 (+inf valid / -inf invalid);
    # out_ref: [B_blk, npoint] i32
    x = coords_ref[0]
    y = coords_ref[1]
    z = coords_ref[2]
    b, n = x.shape
    # wrapper pads n to a 128 multiple (<= 1024) or a 1024 multiple, so
    # the chunk count g always divides n into 128·k-lane chunks
    g = max(1, n // 128) if n <= 1024 else 8
    L = n // g
    lane_ids = lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)
    lanes_L = lax.broadcasted_iota(jnp.int32, (b, L), dimension=1)
    out_cols = lax.broadcasted_iota(jnp.int32, (b, npoint), dimension=1)

    # seed coordinates: one-time one-hot extraction of the start point
    start = start_ref[:, :]
    seed = (lane_ids == start).astype(x.dtype)
    fx = jnp.sum(x * seed, axis=1, keepdims=True)
    fy = jnp.sum(y * seed, axis=1, keepdims=True)
    fz = jnp.sum(z * seed, axis=1, keepdims=True)

    def body(i, carry):
        # dynamic single-lane stores aren't supported by the Mosaic
        # vector_store lowering, so the output accumulates via select
        dist, far, fx, fy, fz, acc = carry
        acc = jnp.where(out_cols == i, far, acc)
        d = (x - fx) ** 2 + (y - fy) ** 2 + (z - fz) ** 2
        dist = jnp.minimum(dist, d)   # -inf lanes (invalid) stay -inf

        # chunk tournament with coordinate carry: the same compare mask
        # that advances the running max also advances the winner's chunk
        # id and coordinates, so no post-hoc full-width extraction; the
        # merge runs as a balanced tree (critical path log2(g) merges,
        # not g serial ones)
        def leaf(gi):
            sl = slice(gi * L, (gi + 1) * L)
            return (dist[:, sl], jnp.full((b, L), gi, jnp.int32),
                    x[:, sl], y[:, sl], z[:, sl])

        def merge(a, c):
            upd = c[0] > a[0]
            return tuple(jnp.where(upd, cv, av) for av, cv in zip(a, c))

        nodes = [leaf(gi) for gi in range(g)]
        while len(nodes) > 1:
            nodes = [merge(nodes[i], nodes[i + 1])
                     for i in range(0, len(nodes) - 1, 2)] + (
                         [nodes[-1]] if len(nodes) % 2 else [])
        m, gsel, mx, my, mz = nodes[0]
        lidx = jnp.argmax(m, axis=1).astype(jnp.int32)[:, None]   # [b, 1]
        hit = lanes_L == lidx
        win_g = jnp.sum(jnp.where(hit, gsel, 0), axis=1, keepdims=True)
        far = win_g * L + lidx
        hitf = hit.astype(x.dtype)
        fx = jnp.sum(mx * hitf, axis=1, keepdims=True)
        fy = jnp.sum(my * hitf, axis=1, keepdims=True)
        fz = jnp.sum(mz * hitf, axis=1, keepdims=True)
        return dist, far, fx, fy, fz, acc

    init = (dinit_ref[:, :], start, fx, fy, fz,
            jnp.zeros((b, npoint), jnp.int32))
    _, _, _, _, _, acc = lax.fori_loop(0, npoint, body, init)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz, npoint, start, valid_mask=None):
    """xyz [B, N, 3] f32, start [B] i32, optional valid_mask [B, N] bool
    -> indices [B, npoint] i32 (masked-out points are never selected)."""
    B, N, _ = xyz.shape
    # pad the lane axis to whole 128-lane chunks (full 1024-lane quanta
    # beyond 8 chunks, so the 8-way tournament divides evenly)
    pad_n = (-N) % 128 if N <= 1024 else (-N) % _LANE_QUANTUM
    dinit = jnp.full((B, N), jnp.inf, jnp.float32)
    if valid_mask is not None:
        dinit = jnp.where(valid_mask, dinit, -jnp.inf)
    if pad_n:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad_n), (0, 0)))
        dinit = jnp.pad(dinit, ((0, 0), (0, pad_n)),
                        constant_values=-jnp.inf)
    Np = N + pad_n
    coords = jnp.transpose(xyz, (2, 0, 1))          # [3, B, Np]
    start2 = start.astype(jnp.int32)[:, None]       # [B, 1]

    # batch rows live on sublanes: the block must be a multiple of the f32
    # sublane tile (8) or Mosaic hits "Not implemented: Sublane broadcast";
    # cap the block so the 4 resident [b_blk, Np] f32 planes fit VMEM
    b_cap = max(8, _VMEM_BUDGET // (4 * Np * 4) // 8 * 8)
    b_blk = min(64, b_cap, ((B + 7) // 8) * 8)
    pad_b = (-B) % b_blk
    if pad_b:
        coords = jnp.pad(coords, ((0, 0), (0, pad_b), (0, 0)))
        start2 = jnp.pad(start2, ((0, pad_b), (0, 0)))
        dinit = jnp.pad(dinit, ((0, pad_b), (0, 0)),
                        constant_values=-jnp.inf)
    Bp = B + pad_b

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        grid=(Bp // b_blk,),
        in_specs=[
            pl.BlockSpec((3, b_blk, Np), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(coords, start2, dinit)
    return out[:B]
