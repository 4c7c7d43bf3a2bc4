"""Fused 3-NN inverse-distance feature interpolation (Pallas TPU).

PointNet++ feature-propagation semantics (pointnet_util.py:265-315): for
every query point, find its 3 nearest source points, and pull the sources'
features with inverse-distance weights. The XLA formulation
(``lax.top_k`` over a [B, N, S] distance tensor + gather) lowers top_k to
a full sort on TPU and dominates the boundary_fp model's forward (~18 ms
of a 31 ms forward at B=64); this kernel runs the whole op per
(batch, query-block) grid step in VMEM:

  * distances computed elementwise in f32 (exact, like ops/sg_pallas.py);
  * 3 selection rounds over packed values (lane identity in the low
    mantissa bits, ops/lanered.py-style) — one plain lane min-reduce per
    neighbor, no Mosaic arg-reductions; the winner's EXACT distance is
    then read back through its one-hot (one nonzero per row);
  * the 3 gathers run as one stacked one-hot MXU matmul (bf16 fetch
    rounding only, the same rounding the SG kernel applies).

Backward is a mirror kernel routed by the forward's saved indices: feature
cotangents scatter via one-hot^T matmuls, and query/source xyz cotangents
flow through the inverse-distance weights analytically (the kNN selection
itself has zero gradient a.e.).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanered import SENTINEL, pack_ids, unpack_ids
from .pointops import index_points, square_distance

_N_BLK = 256
_INTERPRET = False
_EPS = 1e-8     # reference clamp: recip = 1 / max(d, 1e-8)


def pallas_supported(n, s):
    """Kernel-compatible shapes only — everything else takes the XLA
    fallback instead of tripping the block asserts (n must tile into
    [min(256, n)] query blocks; s rides the lane axis whole)."""
    backend_ok = _INTERPRET or jax.default_backend() == "tpu"
    blk_ok = n % 256 == 0 or (n <= 256 and n % 8 == 0)
    return backend_ok and blk_ok and s % 128 == 0 and s <= 4096


def _xla_three_nn(q_xyz, s_xyz, s_feat):
    """XLA fallback (identical math; used off-TPU and as the VJP oracle in
    tests)."""
    d = square_distance(q_xyz, s_xyz)                  # [B, N, S]
    negd, idx = lax.top_k(-d, 3)
    recip = 1.0 / jnp.maximum(-negd, _EPS)
    w = recip / jnp.sum(recip, axis=-1, keepdims=True)
    f = index_points(s_feat, idx)                      # [B, N, 3, C]
    return jnp.sum(f * w[..., None], axis=2)


def _pack(d, n_lanes):
    """Pack the lane id into the low mantissa bits (the ops/lanered.py
    contract — see pack_ids for the denormal-flush story)."""
    lanes = lax.broadcasted_iota(jnp.int32, d.shape, 1)
    return pack_ids(d, lanes, n_lanes)


def _select3(d0):
    """3 packed min-reduce rounds -> ([rows, 1] int32 idx) * 3."""
    rows, S = d0.shape
    lanes = lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    p = _pack(d0, S)
    out = []
    for _ in range(3):
        m = jnp.min(p, axis=1, keepdims=True)
        lidx = unpack_ids(m, S)
        out.append(lidx)
        p = jnp.where(lanes == lidx, jnp.float32(SENTINEL), p)
    return out


def _fwd_kernel(q_ref, sx_ref, sf_ref, out_ref, idx_ref, w_ref):
    q = q_ref[0]                      # [n_blk, 3]
    sx = sx_ref[0]                    # [S, 3]
    sf = sf_ref[0]                    # [S, C]
    rows, S = q.shape[0], sx.shape[0]

    dx = q[:, 0:1] - sx[:, 0:1].T
    dy = q[:, 1:2] - sx[:, 1:2].T
    dz = q[:, 2:3] - sx[:, 2:3].T
    d0 = dx * dx + dy * dy + dz * dz                  # [rows, S] f32 exact

    lanes = lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    idxs = _select3(d0)
    ohs = [(lanes == i) for i in idxs]
    # exact distances at the winners (one nonzero per row)
    ds = [jnp.sum(jnp.where(oh, d0, 0.0), axis=1, keepdims=True)
          for oh in ohs]
    recips = [1.0 / jnp.maximum(d, _EPS) for d in ds]
    rsum = recips[0] + recips[1] + recips[2]
    ws = [r / rsum for r in recips]

    oh = jnp.concatenate([o.astype(jnp.bfloat16) for o in ohs], axis=0)
    nb = jnp.dot(oh, sf.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)  # [3*rows, C]
    out = (ws[0] * nb[:rows] + ws[1] * nb[rows:2 * rows]
           + ws[2] * nb[2 * rows:])
    out_ref[0] = out
    idx_ref[0] = jnp.concatenate(idxs, axis=1)        # [rows, 3]
    w_ref[0] = jnp.concatenate(ws, axis=1)            # [rows, 3]


def _bwd_kernel(q_ref, sx_ref, sf_ref, idx_ref, w_ref, g_ref,
                dq_ref, dsx_ref, dsf_ref):
    j = pl.program_id(1)
    q = q_ref[0]
    sx = sx_ref[0]
    sf = sf_ref[0]
    idx = idx_ref[0]                  # [rows, 3]
    w = w_ref[0]                      # [rows, 3]
    g = g_ref[0]                      # [rows, C]
    rows, S = q.shape[0], sx.shape[0]

    @pl.when(j == 0)
    def _():
        dsx_ref[0] = jnp.zeros(dsx_ref.shape[1:], jnp.float32)
        dsf_ref[0] = jnp.zeros(dsf_ref.shape[1:], jnp.float32)

    lanes = lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    ohs = [(lanes == idx[:, i:i + 1]) for i in range(3)]
    ohf = jnp.concatenate([o.astype(jnp.bfloat16) for o in ohs], axis=0)
    nb = jnp.dot(ohf, sf.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)  # [3*rows, C]

    hi = jax.lax.Precision.HIGHEST
    # dL/dfeats: sum_i oh_i^T (w_i * g) — one stacked scatter matmul.
    # HIGHEST: these carry f32 GRADIENT VALUES (the one-hot routing is
    # exact either way, but default precision would truncate every
    # accumulated cotangent to a bf16 mantissa)
    wg = jnp.concatenate([w[:, i:i + 1] * g for i in range(3)], axis=0)
    dsf = lax.dot_general(ohf.astype(jnp.float32), wg,
                          dimension_numbers=(((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=hi)                # [S, C]

    # dL/dw_i = g . f_i ; back through w = r/sum(r), r = 1/max(d, eps)
    a = [jnp.sum(g * nb[i * rows:(i + 1) * rows], axis=1, keepdims=True)
         for i in range(3)]                           # [rows, 1] each
    wa = w[:, 0:1] * a[0] + w[:, 1:2] * a[1] + w[:, 2:3] * a[2]

    # winners' exact xyz in ONE stacked one-hot gather (one nonzero per
    # row; HIGHEST keeps the gathered coordinates bit-exact) — replaces
    # 9 masked full-[rows, S] reductions
    sxg = jnp.dot(ohf.astype(jnp.float32), sx,
                  preferred_element_type=jnp.float32,
                  precision=hi)                       # [3*rows, 3]

    dq = jnp.zeros((rows, 3), jnp.float32)
    dsx = jnp.zeros((S, 3), jnp.float32)
    for i in range(3):
        wi = w[:, i:i + 1]
        # recover d_i and r_i from geometry (exact, same formula as fwd);
        # rsum from the saved weights: r_i = w_i * rsum, so
        # dL/dd_i = -r_i^2 (a_i - wa) / rsum  (0 when clamped at eps)
        diff = q - sxg[i * rows:(i + 1) * rows]            # [rows, 3]
        d_i = jnp.sum(diff * diff, axis=1, keepdims=True)
        r_i = 1.0 / jnp.maximum(d_i, _EPS)
        # rsum = r_i / w_i (w_i > 0 always: r > 0)
        rsum = r_i / jnp.maximum(wi, 1e-30)
        dLdd = jnp.where(d_i > _EPS,
                         -(r_i * r_i) * (a[i] - wa) / rsum, 0.0)
        dq = dq + dLdd * 2.0 * diff
        contrib = dLdd * (-2.0) * diff                     # [rows, 3]
        dsx = dsx + lax.dot_general(
            ohs[i].astype(jnp.float32), contrib,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=hi)                                  # [S, 3]

    dq_ref[0] = dq
    dsx_ref[0] = dsx_ref[0] + dsx
    dsf_ref[0] = dsf_ref[0] + dsf


def _fwd_pallas(q_xyz, s_xyz, s_feat):
    B, N, _ = q_xyz.shape
    S, C = s_feat.shape[1], s_feat.shape[2]
    n_blk = min(_N_BLK, N)
    assert N % n_blk == 0, (N, n_blk)
    grid = (B, N // n_blk)
    out, idx, w = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_blk, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.int32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q_xyz, s_xyz, s_feat)
    return out, idx, w


def _bwd_pallas(q_xyz, s_xyz, s_feat, idx, w, g):
    B, N, _ = q_xyz.shape
    S, C = s_feat.shape[1], s_feat.shape[2]
    n_blk = min(_N_BLK, N)
    grid = (B, N // n_blk)
    dq, dsx, dsf = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, S, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q_xyz, s_xyz, s_feat, idx, w, g)
    return dq, dsx, dsf


@jax.custom_vjp
def three_nn_interpolate(q_xyz, s_xyz, s_feat):
    """[B, N, 3], [B, S, 3], [B, S, C] -> [B, N, C] inverse-distance 3-NN
    interpolation (PointNet++ FP, pointnet_util.py:265-315). Fused Pallas
    kernel on TPU; XLA math elsewhere."""
    if pallas_supported(q_xyz.shape[1], s_xyz.shape[1]):
        out, _, _ = _fwd_pallas(q_xyz, s_xyz, s_feat)
        return out
    return _xla_three_nn(q_xyz, s_xyz, s_feat)


def _tni_fwd(q_xyz, s_xyz, s_feat):
    if pallas_supported(q_xyz.shape[1], s_xyz.shape[1]):
        out, idx, w = _fwd_pallas(q_xyz, s_xyz, s_feat)
        return out, (q_xyz, s_xyz, s_feat, idx, w)
    out, vjp = jax.vjp(_xla_three_nn, q_xyz, s_xyz, s_feat)
    return out, (vjp,)


def _tni_bwd(res, g):
    if len(res) == 1:
        return res[0](g)
    q_xyz, s_xyz, s_feat, idx, w = res
    return _bwd_pallas(q_xyz, s_xyz, s_feat, idx, w, g)


three_nn_interpolate.defvjp(_tni_fwd, _tni_bwd)
