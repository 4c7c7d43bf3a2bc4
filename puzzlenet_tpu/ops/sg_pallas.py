"""Fused set-abstraction kernel: kNN + gather + shared MLP + max (Pallas).

The encoder's hot path per stage is: kNN top-32 over a dense [S, N] distance
matrix, a [B, S, 32, C] neighbor gather (a 256 MB materialization at stage 1),
a two-layer pointwise MLP, and a max over neighbors
(pointnet_util.py:99-136 + model5_b.py:449-461). Dispatched separately,
top_k's sort and the gather/scatter pairs dominate the profile (~24 ms of a
43 ms encoder forward at B=64).

This kernel runs the whole stage per (batch, centroid-block) grid step with
everything resident in VMEM, in two phases:

  * selection: k iterations of tournament argmin (ops/lanered.py) +
    masking over the exact f32 distance tile — the same neighbor set as
    sorted top-k (tie order aside; ties on float clouds mean duplicated
    points with identical features, so the stage output is unchanged);
  * compute: neighbors processed in blocks of 8 — the one-hot gather and
    the two MLP layers run as 8x-taller MXU matmuls instead of 32 skinny
    ones, and the [S, 32, C] grouped tensor never exists anywhere. The
    one-hot gather is exact: one nonzero per row means no accumulation
    error, only the bf16 rounding of the fetched value (the same rounding
    every XLA-default Dense applies).

Under grad the forward also emits per-neighbor relu-support bitmasks
(one uint32 per (centroid, channel): bit k = neighbor k's pre-activation
was positive). The backward gathers by the saved indices and routes
cotangents by the saved masks + argmax indices, so it never has to
reproduce the forward's rounding — recomputed activation VALUES only
scale gradients (standard mixed-precision noise), they never flip a relu
gate or a max winner. This replaces round 1's HIGHEST-precision
fwd/bwd-recompute contract, which cost ~30% forward throughput.

Off-TPU the module falls back to the reference-shaped unfused path
(identical math).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanered import (sorted_topk, sorted_topk_supported,
                      topk_stream_init, topk_stream_next,
                      topk_stream_next2,
                      topk_stream_init_T, topk_stream_next_T,
                      topk_stream_next2_T,
                      tournament_argmin)
from .pointops import index_points, knn_indices

_S_BLK = 256
_SEL_UNROLL = None   # selection extraction-loop unroll; None = full k
                     # (Mosaic supports only 1 or full; full measured
                     # ~20% faster on the stage-1 shape)
_PIPELINE = True     # software-pipeline selection with the MXU compute:
                     # extract neighbor block r+1 while block r's gather +
                     # MLP matmuls run — the extraction chain is VPU-bound
                     # and independent of the compute chain, so Mosaic can
                     # co-issue them (identical outputs either way)
_INTERPRET = False   # run the Pallas kernels in interpret mode (CPU tests)
_LAYOUT_T = False    # transposed selection layout: distance tile held as
                     # [N, s] so each extraction round min-reduces over the
                     # SUBLANE axis (vreg-shrinking tree) instead of a
                     # full-width lane rotate chain, and the one-hot
                     # gathers contract dim0 x dim0 (the rows_dot form).
                     # Outputs are bit-identical to the row-major kernel;
                     # flip only after hardware A/B (see PERFORMANCE.md).
_LAYOUT_TS = False   # HYBRID layout: transposed selection (the cheap
                     # sublane-tree reduce of _LAYOUT_T) + ROW-MAJOR
                     # consumption (the full _LAYOUT_T's transposed
                     # [N, kb*s] one-hot contractions measured ~10 ms
                     # slower at model level — see PERFORMANCE.md).
                     # Each block's winners [kb, s] are transposed back
                     # to [s, kb] (one tiny int32 transpose per block)
                     # and the gather/MLP path is identical to the
                     # row-major pipe kernel, so outputs and saved-idx
                     # layout are bit-identical to it. Ignored when
                     # _LAYOUT_T is on; flip only after hardware A/B.
_EXTRACT2 = False    # two-winners-per-reduce extraction (lanered.
                     # topk_stream_next2 / _next2_T): one halving top-2
                     # tree replaces two serial reduces — bit-identical
                     # winners; composes with every layout (row-major,
                     # _LAYOUT_T, _LAYOUT_TS). Flip only after hardware
                     # A/B (tools/sg_ab_x2.py).
_FWD_COLLAPSED = False  # collapsed-algebra bf16 forward (inside
                     # _sg_kernel_pipe, bf16_mm only): per neighbor block,
                     # the xyz gather (f32), feats gather (bf16) and
                     # layer-1 matmul collapse into ONE one-hot matmul
                     # a1 = oh @ Z - q w1x + b1 against a precomputed
                     # projection Z = [xyz | feats] w1 held as a bf16
                     # hi/lo PAIR (f32-split), so the gathered projection
                     # is exact to ~2^-16 — the xyz-centering cancellation
                     # comes out MORE accurate than the current bf16
                     # contract (which rounds the centered gk to bf16),
                     # at ~2.4x less compute-phase MXU work. The f32
                     # forward (parity contract, ~1e-15 vs reference) is
                     # untouched. Flip only after hardware A/B
                     # (tools/sg_bwd_ab.py --fwd).
_BWD_COLLAPSED = True   # collapsed-algebra backward (_sg_bwd_kernel_c):
                     # folds the one-hot gather into MLP layer 1 via
                     # associativity (a1 = oh @ (M w1) - q w1x + b1) and
                     # the input-grad scatter into one accumulated
                     # contraction (dcat = (sum_b oh_b^T da1_b) w1^T),
                     # cutting the per-block MXU work from 8 wide
                     # matmuls (incl. the f32 xyz gather) to 2. Values
                     # recomputed this way carry different rounding —
                     # allowed by the routing contract (masks/argmax are
                     # SAVED; rounding scales gradients, never re-routes
                     # them). Row-major idx layout only, and ACTIVE ONLY
                     # under bf16_mm (see _fused_backward): the round-5
                     # hardware A/B (TRG/sg_bwd_ab.json) measured
                     # 1.24x/1.12x there vs ~1.0x on f32 — the backward
                     # is one-hot/VPU-bound (f32 and bf16 old kernels
                     # time identically), so f32 keeps the exact-grad
                     # per-term kernel.


def pallas_supported():
    return _INTERPRET or jax.default_backend() == "tpu"


def _neighbor_block(k):
    """Largest power-of-two block size (<= 8) dividing k."""
    for kb in (8, 4, 2):
        if k % kb == 0:
            return kb
    return 1


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mlp2(gk, w1, b1, w2, b2, mmdt):
    """The shared two-layer MLP of the stage at matmul dtype ``mmdt``
    (f32 accumulation either way). bf16 operands run the MXU at full
    rate — the no-grad inference primal opts in via ``bf16_mm``; the
    under-grad forward stays f32 so training numerics are unchanged."""
    a1 = _dot(gk.astype(mmdt), w1.astype(mmdt)) + b1
    h1 = jnp.maximum(a1, 0.0)
    a2 = _dot(h1.astype(mmdt), w2.astype(mmdt)) + b2
    hv = jnp.maximum(a2, 0.0)
    return a1, a2, hv


def _onehots(idxmat, kcols, lane, k0, kb, dtype):
    """One-hot rows for neighbors k0..k0+kb-1, stacked on sublanes:
    [kb*s, n]."""
    ohs = []
    for j in range(kb):
        sel = jnp.sum(jnp.where(kcols == k0 + j, idxmat, 0), axis=1,
                      keepdims=True)                     # [s, 1]
        ohs.append((lane == sel).astype(dtype))
    return jnp.concatenate(ohs, axis=0)


def _sg_kernel(k, kb, with_masks, q_ref, xyz_ref, feats_ref, w1_ref,
               b1_ref, w2_ref, b2_ref, out_ref, idx_ref, amax_ref,
               *mask_refs, mmdt=jnp.float32):
    q = q_ref[0]                      # [s, 3]
    xyz = xyz_ref[0]                  # [N, 3]
    feats = feats_ref[0]              # [N, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    s, n = q.shape[0], xyz.shape[0]
    h1n, h2n = w1.shape[1], w2.shape[1]

    dx = q[:, 0:1] - xyz[:, 0:1].T
    dy = q[:, 1:2] - xyz[:, 1:2].T
    dz = q[:, 2:3] - xyz[:, 2:3].T
    d0 = dx * dx + dy * dy + dz * dz            # [s, n] f32, exact

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (s, k), 1)

    # phase A — selection only. Preferred: one cross-chunk column sort +
    # k cheap head-row extractions (ops/lanered.py sorted_topk). Fallback
    # for lane counts the sorter can't chunk: k tournament-argmin + mask
    # rounds over the full tile.
    if sorted_topk_supported(n):
        idx_acc = sorted_topk(d0, k, unroll=_SEL_UNROLL or k)
    else:
        def sel_body(i, carry):
            d, idx_acc = carry
            sel = tournament_argmin(d)                           # [s, 1]
            idx_acc = jnp.where(kcols == i, sel, idx_acc)
            d = jnp.where(lane == sel, jnp.inf, d)
            return d, idx_acc

        _, idx_acc = lax.fori_loop(
            0, k, sel_body, (d0, jnp.zeros((s, k), jnp.int32)))
    # idx/amax exist for the backward's routing only; the no-grad primal
    # writes tiny zero tiles and skips the argmax tracking entirely
    if with_masks:
        idx_ref[0] = idx_acc
    else:
        idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)

    # phase B — gather + MLP + max over neighbor blocks of kb. A fori_loop
    # (not a Python unroll) keeps only ONE block's intermediates live in
    # scoped VMEM; unrolled, the stage-2 shapes blow the 64 MB limit.
    # xyz is gathered with an f32 one-hot matmul and centered in f32:
    # casting ABSOLUTE coordinates to bf16 before centering loses up to
    # ~0.004 absolute (~10-20% RELATIVE error on near-centroid rel-xyz),
    # while bf16 rounding AFTER centering matches what any bf16 Dense
    # operand pays. Features stay bf16-gathered (one operand rounding,
    # same as the fallback path's Dense).
    catf = feats.astype(jnp.bfloat16)
    qs = jnp.concatenate([q] * kb, axis=0)                   # [kb*s, 3]

    def blk_body(blk, carry):
        acc, amax, m1, m2 = carry
        k0 = blk * kb
        oh = _onehots(idx_acc, kcols, lane, k0, kb, jnp.float32)
        nbx = _dot(oh, xyz)                                  # [kb*s, 3]
        nbf = _dot(oh.astype(jnp.bfloat16), catf)            # [kb*s, C]
        gk = jnp.concatenate([nbx - qs, nbf], axis=1)
        a1, a2, hv = _mlp2(gk, w1, b1, w2, b2, mmdt)
        for j in range(kb):
            rows = slice(j * s, (j + 1) * s)
            hj = hv[rows]
            if with_masks:
                # first max wins (like lax reduce argmax): backward routes
                # by this saved index, immune to recompute rounding
                amax = jnp.where(hj > acc, k0 + j, amax)
                bit = (jnp.uint32(1) << (k0 + j).astype(jnp.uint32))
                m1 = m1 | jnp.where(a1[rows] > 0, bit, jnp.uint32(0))
                m2 = m2 | jnp.where(a2[rows] > 0, bit, jnp.uint32(0))
            acc = jnp.maximum(acc, hj)
        return acc, amax, m1, m2

    mask_shape = (s, h1n) if with_masks else (1, 1)
    mask_shape2 = (s, h2n) if with_masks else (1, 1)
    amax_shape = (s, h2n) if with_masks else (1, 1)
    acc, amax, m1, m2 = lax.fori_loop(
        0, k // kb, blk_body,
        (jnp.full((s, h2n), -jnp.inf, jnp.float32),
         jnp.zeros(amax_shape, jnp.int32),
         jnp.zeros(mask_shape, jnp.uint32),
         jnp.zeros(mask_shape2, jnp.uint32)))
    out_ref[0] = acc
    if with_masks:
        amax_ref[0] = amax
        mask_refs[0][0] = m1
        mask_refs[1][0] = m2
    else:
        amax_ref[0] = jnp.zeros(amax_ref.shape[1:], jnp.int32)


def _sg_kernel_pipe(k, kb, with_masks, q_ref, xyz_ref, feats_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, out_ref, idx_ref, amax_ref,
                    *mask_refs, mmdt=jnp.float32):
    """Same stage as :func:`_sg_kernel`, software-pipelined: the selection
    stream (ops/lanered.py topk_stream_*) yields one neighbor block of
    winners per loop iteration, and the loop body both computes block r
    (one-hot gather + MLP + max on the MXU) and extracts block r+1's
    winners (pure VPU) — two independent dataflow chains Mosaic can
    interleave. Outputs are identical to the unpipelined kernel."""
    q = q_ref[0]                      # [s, 3]
    xyz = xyz_ref[0]                  # [N, 3]
    feats = feats_ref[0]              # [N, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    s, n = q.shape[0], xyz.shape[0]
    h1n, h2n = w1.shape[1], w2.shape[1]

    dx = q[:, 0:1] - xyz[:, 0:1].T
    dy = q[:, 1:2] - xyz[:, 1:2].T
    dz = q[:, 2:3] - xyz[:, 2:3].T
    d0 = dx * dx + dy * dy + dz * dz            # [s, n] f32, exact

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (s, k), 1)

    cols, meta = topk_stream_init(d0)
    lanesL = lax.broadcasted_iota(jnp.int32, (s, meta[1]), 1)
    stream_next = topk_stream_next2 if _EXTRACT2 else topk_stream_next
    cols, winners = stream_next(cols, lanesL, meta, kb)

    # xyz is gathered with an f32 one-hot matmul and centered in f32:
    # casting ABSOLUTE coordinates to bf16 before centering loses up to
    # ~0.004 absolute (~10-20% RELATIVE error on near-centroid rel-xyz),
    # while bf16 rounding AFTER centering matches what any bf16 Dense
    # operand pays. Features stay bf16-gathered (one operand rounding,
    # same as the fallback path's Dense).
    catf = feats.astype(jnp.bfloat16)
    qs = jnp.concatenate([q] * kb, axis=0)                   # [kb*s, 3]

    fwd_collapsed = _FWD_COLLAPSED and mmdt == jnp.bfloat16
    if fwd_collapsed:
        # collapsed bf16 compute phase (_FWD_COLLAPSED): precompute the
        # per-point layer-1 projection Z = [xyz | feats] w1 ONCE (tiny
        # [n, c_in] x [c_in, H]) with the xyz rows hi/lo-split so their
        # bf16 products reconstruct the f32 coordinates, and hold Z
        # itself as a bf16 hi/lo pair — the per-block gather+layer-1 then
        # costs ONE [kb*s, n] x [n, 2H] bf16 matmul whose halves sum to
        # Z[winner] exact to ~2^-16, replacing the f32 xyz gather + bf16
        # feats gather + layer-1 matmul. Centering moves outside the
        # one-hot product: a1 = Z[winner] - q w1x + b1 with the SAME
        # bf16-rounded w1x on both sides of the cancellation.
        xyzhi = xyz.astype(jnp.bfloat16).astype(jnp.float32)
        xyzlo = xyz - xyzhi
        Mhl = jnp.concatenate([xyzhi, xyzlo, catf.astype(jnp.float32)],
                              axis=1)                        # [n, 6+C]
        w1e = jnp.concatenate([w1[:3], w1[:3], w1[3:]], axis=0)
        Zf = _dot(Mhl.astype(jnp.bfloat16), w1e.astype(jnp.bfloat16))
        Zhi = Zf.astype(jnp.bfloat16)
        Zlo = (Zf - Zhi.astype(jnp.float32)).astype(jnp.bfloat16)
        ZHL = jnp.concatenate([Zhi, Zlo], axis=1)            # [n, 2H] bf16
        w1x = w1[:3, :].astype(jnp.bfloat16).astype(jnp.float32)
        qprojs = jnp.concatenate([_dot(q, w1x)] * kb, axis=0) - b1

    def consume_block(k0, winners, idx_acc, acc, amax, m1, m2):
        """Gather + MLP + max for one block given its decoded winner
        indices [s, kb]; k0 may be traced (loop) or static (epilogue)."""
        ohs = []
        oh_dt = jnp.bfloat16 if fwd_collapsed else jnp.float32
        for j in range(kb):
            sel = winners[:, j:j + 1]                        # [s, 1]
            if with_masks:       # saved for the backward's routing only
                idx_acc = jnp.where(kcols == k0 + j, sel, idx_acc)
            ohs.append((lane == sel).astype(oh_dt))
        oh = jnp.concatenate(ohs, axis=0)                    # [kb*s, n]
        if fwd_collapsed:
            zz = _dot(oh, ZHL)                               # [kb*s, 2H]
            h1n = w1.shape[1]
            a1 = zz[:, :h1n] + zz[:, h1n:] - qprojs
            h1 = jnp.maximum(a1, 0.0)
            a2 = _dot(h1.astype(mmdt), w2.astype(mmdt)) + b2
            hv = jnp.maximum(a2, 0.0)
        else:
            nbx = _dot(oh, xyz)                              # [kb*s, 3]
            nbf = _dot(oh.astype(jnp.bfloat16), catf)        # [kb*s, C]
            gk = jnp.concatenate([nbx - qs, nbf], axis=1)
            a1, a2, hv = _mlp2(gk, w1, b1, w2, b2, mmdt)
        for j in range(kb):
            rows = slice(j * s, (j + 1) * s)
            hj = hv[rows]
            kj = k0 + j
            if with_masks:
                amax = jnp.where(hj > acc, kj, amax)
                bit = (jnp.uint32(1)
                       << jnp.asarray(kj, jnp.int32).astype(jnp.uint32))
                m1 = m1 | jnp.where(a1[rows] > 0, bit, jnp.uint32(0))
                m2 = m2 | jnp.where(a2[rows] > 0, bit, jnp.uint32(0))
            acc = jnp.maximum(acc, hj)
        return idx_acc, acc, amax, m1, m2

    mask_shape = (s, h1n) if with_masks else (1, 1)
    mask_shape2 = (s, h2n) if with_masks else (1, 1)
    init = (cols, winners,
            jnp.zeros((s, k) if with_masks else (1, 1), jnp.int32),
            jnp.full((s, h2n), -jnp.inf, jnp.float32),
            jnp.zeros((s, h2n) if with_masks else (1, 1), jnp.int32),
            jnp.zeros(mask_shape, jnp.uint32),
            jnp.zeros(mask_shape2, jnp.uint32))

    def blk_body(blk, carry):
        cols, winners, idx_acc, acc, amax, m1, m2 = carry
        idx_acc, acc, amax, m1, m2 = consume_block(
            blk * kb, winners, idx_acc, acc, amax, m1, m2)
        cols, winners = stream_next(cols, lanesL, meta, kb)
        return (cols, winners, idx_acc, acc, amax, m1, m2)

    nblk = k // kb
    _, winners, idx_acc, acc, amax, m1, m2 = lax.fori_loop(
        0, nblk - 1, blk_body, init)
    idx_acc, acc, amax, m1, m2 = consume_block(
        (nblk - 1) * kb, winners, idx_acc, acc, amax, m1, m2)

    out_ref[0] = acc
    if with_masks:
        idx_ref[0] = idx_acc
        amax_ref[0] = amax
        mask_refs[0][0] = m1
        mask_refs[1][0] = m2
    else:
        idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)
        amax_ref[0] = jnp.zeros(amax_ref.shape[1:], jnp.int32)


def _sg_kernel_pipe_T(k, kb, with_masks, q_ref, xyz_ref, feats_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, out_ref, idx_ref, amax_ref,
                      *mask_refs, mmdt=jnp.float32):
    """Transposed-selection twin of :func:`_sg_kernel_pipe` (_LAYOUT_T).

    The distance tile is built TRANSPOSED ([N, s]) so the extraction
    stream's per-round reduction runs over the sublane axis
    (ops/lanered.py topk_stream_*_T — a vreg-shrinking tree instead of a
    full-width lane rotate chain), and the one-hot gathers are built
    transposed ([N, kb*s]) and contracted dim0 x dim0 — the same
    dot_general form the backward's rows_dot uses, natively lowered by
    Mosaic. Neighbor sets, MLP math and outputs are bit-identical to the
    row-major kernel; the saved routing indices come out as idxT [k, s]
    (the backward consumes either layout)."""
    q = q_ref[0]                      # [s, 3]
    xyz = xyz_ref[0]                  # [N, 3]
    feats = feats_ref[0]              # [N, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    s, n = q.shape[0], xyz.shape[0]
    h1n, h2n = w1.shape[1], w2.shape[1]

    dx = xyz[:, 0:1] - q[:, 0:1].T
    dy = xyz[:, 1:2] - q[:, 1:2].T
    dz = xyz[:, 2:3] - q[:, 2:3].T
    d0T = dx * dx + dy * dy + dz * dz           # [n, s] f32, exact

    subs_n = lax.broadcasted_iota(jnp.int32, (n, s), 0)
    krows = lax.broadcasted_iota(jnp.int32, (k, s), 0)

    cols, meta = topk_stream_init_T(d0T)
    subsL = lax.broadcasted_iota(jnp.int32, (meta[1], s), 0)
    stream_next_T = topk_stream_next2_T if _EXTRACT2 else topk_stream_next_T
    cols, winners = stream_next_T(cols, subsL, meta, kb)

    # gather precision contract identical to the row-major kernel: xyz via
    # an f32 one-hot contraction and centered in f32; features bf16
    catf = feats.astype(jnp.bfloat16)
    qs = jnp.concatenate([q] * kb, axis=0)                   # [kb*s, 3]

    def tdot(ohT, vals, dtype):
        return lax.dot_general(ohT.astype(dtype), vals.astype(dtype),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def consume_block(k0, winners, idxT_acc, acc, amax, m1, m2):
        """winners [kb, s]; k0 may be traced (loop) or static (epilogue)."""
        ohs = []
        for j in range(kb):
            sel = winners[j:j + 1]                           # [1, s]
            if with_masks:
                idxT_acc = jnp.where(krows == k0 + j, sel, idxT_acc)
            ohs.append((subs_n == sel).astype(jnp.float32))  # [n, s]
        ohT = jnp.concatenate(ohs, axis=1)                   # [n, kb*s]
        nbx = tdot(ohT, xyz, jnp.float32)                    # [kb*s, 3]
        nbf = tdot(ohT, catf, jnp.bfloat16)                  # [kb*s, C]
        gk = jnp.concatenate([nbx - qs, nbf], axis=1)
        a1, a2, hv = _mlp2(gk, w1, b1, w2, b2, mmdt)
        for j in range(kb):
            rows = slice(j * s, (j + 1) * s)
            hj = hv[rows]
            kj = k0 + j
            if with_masks:
                amax = jnp.where(hj > acc, kj, amax)
                bit = (jnp.uint32(1)
                       << jnp.asarray(kj, jnp.int32).astype(jnp.uint32))
                m1 = m1 | jnp.where(a1[rows] > 0, bit, jnp.uint32(0))
                m2 = m2 | jnp.where(a2[rows] > 0, bit, jnp.uint32(0))
            acc = jnp.maximum(acc, hj)
        return idxT_acc, acc, amax, m1, m2

    mask_shape = (s, h1n) if with_masks else (1, 1)
    mask_shape2 = (s, h2n) if with_masks else (1, 1)
    init = (cols, winners,
            jnp.zeros((k, s) if with_masks else (1, 1), jnp.int32),
            jnp.full((s, h2n), -jnp.inf, jnp.float32),
            jnp.zeros((s, h2n) if with_masks else (1, 1), jnp.int32),
            jnp.zeros(mask_shape, jnp.uint32),
            jnp.zeros(mask_shape2, jnp.uint32))

    def blk_body(blk, carry):
        cols, winners, idxT_acc, acc, amax, m1, m2 = carry
        idxT_acc, acc, amax, m1, m2 = consume_block(
            blk * kb, winners, idxT_acc, acc, amax, m1, m2)
        cols, winners = stream_next_T(cols, subsL, meta, kb)
        return (cols, winners, idxT_acc, acc, amax, m1, m2)

    nblk = k // kb
    _, winners, idxT_acc, acc, amax, m1, m2 = lax.fori_loop(
        0, nblk - 1, blk_body, init)
    idxT_acc, acc, amax, m1, m2 = consume_block(
        (nblk - 1) * kb, winners, idxT_acc, acc, amax, m1, m2)

    out_ref[0] = acc
    if with_masks:
        idx_ref[0] = idxT_acc
        amax_ref[0] = amax
        mask_refs[0][0] = m1
        mask_refs[1][0] = m2
    else:
        idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)
        amax_ref[0] = jnp.zeros(amax_ref.shape[1:], jnp.int32)


def _sg_kernel_pipe_TS(k, kb, with_masks, q_ref, xyz_ref, feats_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, out_ref, idx_ref, amax_ref,
                       *mask_refs, mmdt=jnp.float32):
    """Hybrid of :func:`_sg_kernel_pipe` and :func:`_sg_kernel_pipe_T`
    (_LAYOUT_TS): selection runs TRANSPOSED — the distance tile is built
    [N, s] and each extraction round min-reduces over the SUBLANE axis, a
    vreg-shrinking tree (~L/8 + log2(8) combines) instead of the row-major
    head-row's full-width lane rotate chain (log2(L) shuffle stages over
    every vreg) — while the gather/MLP/max compute stays ROW-MAJOR: each
    block's decoded winners [kb, s] are transposed to [s, kb] (one small
    int32 transpose per block) and consumed exactly like the row-major
    pipe kernel, avoiding the [N, kb*s] transposed one-hot contractions
    that made the full _LAYOUT_T slower at model level. Neighbor sets,
    MLP math, outputs AND the saved [s, k] routing-idx layout are
    bit-identical to the row-major kernel (same packing bits, same
    (sublane, chunk) = (lane, chunk) tie rule)."""
    q = q_ref[0]                      # [s, 3]
    xyz = xyz_ref[0]                  # [N, 3]
    feats = feats_ref[0]              # [N, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    s, n = q.shape[0], xyz.shape[0]
    h1n, h2n = w1.shape[1], w2.shape[1]

    dx = xyz[:, 0:1] - q[:, 0:1].T
    dy = xyz[:, 1:2] - q[:, 1:2].T
    dz = xyz[:, 2:3] - q[:, 2:3].T
    d0T = dx * dx + dy * dy + dz * dz           # [n, s] f32, exact

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (s, k), 1)

    cols, meta = topk_stream_init_T(d0T)
    subsL = lax.broadcasted_iota(jnp.int32, (meta[1], s), 0)
    stream_next_T = topk_stream_next2_T if _EXTRACT2 else topk_stream_next_T

    def next_block(cols):
        cols, winnersT = stream_next_T(cols, subsL, meta, kb)
        return cols, jnp.transpose(winnersT)                 # [s, kb]

    cols, winners = next_block(cols)

    # gather precision contract identical to the row-major kernel: xyz via
    # an f32 one-hot matmul and centered in f32; features bf16
    catf = feats.astype(jnp.bfloat16)
    qs = jnp.concatenate([q] * kb, axis=0)                   # [kb*s, 3]

    def consume_block(k0, winners, idx_acc, acc, amax, m1, m2):
        """Identical to the row-major pipe kernel's consume_block."""
        ohs = []
        for j in range(kb):
            sel = winners[:, j:j + 1]                        # [s, 1]
            if with_masks:
                idx_acc = jnp.where(kcols == k0 + j, sel, idx_acc)
            ohs.append((lane == sel).astype(jnp.float32))
        oh = jnp.concatenate(ohs, axis=0)                    # [kb*s, n]
        nbx = _dot(oh, xyz)                                  # [kb*s, 3]
        nbf = _dot(oh.astype(jnp.bfloat16), catf)            # [kb*s, C]
        gk = jnp.concatenate([nbx - qs, nbf], axis=1)
        a1, a2, hv = _mlp2(gk, w1, b1, w2, b2, mmdt)
        for j in range(kb):
            rows = slice(j * s, (j + 1) * s)
            hj = hv[rows]
            kj = k0 + j
            if with_masks:
                amax = jnp.where(hj > acc, kj, amax)
                bit = (jnp.uint32(1)
                       << jnp.asarray(kj, jnp.int32).astype(jnp.uint32))
                m1 = m1 | jnp.where(a1[rows] > 0, bit, jnp.uint32(0))
                m2 = m2 | jnp.where(a2[rows] > 0, bit, jnp.uint32(0))
            acc = jnp.maximum(acc, hj)
        return idx_acc, acc, amax, m1, m2

    mask_shape = (s, h1n) if with_masks else (1, 1)
    mask_shape2 = (s, h2n) if with_masks else (1, 1)
    init = (cols, winners,
            jnp.zeros((s, k) if with_masks else (1, 1), jnp.int32),
            jnp.full((s, h2n), -jnp.inf, jnp.float32),
            jnp.zeros((s, h2n) if with_masks else (1, 1), jnp.int32),
            jnp.zeros(mask_shape, jnp.uint32),
            jnp.zeros(mask_shape2, jnp.uint32))

    def blk_body(blk, carry):
        cols, winners, idx_acc, acc, amax, m1, m2 = carry
        idx_acc, acc, amax, m1, m2 = consume_block(
            blk * kb, winners, idx_acc, acc, amax, m1, m2)
        cols, winners = next_block(cols)
        return (cols, winners, idx_acc, acc, amax, m1, m2)

    nblk = k // kb
    _, winners, idx_acc, acc, amax, m1, m2 = lax.fori_loop(
        0, nblk - 1, blk_body, init)
    idx_acc, acc, amax, m1, m2 = consume_block(
        (nblk - 1) * kb, winners, idx_acc, acc, amax, m1, m2)

    out_ref[0] = acc
    if with_masks:
        idx_ref[0] = idx_acc
        amax_ref[0] = amax
        mask_refs[0][0] = m1
        mask_refs[1][0] = m2
    else:
        idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)
        amax_ref[0] = jnp.zeros(amax_ref.shape[1:], jnp.int32)


def _fused_forward(new_xyz, xyz, feats, w1, b1, w2, b2, k, with_masks,
                   bf16_mm=False):
    """``with_masks=True`` (the under-grad path) additionally emits the
    relu-support bitmasks the backward kernel routes gradients by.
    ``bf16_mm`` runs the two MLP matmuls with bf16 operands (f32
    accumulation) — ~4x MXU rate; see _mlp2."""
    B, S, _ = new_xyz.shape
    N, C = feats.shape[1], feats.shape[2]
    H, H2 = w1.shape[1], w2.shape[1]
    s_blk = min(_S_BLK, S)
    assert S % s_blk == 0, (S, s_blk)
    # relu-support masks pack neighbor j into bit j of a uint32; a shift
    # of >= 32 silently wraps, so the fused path is limited to k <= 32
    assert k <= 32, f"fused set abstraction supports k <= 32, got {k}"
    b1r = b1.reshape(1, H)
    b2r = b2.reshape(1, H2)

    grid = (B, S // s_blk)
    out_specs = [
        pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, S, H2), jnp.float32),
    ]
    layout_t = _LAYOUT_T and _PIPELINE and sorted_topk_supported(N)
    if with_masks:
        # idx/amax are backward-routing artifacts: full-size only under
        # grad; the no-grad primal gets (1, 1, 1) dummies and the kernels
        # skip the tracking compute + HBM writes (~21 MB/call at stage 1)
        # (transposed layout saves idx as [B, k, S] — see _sg_kernel_pipe_T)
        out_specs += [
            pl.BlockSpec((1, k, s_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM) if layout_t else
            pl.BlockSpec((1, s_blk, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, k, S) if layout_t else (B, S, k),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, S, H2), jnp.int32),
        ]
    else:
        # minimal MOSAIC-legal tile, not (1,1,1): scalar output blocks
        # are rejected on hardware (CLAUDE.md Pallas rules)
        out_specs += [
            pl.BlockSpec((1, 8, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
        ]
    if with_masks:
        out_specs += [
            pl.BlockSpec((1, s_blk, H), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, S, H), jnp.uint32),
            jax.ShapeDtypeStruct((B, S, H2), jnp.uint32),
        ]

    if layout_t:
        kernel = _sg_kernel_pipe_T
    elif _LAYOUT_TS and _PIPELINE and sorted_topk_supported(N):
        kernel = _sg_kernel_pipe_TS      # row-major outputs/specs
    elif _PIPELINE and sorted_topk_supported(N):
        kernel = _sg_kernel_pipe
    else:
        kernel = _sg_kernel
    mmdt = jnp.bfloat16 if bf16_mm else jnp.float32
    res = pl.pallas_call(
        functools.partial(kernel, k, _neighbor_block(k), with_masks,
                          mmdt=mmdt),
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
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(new_xyz, xyz, feats, w1, b1r, w2, b2r)
    return res


def _sg_bwd_kernel(k, kb, layout_t, q_ref, xyz_ref, feats_ref, w1_ref,
                   b1_ref, w2_ref, idx_ref, amax_ref, m1_ref, m2_ref,
                   g_ref, dq_ref, dcat_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref, mmdt=jnp.float32):
    """Backward of the fused stage. Gradient routing is fully determined
    by the forward's saved artifacts:
      * max backward: cotangent routed by the saved argmax-k index;
      * relu backward: gates taken from the saved support bitmasks;
      * feats/xyz cotangents scattered via one-hot^T MXU matmuls;
      * dW/db accumulated across the whole grid (single revisited block).
    Recomputed activations only provide VALUES (h1 for dw2, gk for dw1),
    where rounding is ordinary mixed-precision noise.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    xyz = xyz_ref[0]
    feats = feats_ref[0]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2 = w2_ref[:, :]        # b2 is NOT an input: a2 is never recomputed
    idxmat = idx_ref[0]                    # [s, K] ([K, s] if layout_t)
    amax = amax_ref[0]                     # [s, H2] argmax neighbor index
    m1 = m1_ref[0]                         # [s, H]  relu-support bits
    m2 = m2_ref[0]                         # [s, H2]
    g = g_ref[0]                           # [s, H2]
    s, n = q.shape[0], xyz.shape[0]

    if layout_t:
        subs_n = lax.broadcasted_iota(jnp.int32, (n, s), 0)
        krows = lax.broadcasted_iota(jnp.int32, (k, s), 0)
    else:
        lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
        kcols = lax.broadcasted_iota(jnp.int32, (s, k), 1)
    catf = feats.astype(jnp.bfloat16)   # xyz gathers in f32 — see fwd
    qs = jnp.concatenate([q] * kb, axis=0)

    @pl.when(j == 0)
    def _():
        dcat_ref[0] = jnp.zeros(dcat_ref.shape[1:], jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw1_ref[:, :] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[:, :] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[:, :] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:, :] = jnp.zeros(db2_ref.shape, jnp.float32)

    def rows_dot(a, b):
        """[R, X]^T . [R, Y] -> [X, Y] (contract the stacked rows)."""
        return lax.dot_general(a.astype(mmdt), b.astype(mmdt),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def stack_k(build):
        return jnp.concatenate([build(j) for j in range(kb)], axis=0)

    def tdot(ohT, vals, dtype):
        return lax.dot_general(ohT.astype(dtype), vals.astype(dtype),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def blk_body(blk, carry):
        dq, dcat, dw1, db1, dw2, db2 = carry
        k0 = blk * kb
        if layout_t:
            # transposed one-hots + dim0 x dim0 contractions (see
            # _sg_kernel_pipe_T); same gather values, same rounding
            ohs = []
            for jj in range(kb):
                sel = jnp.sum(jnp.where(krows == k0 + jj, idxmat, 0),
                              axis=0, keepdims=True)       # [1, s]
                ohs.append((subs_n == sel).astype(jnp.float32))
            oh = jnp.concatenate(ohs, axis=1)              # [n, kb*s]
            nbx = tdot(oh, xyz, jnp.float32)               # [kb*s, 3]
            nbf = tdot(oh, catf, jnp.bfloat16)             # [kb*s, C]
        else:
            oh = _onehots(idxmat, kcols, lane, k0, kb, jnp.float32)
            nbx = _dot(oh, xyz)                            # [kb*s, 3]
            nbf = _dot(oh.astype(jnp.bfloat16), catf)      # [kb*s, C]
        gk = jnp.concatenate([nbx - qs, nbf], axis=1)
        a1 = _dot(gk.astype(mmdt), w1.astype(mmdt)) + b1
        bit1 = stack_k(lambda jj: ((m1 >> (k0 + jj).astype(jnp.uint32))
                                   & jnp.uint32(1)) > 0)  # [kb*s, H]
        h1 = jnp.where(bit1, a1, 0.0)
        dh2 = stack_k(lambda jj: jnp.where(amax == k0 + jj, g, 0.0))
        bit2 = stack_k(lambda jj: ((m2 >> (k0 + jj).astype(jnp.uint32))
                                   & jnp.uint32(1)) > 0)
        da2 = jnp.where(bit2, dh2, 0.0)
        dw2 = dw2 + rows_dot(h1, da2)                    # [H, H2]
        db2 = db2 + jnp.sum(da2, axis=0, keepdims=True)
        dh1 = lax.dot_general(da2.astype(mmdt), w2.astype(mmdt),
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        da1 = jnp.where(bit1, dh1, 0.0)
        dw1 = dw1 + rows_dot(gk, da1)                    # [c_in, H]
        db1 = db1 + jnp.sum(da1, axis=0, keepdims=True)
        dgk = lax.dot_general(da1.astype(mmdt), w1.astype(mmdt),
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        for jj in range(kb):
            dq = dq - dgk[jj * s:(jj + 1) * s, :3]
        if layout_t:
            dcat = dcat + lax.dot_general(                # [n, c_in]
                oh.astype(mmdt), dgk.astype(mmdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dcat = dcat + rows_dot(oh, dgk)              # [n, c_in]
        return dq, dcat, dw1, db1, dw2, db2

    dq, dcat, dw1, db1, dw2, db2 = lax.fori_loop(
        0, k // kb, blk_body,
        (jnp.zeros((s, 3), jnp.float32),
         jnp.zeros((n, 3 + catf.shape[1]), jnp.float32),
         jnp.zeros(dw1_ref.shape, jnp.float32),
         jnp.zeros(db1_ref.shape, jnp.float32),
         jnp.zeros(dw2_ref.shape, jnp.float32),
         jnp.zeros(db2_ref.shape, jnp.float32)))

    dq_ref[0] = dq
    dcat_ref[0] = dcat_ref[0] + dcat
    dw1_ref[:, :] = dw1_ref[:, :] + dw1
    db1_ref[:, :] = db1_ref[:, :] + db1
    dw2_ref[:, :] = dw2_ref[:, :] + dw2
    db2_ref[:, :] = db2_ref[:, :] + db2


def _sg_bwd_kernel_c(k, kb, layout_t, q_ref, xyz_ref, feats_ref, w1_ref,
                     b1_ref, w2_ref, idx_ref, amax_ref, m1_ref, m2_ref,
                     g_ref, dq_ref, dcat_ref, dw1_ref, db1_ref, dw2_ref,
                     db2_ref, mmdt=jnp.float32):
    """Collapsed-algebra backward (_BWD_COLLAPSED) — same routing, fewer
    and narrower MXU contractions than :func:`_sg_bwd_kernel`.

    The straightforward backward re-gathers neighbors (two one-hot
    matmuls, one of them f32 for the xyz centering contract), recomputes
    a1, and scatters dgk back through a third one-hot matmul — per
    neighbor block, three [kb*s, n]-wide passes plus five narrow ones.
    This kernel uses two identities instead:

      * gather-into-MLP:  a1 = oh @ (M w1) - q w1[:3] + b1  with
        M = [xyz | bf16(feats)] — ONE wide matmul per block against the
        tiny precomputed projection Z = M w1 (the xyz gather, feats
        gather and layer-1 matmul collapse; the centering term q w1[:3]
        moves outside the one-hot product);
      * scatter-through-w1: sum_b oh_b^T (da1_b w1^T) =
        (sum_b oh_b^T da1_b) w1^T — accumulate U = sum_b oh_b^T da1_b
        (ONE wide matmul per block) and apply w1^T / M^T once after the
        loop. dw1 = M^T U - [q^T sum_j da1; 0] and
        dq = -(sum_j da1) w1[:3]^T follow from gk = oh M - [q | 0].

    Per block that leaves a1 (oh @ Z) and U (+= oh^T da1) as the only
    wide contractions, both at mmdt rate — the f32 xyz-gather pass is
    gone entirely. Recomputed VALUES (h1 for dw2, the collapsed a1)
    carry different rounding than the forward's; the routing contract
    makes that safe (saved bitmasks/argmax route, rounding only scales).
    The post-loop reductions (M^T U, q-corrections) run in f32: dw1's
    xyz rows subtract two near-equal O(cloud-scale) aggregates, and f32
    operands keep that cancellation at ~1e-6 relative.
    """
    del layout_t   # row-major only; _fused_backward gates on it
    q = q_ref[0]                           # [s, 3]
    xyz = xyz_ref[0]                       # [n, 3]
    feats = feats_ref[0]                   # [n, C]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2 = w2_ref[:, :]        # b2 is NOT an input: a2 is never recomputed
    idxmat = idx_ref[0]                    # [s, K]
    amax = amax_ref[0]                     # [s, H2] argmax neighbor index
    m1 = m1_ref[0]                         # [s, H]  relu-support bits
    m2 = m2_ref[0]                         # [s, H2]
    g = g_ref[0]                           # [s, H2]
    s, n = q.shape[0], xyz.shape[0]
    h1n = w1.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    lane = lax.broadcasted_iota(jnp.int32, (s, n), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (s, k), 1)

    # the forward gathers feats through one bf16 rounding; mirror it
    catf32 = feats.astype(jnp.bfloat16).astype(jnp.float32)
    M = jnp.concatenate([xyz, catf32], axis=1)           # [n, c_in]
    # Z in f32 (tiny [n, c_in] x [c_in, H]); the WIDE per-block matmuls
    # (a1 gather and the U scatter) always run with bf16 operands — full
    # MXU rate even on the f32 train path. Under f32 the operands are
    # hi/lo split pairs (value accuracy ~2^-16, vs 2^-9 single-bf16 under
    # bf16_mm); both are legal backward VALUE precision per the routing
    # contract, and the f32 path's gradient values stay well inside the
    # suite's mixed-precision tolerance.
    Z = _dot(M, w1)                                      # [n, H] f32
    hilo = mmdt != jnp.bfloat16
    if hilo:
        Zhi = Z.astype(jnp.bfloat16)
        Zlo = (Z - Zhi.astype(jnp.float32)).astype(jnp.bfloat16)
        ZHL = jnp.concatenate([Zhi, Zlo], axis=1)        # [n, 2H] bf16
    else:
        ZHL = Z.astype(jnp.bfloat16)                     # [n, H] bf16
    qproj = _dot(q, w1[:3, :])                           # [s, H] f32
    qprojs = jnp.concatenate([qproj] * kb, axis=0)       # [kb*s, H]

    @pl.when(j == 0)
    def _():
        dcat_ref[0] = jnp.zeros(dcat_ref.shape[1:], jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw1_ref[:, :] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[:, :] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[:, :] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:, :] = jnp.zeros(db2_ref.shape, jnp.float32)

    def rows_dot(a, b):
        """[R, X]^T . [R, Y] -> [X, Y] (contract the stacked rows)."""
        return lax.dot_general(a.astype(mmdt), b.astype(mmdt),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def rows_dot_f32(a, b):
        return lax.dot_general(a, b,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def cols_dot_f32(a, b):
        """[X, R] . [Y, R]^T -> [X, Y] (contract the trailing dims)."""
        return lax.dot_general(a, b,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def stack_k(build):
        return jnp.concatenate([build(jj) for jj in range(kb)], axis=0)

    def bf_hilo(x):
        """[R, H] f32 -> [R, 2H] bf16 hi/lo pair (exact sum in f32)."""
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=1)

    def blk_body(blk, carry):
        U, da1sum, dw2, db2 = carry
        k0 = blk * kb
        ohs = []
        for jj in range(kb):
            sel = jnp.sum(jnp.where(kcols == k0 + jj, idxmat, 0), axis=1,
                          keepdims=True)                 # [s, 1]
            ohs.append((lane == sel).astype(jnp.bfloat16))
        oh = jnp.concatenate(ohs, axis=0)                # [kb*s, n] bf16
        zz = _dot(oh, ZHL)                               # [kb*s, H|2H] f32
        a1 = (zz[:, :h1n] + zz[:, h1n:] if hilo else zz) - qprojs + b1
        bit1 = stack_k(lambda jj: ((m1 >> (k0 + jj).astype(jnp.uint32))
                                   & jnp.uint32(1)) > 0)
        h1 = jnp.where(bit1, a1, 0.0)
        dh2 = stack_k(lambda jj: jnp.where(amax == k0 + jj, g, 0.0))
        bit2 = stack_k(lambda jj: ((m2 >> (k0 + jj).astype(jnp.uint32))
                                   & jnp.uint32(1)) > 0)
        da2 = jnp.where(bit2, dh2, 0.0)
        dw2 = dw2 + rows_dot(h1, da2)                    # [H, H2]
        db2 = db2 + jnp.sum(da2, axis=0, keepdims=True)
        dh1 = lax.dot_general(da2.astype(mmdt), w2.astype(mmdt),
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        da1 = jnp.where(bit1, dh1, 0.0)                  # [kb*s, H]
        da1op = bf_hilo(da1) if hilo else da1.astype(jnp.bfloat16)
        U = U + lax.dot_general(                         # [n, H|2H] f32
            oh, da1op, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da1sum = da1sum + da1
        return U, da1sum, dw2, db2

    u_w = 2 * h1n if hilo else h1n
    U, da1sum, dw2, db2 = lax.fori_loop(
        0, k // kb, blk_body,
        (jnp.zeros((n, u_w), jnp.float32),
         jnp.zeros((kb * s, h1n), jnp.float32),
         jnp.zeros(dw2_ref.shape, jnp.float32),
         jnp.zeros(db2_ref.shape, jnp.float32)))
    if hilo:
        U = U[:, :h1n] + U[:, h1n:]

    # post-loop closures, all small and f32 (see docstring)
    db1 = jnp.sum(da1sum, axis=0, keepdims=True)         # [1, H]
    da1c = da1sum[0:s]
    for jj in range(1, kb):
        da1c = da1c + da1sum[jj * s:(jj + 1) * s]        # [s, H]
    qterm = rows_dot_f32(q, da1c)                        # [3, H]
    dw1 = rows_dot_f32(M, U)                             # [c_in, H]
    dw1 = dw1 - jnp.concatenate(
        [qterm, jnp.zeros((dw1.shape[0] - 3, h1n), jnp.float32)], axis=0)
    dcat = cols_dot_f32(U, w1)                           # [n, c_in]
    dq = -cols_dot_f32(da1c, w1[:3, :])                  # [s, 3]

    dq_ref[0] = dq
    dcat_ref[0] = dcat_ref[0] + dcat
    dw1_ref[:, :] = dw1_ref[:, :] + dw1
    db1_ref[:, :] = db1_ref[:, :] + db1
    dw2_ref[:, :] = dw2_ref[:, :] + dw2
    db2_ref[:, :] = db2_ref[:, :] + db2


def _fused_backward(new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax,
                    m1, m2, g, bf16_mm=False):
    B, S, _ = new_xyz.shape
    N, C = feats.shape[1], feats.shape[2]
    c_in, H = w1.shape
    H2 = w2.shape[1]
    # idx layout follows the forward kernel that saved it ([B, S, k]
    # row-major, [B, k, S] transposed) — same condition as _fused_forward
    # (module flags are stable within one fwd+bwd trace)
    layout_t = _LAYOUT_T and _PIPELINE and sorted_topk_supported(N)
    k = idx.shape[1] if layout_t else idx.shape[2]
    s_blk = min(_S_BLK, S)
    grid = (B, S // s_blk)

    # collapsed backward only under bf16_mm: the hardware A/B
    # (TRG/sg_bwd_ab.json, round 5) measured 1.24x/1.12x (stage1/2) there
    # but ~1.0x on the f32 path with bf16-level (2e-3) value noise — the
    # backward is one-hot/VPU-bound, not matmul-bound, so shrinking the
    # f32 matmul work buys nothing and costs gradient exactness
    bwd_kernel = (_sg_bwd_kernel_c
                  if _BWD_COLLAPSED and bf16_mm and not layout_t
                  else _sg_bwd_kernel)
    dq, dcat, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(bwd_kernel, k, _neighbor_block(k), layout_t,
                          mmdt=jnp.bfloat16 if bf16_mm else jnp.float32),
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
            pl.BlockSpec((1, k, s_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM) if layout_t else
            pl.BlockSpec((1, s_blk, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, H), lambda i, j: (i, j, 0),
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
        interpret=_INTERPRET,
    )(new_xyz, xyz, feats, w1, b1.reshape(1, H), w2,
      idx, amax, m1, m2, g)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_set_abstraction(new_xyz, xyz, feats, w1, b1, w2, b2, k,
                          bf16_mm=False):
    """[B,S,3], [B,N,3], [B,N,C], MLP params -> [B, S, w2_out].

    TPU: single fused Pallas kernel. Elsewhere: kNN + gather + MLP + max.
    k must be <= 32 on the fused path (relu-support bitmasks are uint32).
    ``bf16_mm`` runs the MLP matmuls (and, under grad, the backward's
    recompute + gradient matmuls) with bf16 operands and f32
    accumulation — full MXU rate. Routing correctness is dtype-proof:
    masks/argmax are saved from the (bf16) forward itself and the
    backward routes by them. Default stays f32 (the encoder enables it
    under --bf16).
    """
    if pallas_supported():
        out, _, _ = _fused_forward(new_xyz, xyz, feats, w1, b1, w2, b2, k,
                                   with_masks=False, bf16_mm=bf16_mm)
        return out
    idx = knn_indices(new_xyz, xyz, k)
    return _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)


def _fsa_fwd(new_xyz, xyz, feats, w1, b1, w2, b2, k, bf16_mm=False):
    # bf16_mm under grad: forward masks/argmax are computed FROM the
    # bf16-dot activations, so routing stays self-consistent; backward
    # recompute (also bf16) only supplies values — rounding scales
    # gradients but can never re-route them (module docstring).
    if pallas_supported():
        out, idx, amax, m1, m2 = _fused_forward(
            new_xyz, xyz, feats, w1, b1, w2, b2, k, with_masks=True,
            bf16_mm=bf16_mm)
    else:
        idx = knn_indices(new_xyz, xyz, k)
        out = _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)
        amax = m1 = m2 = None
    return out, (new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax, m1, m2)


def _fsa_bwd(k, bf16_mm, res, g):
    new_xyz, xyz, feats, w1, b1, w2, b2, idx, amax, m1, m2 = res
    # differentiate the gather->MLP->max graph at the SAVED indices (the
    # kNN selection itself has zero gradient a.e.)
    if pallas_supported():
        return _fused_backward(new_xyz, xyz, feats, w1, b1, w2, b2, idx,
                               amax, m1, m2, g, bf16_mm=bf16_mm)

    def f(new_xyz, xyz, feats, w1, b1, w2, b2):
        return _mlp_max_from_idx(new_xyz, xyz, feats, w1, b1, w2, b2, idx)

    _, vjp = jax.vjp(f, new_xyz, xyz, feats, w1, b1, w2, b2)
    return vjp(g)


fused_set_abstraction.defvjp(_fsa_fwd, _fsa_bwd)
