"""Loss computation.

Capability parity with TouchedRegraster.training_step (model5_b.py:912-1155):

* loss_re   — bidirectional chamfer(rpc, exp(twist) . mrpc) (956-960)
* loss_g    — ||g . igt - I||^2 MSE * 16 (comp, 1512-1519)
* loss_emd  — approx-EMD(de_mrpc, rpc) (1002-1010)
* loss_mode 0..6 dispatch (1016-1029): 0=re+g, 1=re+g+emd, 2=emd, 3=emd+g,
  4=emd+re, 5=g, 6=re
* optional emd2/cd2 on the attention-selected top-32 subclouds (937-942,
  1001-1043). NOTE: the reference gathers those subclouds with the top
  indices of batch element 0 applied to every element (model5_b.py:940-942,
  a latent indexing bug); implemented here with the intended per-element
  top-32 gather.
* boundary terms after the pretrain gate (1046-1151): per-point CE, IoU
  logging, top-128 gather, boundary chamfer (+EMD with use_emd3)

Unlike the reference, terms outside the active loss_mode are only computed
when ``log_all`` is set — XLA then DCEs the unused EMD/attention work
entirely (the reference always pays for EMD even in loss_mode 0).
"""

from typing import NamedTuple

import jax.numpy as jnp
import optax
from jax import lax

from ..ops import chamfer_distances, earth_mover_distance, index_points
from ..semath import se3


class Batch(NamedTuple):
    """The 8-tuple batch contract (SURVEY.md §2.2, dataset.py:97-105)."""

    fpc: jnp.ndarray       # [B, N, 3] fixed piece
    mrpc: jnp.ndarray      # [B, N, 3] moved piece = igt . rpc
    igt: jnp.ndarray       # [B, 4, 4]
    rpc: jnp.ndarray       # [B, N, 3] unmoved second piece
    fpcb: jnp.ndarray      # [B, 128, 3] GT boundary of fpc
    rpcb: jnp.ndarray      # [B, 128, 3] GT boundary of rpc
    fpc_idx: jnp.ndarray   # [B, N] 0/1 mask
    rpc_idx: jnp.ndarray   # [B, N] 0/1 mask


class LossFlags(NamedTuple):
    """Static (hashable) loss configuration — one jit cache entry per combo."""

    loss_mode: int = 0
    loss_sum: bool = False
    use_emd2: bool = False
    use_cd2: bool = False
    use_emd3: bool = False
    log_all: bool = False
    bnd_ce_w: float = 1.0    # positive-class weight in the boundary CE
                             # (128/1024 imbalance; 1.0 = reference parity)
    bnd_cd_w: float = 1.0    # weight on the boundary-chamfer/EMD terms
    bnd_w: float = 1.0       # weight on the WHOLE boundary branch vs the
                             # pose losses (1.0 = reference parity). The
                             # boundary upgrade (--boundary_fp --bnd_ce_w 7)
                             # costs pose accuracy where boundary gradients
                             # dominate shared features (cadr r_mae
                             # 0.54 -> 8.09, PERFORMANCE.md); this knob
                             # prices that trade explicitly.


def _reduce(flags, *xs):
    if flags.loss_sum:
        return sum(jnp.sum(x) for x in xs)
    return sum(jnp.mean(x) for x in xs)


def comp(g, igt):
    """||g . igt - I||^2, mean * 16 (model5_b.py:1512-1519)."""
    A = jnp.matmul(g, igt, precision="highest")
    I = jnp.eye(4, dtype=g.dtype)
    return jnp.mean((A - I) ** 2) * 16


def _attention_subclouds(out):
    """Per-element top-32 attention-selected stage-2 centroids
    (intended semantics of model5_b.py:937-942)."""
    att_f = out.fpc_attention.mean(axis=1)     # [B, 256]
    att_m = out.mrpc_attention.mean(axis=1)
    _, idx_f = lax.top_k(att_f, 32)
    _, idx_m = lax.top_k(att_m, 32)
    return index_points(out.fpc_x2, idx_f), index_points(out.mrpc_x2, idx_m)


def _boundary_terms(out, batch, mat, flags):
    """CE + IoU + top-128 boundary chamfer/EMD (model5_b.py:1050-1151)."""
    logits_f = jnp.swapaxes(out.fpcb_logits, 1, 2)    # [B, N, 2]
    logits_m = jnp.swapaxes(out.mrpcb_logits, 1, 2)
    labels_f = batch.fpc_idx.astype(jnp.int32)
    labels_m = batch.rpc_idx.astype(jnp.int32)

    def _ce(logits, labels):
        per_point = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        if flags.bnd_ce_w == 1.0:
            return jnp.mean(per_point)
        # class-weighted CE, normalized by the weight mass so it reduces
        # exactly to the mean at w=1 (F.cross_entropy(weight=...) semantics)
        w = jnp.where(labels == 1, flags.bnd_ce_w, 1.0)
        return jnp.sum(w * per_point) / jnp.sum(w)

    ce_f = _ce(logits_f, labels_f)
    ce_m = _ce(logits_m, labels_m)

    # top-128 by class-1 probability; softmax is monotone in the logit
    # margin, so rank on logits[...,1] - logits[...,0] directly
    # (reference: softmax then topk, model5_b.py:1085-1091)
    _, top_f = lax.top_k(logits_f[..., 1] - logits_f[..., 0], 128)
    _, top_m = lax.top_k(logits_m[..., 1] - logits_m[..., 0], 128)

    pred_f = jnp.put_along_axis(jnp.zeros_like(batch.fpc_idx), top_f, 1.0,
                                axis=1, inplace=False)
    pred_m = jnp.put_along_axis(jnp.zeros_like(batch.rpc_idx), top_m, 1.0,
                                axis=1, inplace=False)
    inter_f = jnp.sum(pred_f * batch.fpc_idx)
    union_f = jnp.sum(jnp.clip(pred_f + batch.fpc_idx, 0, 1))
    inter_m = jnp.sum(pred_m * batch.rpc_idx)
    union_m = jnp.sum(jnp.clip(pred_m + batch.rpc_idx, 0, 1))
    iou_f = inter_f / union_f
    iou_m = inter_m / union_m

    de_fpcb = index_points(batch.fpc, top_f)          # [B, 128, 3]
    de_mrpcb = index_points(batch.mrpc, top_m)
    inv_de_mrpcb = se3.transform_points(mat, de_mrpcb)

    cd1, cd2 = chamfer_distances(de_fpcb, batch.fpcb)
    loss_fpcb = jnp.mean(cd1) + jnp.mean(cd2)
    cd1, cd2 = chamfer_distances(inv_de_mrpcb, batch.rpcb)
    loss_mrpcb = jnp.mean(cd1) + jnp.mean(cd2)

    terms = ce_f + ce_m + flags.bnd_cd_w * (loss_fpcb + loss_mrpcb)
    metrics = {
        "train/loss_fpcb_cel": ce_f, "train/loss_rpcb_cel": ce_m,
        "train/fpc_iou": iou_f, "train/mrpcb_iou": iou_m,
        "train/loss_fpcb": loss_fpcb, "train/loss_rpcb": loss_mrpcb,
    }
    if flags.use_emd3 or flags.log_all:
        emd_f = jnp.mean(earth_mover_distance(de_fpcb, batch.fpcb))
        emd_m = jnp.mean(earth_mover_distance(inv_de_mrpcb, batch.rpcb))
        metrics["train/loss_emd_fpcb"] = emd_f
        metrics["train/loss_emc_mrpcb"] = emd_m
        if flags.use_emd3:
            terms = terms + flags.bnd_cd_w * (emd_f + emd_m)
    return terms, metrics


def compute_losses(out, batch, flags: LossFlags, pretrain: bool):
    """Model output + batch -> (scalar loss, metrics dict).

    ``pretrain`` and ``flags`` must be static under jit.
    """
    mat = se3.exp(out.twist)                           # [B, 4, 4]
    de_mrpc = se3.transform_points(mat, batch.mrpc)

    d1, d2 = chamfer_distances(batch.rpc, de_mrpc)
    loss_re = _reduce(flags, d1) + _reduce(flags, d2)
    loss_g = comp(mat, batch.igt)
    metrics = {"train/loss_re": loss_re, "train/loss_g": loss_g}

    mode = flags.loss_mode
    need_emd = mode in (1, 2, 3, 4) or flags.log_all
    loss_emd = None
    if need_emd:
        loss_emd = _reduce(flags, earth_mover_distance(de_mrpc, batch.rpc))
        metrics["train/loss_emd"] = loss_emd

    if mode == 0:
        loss = loss_re + loss_g
    elif mode == 1:
        loss = loss_re + loss_g + loss_emd
    elif mode == 2:
        loss = loss_emd
    elif mode == 3:
        loss = loss_emd + loss_g
    elif mode == 4:
        loss = loss_emd + loss_re
    elif mode == 5:
        loss = loss_g
    elif mode == 6:
        loss = loss_re
    else:
        raise ValueError(f"loss_mode {mode} not in 0..6")

    if flags.use_emd2 or flags.use_cd2 or flags.log_all:
        x2att_f, x2att_m = _attention_subclouds(out)
        if flags.use_cd2 or flags.log_all:
            c1, c2 = chamfer_distances(x2att_f, x2att_m)
            loss_cd2 = _reduce(flags, c1) + _reduce(flags, c2)
            metrics["train/cd2"] = loss_cd2
            if flags.use_cd2:
                loss = loss + loss_cd2
        if flags.use_emd2 or flags.log_all:
            # reference sums emd2 regardless of loss_sum (model5_b.py:1033-1036)
            emd2 = jnp.sum(earth_mover_distance(x2att_f, x2att_m))
            metrics["train_emd2"] = emd2
            if flags.use_emd2:
                loss = loss + emd2

    if not pretrain:
        bterms, bmetrics = _boundary_terms(out, batch, mat, flags)
        loss = loss + flags.bnd_w * bterms
        metrics.update(bmetrics)

    metrics["train_loss"] = loss
    return loss, metrics
