"""Evaluation: the 10-metric test suite and metrics.txt writer.

Capability parity with TouchedRegraster.test_step / test_epoch_end
(model5_b.py:1279-1382): per-SAMPLE 10-vector
[r_mse, r_mae, t_mse, t_mae, r_iso, t_iso, fpc_iou, mrpc_iou, cd_fpcb,
cd_rpcb], averaged over the test set (batch-size independent — the
reference evaluates at batch 1), written to
``<out>/<timestamp>metrics.txt`` in the reference's exact format.

Everything (including Euler extraction) runs inside one jitted step — the
reference pays a D2H sync + per-sample scipy call per batch
(metrics.py:19-31).
"""

import datetime
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import metrics as M
from ..ops import chamfer_distances, index_points
from ..semath import se3
from .losses import Batch

METRIC_NAMES = ["r_mse", "r_mae", "t_mse", "t_mae", "r_iso", "t_iso",
                "fpc_iou", "mrpc_iou", "cd_fpcb", "cd_rpcb"]


@functools.partial(jax.jit, static_argnames=("model", "pretrain",
                                             "refine_iters"))
def test_step_metrics(model, params, batch_stats, batch: Batch,
                      pretrain=False, refine_iters=0):
    """One test batch -> PER-SAMPLE metric rows [B, 10].

    Per-sample (not batch-aggregated) so the dataset mean is independent
    of --batch_size: the reference evaluates at batch 1 and averages
    test_step rows (test.py:130-138, model5_b.py:1364-1382) — a
    batch-aggregated IoU or a partial final batch would silently change
    the statistics with the loader geometry.

    ``pretrain=True`` evaluates a pretrain-phase checkpoint through the
    pose-only predict6 path (model5_b.py:1178-1181): the 6 pose metrics
    are real, the boundary metrics are emitted as NaN placeholders so the
    metrics.txt row keeps its 10-column shape.

    ``refine_iters``: test-time composed refinement (beyond-reference;
    Session.predict's contract) — re-run the net on the aligned pair and
    compose the correction before computing the pose/boundary-chamfer
    metrics. Only meaningful on checkpoints trained with --random
    (measured gains in PERFORMANCE.md "composed refinement"); boundary
    logits/IoU stay from the FIRST forward (the unaligned pair is the
    boundary task's distribution).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    out = model.apply(variables, batch.fpc, batch.mrpc, train=False,
                      pretrain=pretrain)
    mat = se3.exp(out.twist)
    for _ in range(refine_iters):
        aligned = se3.transform_points(mat, batch.mrpc)
        out_r = model.apply(variables, batch.fpc, aligned, train=False,
                            pretrain=pretrain)
        mat = jnp.matmul(se3.exp(out_r.twist), mat,
                         precision=jax.lax.Precision.HIGHEST)
    R, t = mat[:, :3, :3], mat[:, :3, 3]
    pose = M.compute_pose_metrics(R, t, batch.igt)     # 6 x [B]

    if pretrain:
        nan = jnp.full_like(pose[0], jnp.nan)
        return jnp.stack([*pose, nan, nan, nan, nan], axis=1)

    # boundary IoU @ top-128, per sample (model5_b.py:1323-1347)
    logits_f = jnp.swapaxes(out.fpcb_logits, 1, 2)
    logits_m = jnp.swapaxes(out.mrpcb_logits, 1, 2)
    _, top_f = lax.top_k(logits_f[..., 1] - logits_f[..., 0], 128)
    _, top_m = lax.top_k(logits_m[..., 1] - logits_m[..., 0], 128)
    pred_f = jnp.put_along_axis(jnp.zeros_like(batch.fpc_idx), top_f, 1.0,
                                axis=1, inplace=False)
    pred_m = jnp.put_along_axis(jnp.zeros_like(batch.rpc_idx), top_m, 1.0,
                                axis=1, inplace=False)
    fpc_iou = jnp.sum(pred_f * batch.fpc_idx, axis=1) / jnp.sum(
        jnp.clip(pred_f + batch.fpc_idx, 0, 1), axis=1)
    mrpc_iou = jnp.sum(pred_m * batch.rpc_idx, axis=1) / jnp.sum(
        jnp.clip(pred_m + batch.rpc_idx, 0, 1), axis=1)

    # boundary chamfer; the mrpc side after applying the predicted transform
    # — note the reference gathers from rpc here, not mrpc
    # (model5_b.py:1351-1358)
    de_fpcb = index_points(batch.fpc, top_f)
    cd1, cd2 = chamfer_distances(batch.fpcb, de_fpcb)
    cd_fpcb = jnp.mean(cd1, axis=1) + jnp.mean(cd2, axis=1)
    de_rpcb = se3.transform_points(mat, index_points(batch.rpc, top_m))
    cd1, cd2 = chamfer_distances(batch.rpcb, de_rpcb)
    cd_rpcb = jnp.mean(cd1, axis=1) + jnp.mean(cd2, axis=1)

    return jnp.stack([*pose, fpc_iou, mrpc_iou, cd_fpcb, cd_rpcb], axis=1)


def evaluate(model, params, batch_stats, dataset, output_path=None,
             batch_size=1, num_workers=4, progress=False, pretrain=False,
             refine_iters=0):
    """Full test loop -> dict of the 10 mean metrics; writes metrics.txt
    when ``output_path`` is given (format of model5_b.py:1373-1382).
    ``pretrain`` evaluates through the pose-only predict6 path;
    ``refine_iters`` composes test-time refinement forwards (see
    test_step_metrics)."""
    from .loader import Loader

    loader = Loader(dataset, batch_size, shuffle=False, drop_last=False,
                    num_workers=num_workers)
    rows, done = [], 0
    for arrays in loader:
        batch = Batch(*[np.asarray(a, np.float32) for a in arrays[:8]])
        n = batch.fpc.shape[0]
        if n < batch_size:
            # pad the final partial batch to the compiled shape by
            # repeating rows (avoids a 30-200 s shape recompile over the
            # remote tunnel); pad rows are dropped below
            reps = -(-batch_size // n)
            batch = Batch(*[np.concatenate([a] * reps)[:batch_size]
                            for a in batch])
        rows.append(np.asarray(
            test_step_metrics(model, params, batch_stats, batch,
                              pretrain=pretrain,
                              refine_iters=refine_iters))[:n])
        done += 1
        if progress and done % 20 == 0:
            print(f"  eval batch {done}/{len(loader)}")
    mean = np.concatenate(rows).mean(axis=0)
    result = dict(zip(METRIC_NAMES, mean.tolist()))

    if output_path is not None:
        os.makedirs(output_path, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
        with open(os.path.join(output_path, f"{stamp}metrics.txt"),
                  "w") as f:
            f.write("r_mse,   r_mae,   t_mse,    t_mae,    r_iso,    t_iso,"
                    "  fpc_iou,   mrpc_iou, cd_fpcb, cd_rpcb \n")
            for v in mean:
                f.write(str(np.float32(v)) + "   ")
            f.write("\n")
    return result
