"""Evaluate a trained checkpoint with the REFERENCE's own code path.

The strongest parity statement available without the reference's (LFS-stub)
checkpoints: export our trained weights into the reference network
(core/refbridge.py exec's PCTransformer_nonsort etc. from /root/reference),
then run the reference's test procedure — se3.exp, metrics.py's error suite,
test_step's boundary IoU / chamfer math (model5_b.py:1279-1362) — over the
identical test set, and write a reference-format metrics.txt next to ours.
Both implementations evaluating the same weights on the same data must
agree within the BASELINE.md 1%-MSE contract.

Usage:
    python tools/ref_eval.py --run_dir TRG/<stamp> [--dataset vaser]
Writes <run_dir>/<stamp>ref_metrics.txt and prints both metric rows.
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU from here

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from puzzlenet_tpu.core import refbridge  # noqa: E402
from puzzlenet_tpu.core.config import Config  # noqa: E402
from puzzlenet_tpu.core.torch_compat import export_state_dict  # noqa: E402
from puzzlenet_tpu.data import get_dataset  # noqa: E402
from puzzlenet_tpu.train.evaluator import METRIC_NAMES, evaluate  # noqa: E402
from puzzlenet_tpu.train.losses import Batch  # noqa: E402
from puzzlenet_tpu.train.trainer import Trainer  # noqa: E402


def chamfer_loss(a, b):
    """Bi-directional squared chamfer via bmm expansion — semantics of
    TouchedRegraster.chamfer_loss (model5_b.py:1495-1505)."""
    d = (torch.cdist(a, b) ** 2)
    return d.min(dim=1).values, d.min(dim=2).values


def ref_test_step(model, ref_se3, ref_metrics, batch):
    """model5_b.py:1279-1362 semantics on CPU torch. Returns the 10-vector
    [r_mse, r_mae, t_mse, t_mae, r_iso, t_iso, fpc_iou, mrpc_iou,
    cd_fpcb, cd_rpcb]."""
    fpc, mrpc, igt, rpc, fpcb, rpcb, fpc_idx, rpc_idx = [
        torch.from_numpy(np.asarray(x, np.float32)) for x in batch[:8]]
    with torch.no_grad():
        out, de_fpcb_logits, de_mrpcb_logits = model(fpc, mrpc)
        mat = ref_se3.exp(out)
        R, t = mat[:, :3, :3], mat[:, :3, 3]

        gtR, gtt = igt[:, :3, :3], igt[:, :3, 3]
        inv_R, inv_t = ref_metrics.inv_R_t(gtR, gtt)
        r_mse, r_mae = ref_metrics.anisotropic_R_error(R, inv_R)
        t_mse, t_mae = ref_metrics.anisotropic_t_error(t, inv_t)
        r_iso = ref_metrics.isotropic_R_error(R, inv_R)
        t_iso = ref_metrics.isotropic_t_error(t, inv_t, inv_R)
        scores = [float(np.mean(np.asarray(v))) for v in
                  (r_mse, r_mae, t_mse, t_mae, r_iso, t_iso)]

        # boundary IoU @ top-128 (model5_b.py:1323-1347)
        n = fpc.shape[1]
        sig_f = torch.softmax(de_fpcb_logits, dim=1)[:, 1, :]
        sig_m = torch.softmax(de_mrpcb_logits, dim=1)[:, 1, :]
        top_f = torch.topk(sig_f, 128, 1).indices
        top_m = torch.topk(sig_m, 128, 1).indices
        pred_f = torch.zeros(fpc.shape[0], n).scatter(1, top_f, 1)
        pred_m = torch.zeros(fpc.shape[0], n).scatter(1, top_m, 1)
        iou_f = (torch.logical_and(pred_f, fpc_idx).sum().float()
                 / torch.logical_or(pred_f, fpc_idx).sum().float())
        iou_m = (torch.logical_and(pred_m, rpc_idx).sum().float()
                 / torch.logical_or(pred_m, rpc_idx).sum().float())
        scores += [float(iou_f), float(iou_m)]

        # boundary chamfer, mrpc side after the predicted transform
        # (model5_b.py:1349-1360 — gathers from rpc, not mrpc)
        de_fpcb = torch.gather(fpc, 1, top_f[..., None].repeat(1, 1, 3))
        c1, c2 = chamfer_loss(fpcb, de_fpcb)
        scores.append(float(c1.mean() + c2.mean()))
        de_rpcb = torch.gather(rpc, 1, top_m[..., None].repeat(1, 1, 3))
        de_rpcb = ref_se3.transform(mat, de_rpcb.permute(0, 2, 1)
                                    ).permute(0, 2, 1)
        c1, c2 = chamfer_loss(rpcb, de_rpcb)
        scores.append(float(c1.mean() + c2.mean()))
    return np.array(scores, np.float64)


def main(argv=None):
    p = argparse.ArgumentParser("puzzlenet-tpu reference-side eval")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--dataset", default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--max_items", type=int, default=None)
    p.add_argument("--skip_ours", action="store_true",
                   help="only produce the reference-side metrics")
    ns = p.parse_args(argv)

    cfg = Config.load(ns.run_dir)
    if ns.dataset:
        cfg.dataset = ns.dataset
    cfg.output_path = ns.run_dir
    _, _, test_ds = get_dataset(cfg.dataset, random=cfg.random,
                                random_slice=cfg.random_slice,
                                synth_count=cfg.synth_count,
                                num_points=cfg.num_points)

    trainer = Trainer(cfg)
    item = test_ds[0]
    example = Batch(*[jnp.asarray(x)[None] for x in item[:8]])
    state = trainer.init_state(example)
    state = trainer.restore_checkpoint(
        state, os.path.join(ns.run_dir, "checkpoints"), step=ns.step)

    # our weights -> the reference network
    sd = export_state_dict(
        jax.device_get(state.params), jax.device_get(state.batch_stats))
    ref_model = refbridge.build_reference_predict5(
        num_points=cfg.num_points, quirk=cfg.asymmetric_global_quirk)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    ref_model.eval()

    ref_se3, ref_metrics = refbridge.load_reference_modules()
    count = len(test_ds) if ns.max_items is None else min(
        ns.max_items, len(test_ds))
    rows = []
    for i in range(count):
        rows.append(ref_test_step(ref_model, ref_se3, ref_metrics,
                                  [np.asarray(x)[None] for x in
                                   test_ds[i][:8]]))
        if (i + 1) % 8 == 0:
            print(f"  ref eval {i + 1}/{count}", flush=True)
    mean = np.stack(rows).mean(axis=0)

    stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
    out_path = os.path.join(ns.run_dir, f"{stamp}ref_metrics.txt")
    with open(out_path, "w") as f:
        f.write("r_mse,   r_mae,   t_mse,    t_mae,    r_iso,    t_iso,"
                "  fpc_iou,   mrpc_iou, cd_fpcb, cd_rpcb \n")
        for v in mean:
            f.write(str(np.float32(v)) + "   ")
        f.write("\n")
    print("reference-side metrics ->", out_path)
    print({k: round(float(v), 6) for k, v in zip(METRIC_NAMES, mean)})

    if not ns.skip_ours:
        ours = evaluate(trainer.model, state.params, state.batch_stats,
                        test_ds, output_path=ns.run_dir, batch_size=1)
        print("our metrics:")
        print({k: round(float(v), 6) for k, v in ours.items()})
        rel = {k: abs(ours[k] - float(v)) / max(abs(float(v)), 1e-9)
               for k, v in zip(METRIC_NAMES, mean)}
        print("relative deltas:", {k: round(v, 6) for k, v in rel.items()})
    return mean


if __name__ == "__main__":
    main()
