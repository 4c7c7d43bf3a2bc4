"""Test/eval CLI.

Capability parity with /root/reference/test.py: loads a checkpoint
directory produced by cli.train (config restored from the run dir, like
load_from_checkpoint reading saved hparams, test.py:110-121), rebuilds the
matching dataset and writes the 10-metric metrics.txt.

    python -m puzzlenet_tpu.cli.test --run_dir TRG/<stamp> [--dataset vaser]
"""

import argparse
import os

import jax.numpy as jnp

from ..core.config import Config
from ..data import get_dataset
from ..train.evaluator import evaluate
from ..train.losses import Batch
from ..train.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser("puzzlenet-tpu test")
    p.add_argument("--run_dir", required=True,
                   help="training output dir (contains config.json + "
                        "checkpoints/)")
    p.add_argument("--dataset", default=None,
                   help="override the dataset stored in the run config")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--pretrain", action="store_true",
                   help="evaluate a pretrain-phase checkpoint through the "
                        "pose-only predict6 path (model5_b.py:1178-1181)")
    p.add_argument("--bf16", action="store_true",
                   help="evaluate with bfloat16 serving compute regardless "
                        "of the training dtype (params stay f32)")
    p.add_argument("--refine_iters", type=int, default=0,
                   help="test-time composed pose refinement forwards "
                        "(beyond-reference; meaningful on --random "
                        "checkpoints — see PERFORMANCE.md)")
    ns = p.parse_args(argv)

    cfg = Config.load(ns.run_dir)
    if ns.dataset:
        cfg.dataset = ns.dataset
    if ns.bf16:
        cfg.bf16 = True
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

    result = evaluate(trainer.model, state.params, state.batch_stats,
                      test_ds, output_path=ns.run_dir,
                      batch_size=ns.batch_size, progress=True,
                      pretrain=ns.pretrain, refine_iters=ns.refine_iters)
    for k, v in result.items():
        print(f"{k:>10}: {v}")
    return result


if __name__ == "__main__":
    main()
