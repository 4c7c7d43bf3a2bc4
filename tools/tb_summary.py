"""Summarize a training run's TensorBoard scalars into a markdown table.

Usage:
    python tools/tb_summary.py --run_dir TRG/vaser_r2 [--tag train_loss]
                               [--points 10]

Reads the run's TB event files (the same ones train/logging_util.TBLogger
writes) and prints an evenly-subsampled step/value table — the publishing
helper for PERFORMANCE.md's convergence sections.
"""

import argparse
import glob
import os


def load_scalars(run_dir, tag):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    tb_dir = os.path.join(run_dir, "tb")
    paths = sorted(glob.glob(os.path.join(tb_dir, "events.out.tfevents.*")))
    if not paths:
        raise FileNotFoundError(f"no event files under {tb_dir}")
    steps, vals = [], []
    for p in paths:
        acc = EventAccumulator(p, size_guidance={"scalars": 0})
        acc.Reload()
        if tag not in acc.Tags().get("scalars", []):
            continue
        for ev in acc.Scalars(tag):
            steps.append(ev.step)
            vals.append(ev.value)
    order = sorted(range(len(steps)), key=lambda i: steps[i])
    return [steps[i] for i in order], [vals[i] for i in order]


def main(argv=None):
    p = argparse.ArgumentParser("tb_summary")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--tag", default="train_loss")
    p.add_argument("--points", type=int, default=10)
    ns = p.parse_args(argv)

    steps, vals = load_scalars(ns.run_dir, ns.tag)
    if not steps:
        print(f"tag '{ns.tag}' not found")
        return
    n = len(steps)
    idxs = sorted({round(i * (n - 1) / max(1, ns.points - 1))
                   for i in range(ns.points)})
    print(f"| step | {ns.tag} |")
    print("|---|---|")
    for i in idxs:
        print(f"| {steps[i]} | {vals[i]:.4f} |")


if __name__ == "__main__":
    main()
