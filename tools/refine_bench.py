"""Pose-refinement benchmark: test-set pose metrics vs refine_iters.

`Session.predict(refine_iters=N)` re-runs the pairwise net on the aligned
pair and composes the correction (puzzlenet_tpu/infer.py::_refine) — this
tool measures what that buys on a trained run's own test distribution:
the 6 pose metrics (r_mse/r_mae/t_mse/t_mae/r_iso/t_iso, the suite of
model5_b.py:1426-1440) for each requested iteration count, on the same
test split cli.test evaluates.

    python tools/refine_bench.py --run_dir TRG/<run> [--iters 0,1,2,4]
        [--batch_size 64] [--max_items 256] [--json out.json]

Refinement is only in-distribution when the checkpoint trained with
near-identity twists in range (--random / --mag); on a fixed-mag-0.8
checkpoint the correction pass sees out-of-distribution near-aligned
pairs and can HURT — that is exactly what this tool makes visible.
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("model", "iters"))
def _pose_rows(model, params, batch_stats, batch, iters):
    from puzzlenet_tpu import metrics as M
    from puzzlenet_tpu.semath import se3

    variables = {"params": params, "batch_stats": batch_stats}
    out = model.apply(variables, batch.fpc, batch.mrpc, train=False)
    mat = se3.exp(out.twist)
    for _ in range(iters):
        aligned = se3.transform_points(mat, batch.mrpc)
        out = model.apply(variables, batch.fpc, aligned, train=False)
        mat = jnp.matmul(se3.exp(out.twist), mat, precision="highest")
    pose = M.compute_pose_metrics(mat[:, :3, :3], mat[:, :3, 3], batch.igt)
    return jnp.stack(pose, axis=1)                      # [B, 6]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--iters", default="0,1,2,4")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_items", type=int, default=None,
                    help="cap test items (default: full split)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--json", default=None)
    ns = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from puzzlenet_tpu.core.config import Config
    from puzzlenet_tpu.data import get_dataset
    from puzzlenet_tpu.train.loader import Loader
    from puzzlenet_tpu.train.losses import Batch
    from puzzlenet_tpu.train.trainer import Trainer

    cfg = Config.load(ns.run_dir)
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

    # materialize the batches once so every iters-variant sees the
    # identical test stream
    loader = Loader(test_ds, ns.batch_size, shuffle=False, drop_last=False,
                    num_workers=4)
    batches = []
    seen = 0
    for arrays in loader:
        b = Batch(*[np.asarray(a, np.float32) for a in arrays[:8]])
        n = b.fpc.shape[0]
        if n < ns.batch_size:
            reps = -(-ns.batch_size // n)
            b = Batch(*[np.concatenate([a] * reps)[:ns.batch_size]
                        for a in b])
        batches.append((b, n))
        seen += n
        if ns.max_items and seen >= ns.max_items:
            break
    print(f"# refine_bench {ns.run_dir}  items={seen} "
          f"batch={ns.batch_size} backend={jax.default_backend()}")

    names = ["r_mse", "r_mae", "t_mse", "t_mae", "r_iso", "t_iso"]
    results = {}
    print("iters  " + "  ".join(f"{s:>8s}" for s in names))
    for it in [int(x) for x in ns.iters.split(",")]:
        rows = [np.asarray(_pose_rows(trainer.model, state.params,
                                      state.batch_stats, b, it))[:n]
                for b, n in batches]
        mean = np.concatenate(rows).mean(axis=0)
        results[it] = dict(zip(names, mean.tolist()))
        print(f"{it:>5d}  " + "  ".join(f"{v:8.4f}" for v in mean))

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump({"run_dir": ns.run_dir, "items": seen,
                       "results": results}, f, indent=1)
        print(f"wrote {ns.json}")


if __name__ == "__main__":
    main()
