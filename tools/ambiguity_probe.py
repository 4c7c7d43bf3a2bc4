"""Ambiguity-factored pose evaluation for curved-cut categories.

vase_cone's r_mae (~15 deg, PERFORMANCE.md) mixes two very different
errors: genuine misprediction, and rotation about the cone axis — a mode
the cut interface is geometrically symmetric under, which only the
piece's bulk asymmetry can pin down. This tool splits them: for every
test pair it recomputes the pose residual E = g_pred @ igt, removes the
best cut-axis twist (puzzlenet_tpu/ambiguity.py swing-twist), and
reports raw vs factored rotation/translation errors plus the removed
twist magnitude.

    python tools/ambiguity_probe.py --run_dir TRG/vcone_bfp_r \
        [--iters 0,1] [--batch_size 64] [--max_items 256] [--out x.json]

The reference never conditions its metrics on the cut (dataset4val2.py
returns the primitive for visualization only) — analysis tooling, no
parity target.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _build_test_ds(cfg):
    """The run's test split, reconstructed exactly as registry.get_dataset
    builds it (same clouds, seeds, wrapper) but with return_cut=True so
    the slicer's primitive parameters are observable via last_cut()."""
    from puzzlenet_tpu.data.datasets import MovedDataset, SlicedCloudDataset
    from puzzlenet_tpu.data.registry import _NAMES, _load_clouds

    if cfg.dataset not in _NAMES:
        raise SystemExit(f"{cfg.dataset!r} is not a sliced-cloud category")
    name, family, slicer = _NAMES[cfg.dataset]
    test_clouds = _load_clouds(name.replace("_train", "_test"), family,
                               max(cfg.synth_count // 4, 8), seed=10_000)
    inner = SlicedCloudDataset(test_clouds, mode="test", slicer=slicer,
                               split_twice=cfg.random_slice,
                               npoint=cfg.num_points, return_cut=True)
    return MovedDataset(inner, mag_randomly=cfg.random, seed=3), inner


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--iters", default="0,1",
                    help="refine_iters variants (composed test-time "
                         "refinement) to evaluate")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_items", type=int, default=None)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args(argv)

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import functools

    from puzzlenet_tpu.ambiguity import factored_pose_error
    from puzzlenet_tpu.core.config import Config
    from puzzlenet_tpu.semath import se3
    from puzzlenet_tpu.train.losses import Batch
    from puzzlenet_tpu.train.trainer import Trainer

    cfg = Config.load(ns.run_dir)
    cfg.output_path = ns.run_dir
    test_ds, inner = _build_test_ds(cfg)

    trainer = Trainer(cfg)
    item0 = test_ds[0]
    example = Batch(*[jnp.asarray(x)[None] for x in item0[:8]])
    state = trainer.init_state(example)
    state = trainer.restore_checkpoint(
        state, os.path.join(ns.run_dir, "checkpoints"), step=ns.step)

    # single-threaded item walk: last_cut() is per-thread state
    n_items = len(test_ds)
    if ns.max_items:
        n_items = min(n_items, ns.max_items)
    items, cuts = [], []
    for i in range(n_items):
        items.append(test_ds[i])
        cuts.append(inner.last_cut())
    print(f"# ambiguity_probe {ns.run_dir} dataset={cfg.dataset} "
          f"items={n_items} backend={jax.default_backend()}")

    @functools.partial(jax.jit, static_argnames=("model", "iters"))
    def _mats(model, params, batch_stats, fpc, mrpc, iters):
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, fpc, mrpc, train=False)
        mat = se3.exp(out.twist)
        for _ in range(iters):
            aligned = se3.transform_points(mat, mrpc)
            out = model.apply(variables, fpc, aligned, train=False)
            mat = jnp.matmul(se3.exp(out.twist), mat, precision="highest")
        return mat

    B = ns.batch_size
    results = {}
    keys = ["r_iso_deg", "r_factored_deg", "t_iso", "t_factored",
            "twist_deg"]
    for it in [int(x) for x in ns.iters.split(",")]:
        rows = []
        for s in range(0, n_items, B):
            chunk = items[s:s + B]
            n = len(chunk)
            reps = -(-B // n)
            fpc = np.stack([c[0] for c in chunk] * reps)[:B]
            mrpc = np.stack([c[1] for c in chunk] * reps)[:B]
            mats = np.asarray(_mats(trainer.model, state.params,
                                    state.batch_stats,
                                    jnp.asarray(fpc), jnp.asarray(mrpc),
                                    it))[:n]
            for c, cut, m in zip(chunk, cuts[s:s + n], mats):
                if cut is None:
                    continue        # split_twice se-path: no primary cut
                rows.append(factored_pose_error(m, c[2], cut))
        agg = {}
        for k in keys:
            v = np.asarray([abs(r[k]) for r in rows])
            agg[k + "_mean"] = float(v.mean())
            agg[k + "_p50"] = float(np.median(v))
        agg["n"] = len(rows)
        results[it] = agg
        print(f"iters={it}  " + "  ".join(
            f"{k}={agg[k + '_p50']:.3f}/{agg[k + '_mean']:.3f}(p50/mean)"
            for k in keys))

    if ns.out:
        with open(ns.out, "w") as f:
            json.dump({"run_dir": ns.run_dir, "dataset": cfg.dataset,
                       "items": n_items, "results": results}, f, indent=1)
        print("wrote", ns.out)
    return results


if __name__ == "__main__":
    main()
