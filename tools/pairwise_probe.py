"""Pairwise-accuracy probe for multi-piece assembly (diagnostic tool).

Assembly quality is bounded by the pairwise net's accuracy on ADJACENT
fragment pairs at each K — this tool measures exactly that, separating
the three failure sources the assemblers cannot distinguish on their own:

* pose error of the score-chosen direction on adjacent pairs (what the
  spanning/sync solvers actually consume),
* pose error of the oracle-best direction (role-asymmetry ceiling),
* whether the MST edge selection lands on truly adjacent pairs.

Usage:
    python tools/pairwise_probe.py --run_dir TRG/vaser_bfp_fc \
        [--ks 3,4,6,8] [--seeds 8] [--family vase]

The reference has no multi-piece code (SURVEY.md par. 0); this probes the
beyond-reference assembly stack (assembly/).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def rot_err(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def probe(model, variables, family, ks, seeds, npoint, measure_refine=0,
          tta_gauges=0, tta_mag=0.8, cut="plane", dir_fuse=0.0,
          cons_w=0.0):
    import jax
    import jax.numpy as jnp

    from puzzlenet_tpu.assembly import (fragment_cloud, scatter_pieces,
                                        spanning)
    from puzzlenet_tpu.data import synthetic_clouds
    rows = []
    for K in ks:
        chosen_errs, oracle_errs, mst_adj = [], [], []
        for seed in range(seeds):
            rng = np.random.default_rng(seed)
            cloud = synthetic_clouds(family, count=1, n_points=8192,
                                     seed=100000 + seed)[0]
            pieces = fragment_cloud(cloud, K, npoint, rng, cut=cut)
            # adjacency threshold scaled to the sampling density: truly
            # adjacent fragments meet at ~one point-spacing across the
            # cut (a fixed constant breaks at other --num_points)
            d00 = ((pieces[0][:, None] - pieces[0][None]) ** 2).sum(-1)
            np.fill_diagonal(d00, np.inf)
            spacing2 = float(np.median(d00.min(axis=1)))
            thresh = 6.25 * spacing2          # (2.5 x spacing)^2
            adj = np.zeros((K, K), bool)
            for i in range(K):
                for j in range(i + 1, K):
                    d = np.min(((pieces[i][:, None] - pieces[j][None]) ** 2
                                ).sum(-1))
                    adj[i, j] = adj[j, i] = d < thresh
            scattered, gts = scatter_pieces(pieces, rng)
            stack = jnp.asarray(np.stack(scattered))
            pairs = [(i, j) for i in range(K) for j in range(K) if i != j]
            pos = {ij: p for p, ij in enumerate(pairs)}
            idx_i = jnp.asarray([i for i, _ in pairs], jnp.int32)
            idx_j = jnp.asarray([j for _, j in pairs], jnp.int32)
            active = jnp.ones(K, bool)
            # THE assembler measurement front-end (scoring + TTA +
            # composed refinement), so the probe measures exactly what
            # the assemblers consume
            mats_dev, scores, _, _ = spanning.measure_all_pairs(
                model, variables, stack, active, idx_i, idx_j,
                measure_refine=measure_refine, tta_gauges=tta_gauges,
                tta_mag=tta_mag, tta_seed=seed)
            mats = np.asarray(mats_dev)
            scores = np.asarray(scores)
            if dir_fuse or cons_w:
                # the assemblers' direction-consistency fusion — the
                # probe then reports the error of exactly what a fused
                # assembler consumes
                mats, scores, _ = spanning.symmetrize_measurements(
                    mats, scores, pos, K, dir_fuse, cons_w)
            for i in range(K):
                for j in range(i + 1, K):
                    if not adj[i, j]:
                        continue
                    pf, pr = pos[(i, j)], pos[(j, i)]
                    Mstar = gts[i] @ np.linalg.inv(gts[j])
                    e_f = rot_err(mats[pf][:3, :3], Mstar[:3, :3])
                    e_r = rot_err(mats[pr][:3, :3],
                                  np.linalg.inv(Mstar)[:3, :3])
                    chosen_errs.append(
                        e_f if scores[pf] <= scores[pr] else e_r)
                    oracle_errs.append(min(e_f, e_r))
            tree = spanning._mst(
                K, lambda a, b: min(scores[pos[(a, b)]],
                                    scores[pos[(b, a)]]))
            mst_adj.append(np.mean([adj[a][b] for a, b in tree]))
        c, o = np.asarray(chosen_errs), np.asarray(oracle_errs)
        row = {"k": K,
               "chosen_p50": float(np.median(c)),
               "chosen_p90": float(np.percentile(c, 90)),
               "oracle_p50": float(np.median(o)),
               "frac_chosen_lt10deg": float(np.mean(c < 10)),
               "mst_adjacent_frac": float(np.mean(mst_adj)),
               "n_adjacent_pairs": int(len(c))}
        rows.append(row)
        print(f"K={K}: adj-pair rot err, chosen-dir p50={row['chosen_p50']:.1f} "
              f"p90={row['chosen_p90']:.1f} | oracle-dir "
              f"p50={row['oracle_p50']:.1f} | frac chosen<10deg="
              f"{row['frac_chosen_lt10deg']:.2f} | MST edges adjacent="
              f"{row['mst_adjacent_frac']:.2f}", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ks", default="3,4,6,8")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--family", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--measure_refine", type=int, default=0,
                   help="batched composed-refinement rounds applied to "
                        "every pair measurement before scoring the "
                        "errors (the assemblers' measure_refine knob)")
    p.add_argument("--tta_gauges", type=int, default=0,
                   help="gauge-augmented re-measurement rounds (the "
                        "assemblers' tta_gauges knob)")
    p.add_argument("--tta_mag", type=float, default=0.8)
    p.add_argument("--dir_fuse", type=float, default=0.0,
                   help="direction-consistency fusion gate in degrees "
                        "(the assemblers' dir_fuse knob; 0 = off)")
    p.add_argument("--cons_w", type=float, default=0.0,
                   help="consistency score penalty weight (the "
                        "assemblers' cons_w knob)")
    p.add_argument("--cut", default=None,
                   choices=("plane", "sphere", "cylinder", "cone"),
                   help="fragmentation cut primitive (default: the run's "
                        "training category's slicer)")
    args = p.parse_args(argv)

    from puzzlenet_tpu.data.registry import _NAMES, category_cut
    from tools.assembly_bench import load_model

    model, variables, cfg = load_model(args.run_dir, args.num_points)
    family = args.family or _NAMES.get(cfg.dataset, (None, "vase"))[1]
    cut = args.cut or category_cut(cfg.dataset)
    ks = [int(x) for x in args.ks.split(",")]
    rows = probe(model, variables, family, ks, args.seeds, args.num_points,
                 measure_refine=args.measure_refine,
                 tta_gauges=args.tta_gauges, tta_mag=args.tta_mag,
                 cut=cut, dir_fuse=args.dir_fuse, cons_w=args.cons_w)
    if args.out:
        import json
        with open(args.out, "w") as f:
            json.dump({"run_dir": args.run_dir, "family": family,
                       "cut": cut,
                       "measure_refine": args.measure_refine,
                       "tta_gauges": args.tta_gauges,
                       "tta_mag": args.tta_mag,
                       "dir_fuse": args.dir_fuse,
                       "cons_w": args.cons_w,
                       "rows": rows}, f, indent=2)
        print("wrote", args.out)
    return rows


if __name__ == "__main__":
    main()
