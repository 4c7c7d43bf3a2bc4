"""Multi-piece assembly quality/perf benchmark (BASELINE.json config #4).

Protocol (VERDICT r2 item 1): pad the greedy loop to a fixed 8-slot stack
so ONE compiled program pair serves every K, then measure N=3..8 fragments
x >= 20 seeds each: wall time per assembly, final chamfer to the uncut
cloud, and success rate. Emits a markdown table + JSON.

    python tools/assembly_bench.py --run_dir TRG/vaser_r2b \
        --seeds 20 --out TRG/assembly_bench.json

The reference has no assembly code at all (SURVEY.md par.0) — these are the
first published numbers for the paper's described multi-piece behavior.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax.numpy as jnp
import numpy as np


def load_model(run_dir, num_points):
    from puzzlenet_tpu.core.config import Config
    from puzzlenet_tpu.train.losses import Batch
    from puzzlenet_tpu.train.trainer import Trainer

    cfg = Config.load(run_dir)
    cfg.output_path = run_dir
    trainer = Trainer(cfg)
    example = Batch(*[jnp.zeros((1, num_points, 3))] * 2,
                    jnp.zeros((1, 4, 4)),
                    jnp.zeros((1, num_points, 3)),
                    jnp.zeros((1, 128, 3)), jnp.zeros((1, 128, 3)),
                    jnp.zeros((1, num_points)), jnp.zeros((1, num_points)))
    state = trainer.init_state(example)
    state = trainer.restore_checkpoint(
        state, os.path.join(run_dir, "checkpoints"))
    return trainer.model, {"params": state.params,
                           "batch_stats": state.batch_stats}, cfg


def one_problem(family, seed, k, npoint, cache_dir=None, cut="plane"):
    if cache_dir:
        tag = "" if cut == "plane" else f"_{cut}"
        path = os.path.join(cache_dir,
                            f"{family}{tag}_{k}_{seed}_{npoint}.npz")
        if os.path.exists(path):
            z = np.load(path)
            if "g0" in z:        # caches from before gts were stored
                return (z["cloud"], [z[f"p{i}"] for i in range(k)],
                        [z[f"g{i}"] for i in range(k)])

    from puzzlenet_tpu.assembly import fragment_cloud, scatter_pieces
    from puzzlenet_tpu.data import synthetic_clouds

    rng = np.random.default_rng(seed)
    # seed offset: evaluation clouds, disjoint from the training seeds
    cloud = synthetic_clouds(family, count=1, n_points=8192,
                             seed=100000 + seed)[0]
    pieces = fragment_cloud(cloud, k, npoint, rng, cut=cut)
    scattered, gts = scatter_pieces(pieces, rng)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, cloud=cloud,
                 **{f"p{i}": p for i, p in enumerate(scattered)},
                 **{f"g{i}": g for i, g in enumerate(gts)})
    return cloud, scattered, gts


def pose_errors(piece_transforms, gts):
    """Per-piece pose error of an assembly: the recovered pose should
    invert each piece's scatter motion (anchor frame, piece 0 exact).
    Returns (rotation errors deg, translation errors) over pieces 1..K-1.
    """
    rerrs, terrs = [], []
    for t, g in zip(piece_transforms[1:], gts[1:]):
        ideal = np.linalg.inv(g)
        c = (np.trace(t[:3, :3].T @ ideal[:3, :3]) - 1) / 2
        rerrs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        terrs.append(np.linalg.norm(t[:3, 3] - ideal[:3, 3]))
    return rerrs, terrs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--family", default=None,
                   help="synthetic family (default: from the run's dataset)")
    p.add_argument("--cut", default=None,
                   choices=("plane", "sphere", "cylinder", "cone"),
                   help="fragmentation cut primitive (default: the run's "
                        "training category's slicer — curved-cut "
                        "checkpoints get matching curved fractures)")
    p.add_argument("--k_min", type=int, default=3)
    p.add_argument("--k_max", type=int, default=8)
    p.add_argument("--seeds", type=int, default=20)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--success_cd", type=float, default=0.02,
                   help="assembly counts as a success when "
                        "chamfer(assembled, original) < this")
    p.add_argument("--out", default=None, help="write JSON results here")
    p.add_argument("--cache_dir", default=None,
                   help="cache generated problems as npz here (host-side "
                        "fragmenting is ~2 s/problem at K=8)")
    p.add_argument("--refine_iters", type=int, default=0,
                   help="pose-refinement forwards per merge")
    p.add_argument("--icp_iters", type=int, default=0,
                   help="boundary-ICP iterations per merge")
    p.add_argument("--algo", choices=("greedy", "spanning", "sync",
                                      "ensemble", "hierarchical"),
                   default="greedy",
                   help="greedy re-merging / MST pose graph / global "
                        "pose synchronization / verified hypothesis "
                        "ensemble / recursive bipartition with verified "
                        "cluster merges")
    p.add_argument("--base_k", type=int, default=4,
                   help="hierarchical only: flat-ensemble leaf size")
    p.add_argument("--beam_cuts", type=int, default=1,
                   help="hierarchical only: top-level beam over this "
                        "many balanced MST bipartitions")
    p.add_argument("--sync_iters", type=int, default=0,
                   help="sync only: iterative re-measurement rounds on "
                        "the posed stack (assembly/sync.py)")
    p.add_argument("--grow", action="store_true",
                   help="greedy only: accretion mode — grow one cluster "
                        "instead of free pair merging")
    p.add_argument("--keep_frac", type=float, default=None,
                   help="sync only: fraction of undirected pairs fed to "
                        "the solver (default 0.6; 1.0 = all, relying on "
                        "IRLS to downweight outliers)")
    p.add_argument("--polish_iters", type=int, default=0,
                   help="sync/ensemble: joint boundary-contact pose "
                        "polish steps (assembly/polish.py)")
    p.add_argument("--repair_iters", type=int, default=0,
                   help="ensemble only: verification-guided worst-piece "
                        "repair iterations (assembly/ensemble.py)")
    p.add_argument("--ensemble_greedy", action="store_true",
                   help="ensemble only: also verify the accretion-greedy "
                        "poses as a hypothesis")
    p.add_argument("--tta_gauges", type=int, default=0,
                   help="spanning/sync/ensemble/hierarchical: gauge-"
                        "augmented re-measurement rounds (keep the best "
                        "fit score per pair; assembly/spanning.py)")
    p.add_argument("--tta_mag", type=float, default=0.8,
                   help="TTA gauge twist amplitude")
    p.add_argument("--cc_iters", type=int, default=0,
                   help="ensemble/hierarchical: cluster-complement "
                        "refinement rounds of the final poses "
                        "(assembly/complement.py)")
    p.add_argument("--measure_refine", type=int, default=0,
                   help="spanning/sync/ensemble: batched composed-"
                        "refinement rounds of ALL pair measurements "
                        "before any solve (assembly/spanning.py)")
    p.add_argument("--dir_fuse", type=float, default=0.0,
                   help="direction-consistency fusion gate in degrees: "
                        "replace both directions of unordered pairs that "
                        "agree within this angle by their chordal mean "
                        "(spanning.symmetrize_measurements; 0 = off)")
    p.add_argument("--cons_w", type=float, default=0.0,
                   help="add cons_w x direction-composition residual to "
                        "pair fit scores before edge selection")
    args = p.parse_args(argv)

    from puzzlenet_tpu.assembly import (ensemble_assemble, greedy_assemble,
                                        hierarchical_assemble,
                                        spanning_assemble, sync_assemble)
    from puzzlenet_tpu.data.augment import fps_np
    from puzzlenet_tpu.data.registry import _NAMES, category_cut
    from puzzlenet_tpu.ops import chamfer_loss

    model, variables, cfg = load_model(args.run_dir, args.num_points)
    family = args.family or _NAMES.get(cfg.dataset, (None, "vase"))[1]
    cut = args.cut or category_cut(cfg.dataset)
    print(f"model: {args.run_dir} (dataset={cfg.dataset}, family={family}, "
          f"cut={cut}, algo={args.algo})")
    assemble = {"greedy": greedy_assemble, "spanning": spanning_assemble,
                "sync": sync_assemble, "ensemble": ensemble_assemble,
                "hierarchical": hierarchical_assemble}[args.algo]
    if args.algo == "hierarchical":
        assemble = functools.partial(assemble, base_k=args.base_k,
                                     beam_cuts=args.beam_cuts)
    elif args.beam_cuts > 1:
        p.error("--beam_cuts requires --algo hierarchical")
    if args.sync_iters:
        if args.algo != "sync":
            p.error("--sync_iters requires --algo sync")
        assemble = functools.partial(assemble, sync_iters=args.sync_iters)
    if args.grow:
        if args.algo != "greedy":
            p.error("--grow requires --algo greedy")
        assemble = functools.partial(assemble, grow=True)
    if args.keep_frac is not None:
        if args.algo != "sync":
            p.error("--keep_frac requires --algo sync")
        assemble = functools.partial(assemble, keep_frac=args.keep_frac)
    if args.polish_iters:
        if args.algo not in ("sync", "ensemble", "hierarchical"):
            p.error("--polish_iters requires --algo sync/ensemble/"
                    "hierarchical")
        assemble = functools.partial(assemble,
                                     polish_iters=args.polish_iters)
    if args.ensemble_greedy:
        if args.algo != "ensemble":
            p.error("--ensemble_greedy requires --algo ensemble")
        assemble = functools.partial(assemble, include_greedy=True)
    if args.repair_iters:
        if args.algo not in ("ensemble", "hierarchical"):
            p.error("--repair_iters requires --algo ensemble/hierarchical")
        assemble = functools.partial(assemble,
                                     repair_iters=args.repair_iters)
    if args.measure_refine:
        if args.algo == "greedy":
            p.error("--measure_refine requires --algo spanning/sync/"
                    "ensemble")
        assemble = functools.partial(assemble,
                                     measure_refine=args.measure_refine)
    if args.cc_iters:
        if args.algo not in ("ensemble", "hierarchical"):
            p.error("--cc_iters requires --algo ensemble/hierarchical")
        assemble = functools.partial(assemble, cc_iters=args.cc_iters)
    if args.tta_gauges:
        if args.algo == "greedy":
            p.error("--tta_gauges requires --algo spanning/sync/"
                    "ensemble/hierarchical")
        assemble = functools.partial(assemble, tta_gauges=args.tta_gauges,
                                     tta_mag=args.tta_mag)
    if args.dir_fuse or args.cons_w:
        if args.algo == "greedy":
            p.error("--dir_fuse/--cons_w require --algo spanning/sync/"
                    "ensemble/hierarchical")
        assemble = functools.partial(assemble, dir_fuse=args.dir_fuse,
                                     cons_w=args.cons_w)

    # warmup: compile the padded-8 program pair once (K=k_max slots)
    cloud, scattered, _ = one_problem(family, 0, args.k_min,
                                      args.num_points, args.cache_dir,
                                      cut=cut)
    t0 = time.perf_counter()
    r = assemble(model, variables, scattered, pad_to=args.k_max,
                 refine_iters=args.refine_iters, icp_iters=args.icp_iters)
    np.asarray(r.assembled)
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s")

    rows = []
    for k in range(args.k_min, args.k_max + 1):
        cds, cd0s, walls, rerrs, terrs = [], [], [], [], []
        for seed in range(args.seeds):
            cloud, scattered, gts = one_problem(
                family, seed, k, args.num_points, args.cache_dir, cut=cut)
            t0 = time.perf_counter()
            r = assemble(model, variables, scattered,
                         pad_to=args.k_max,
                         refine_iters=args.refine_iters,
                         icp_iters=args.icp_iters)
            assembled = np.asarray(r.assembled)   # host readback = sync
            walls.append(time.perf_counter() - t0)
            re_, te_ = pose_errors(r.piece_transforms, gts)
            rerrs += re_
            terrs += te_

            gt = fps_np(cloud, args.num_points,
                        rng=np.random.default_rng(1))
            cd = float(chamfer_loss(jnp.asarray(assembled)[None],
                                    jnp.asarray(gt)[None])[0])
            un = fps_np(np.concatenate(scattered), args.num_points,
                        rng=np.random.default_rng(1))
            cd0 = float(chamfer_loss(jnp.asarray(un)[None],
                                     jnp.asarray(gt)[None])[0])
            cds.append(cd)
            cd0s.append(cd0)
        cds, walls = np.asarray(cds), np.asarray(walls)
        row = {
            "k": k,
            "wall_ms_mean": float(walls.mean() * 1e3),
            "wall_ms_p50": float(np.median(walls) * 1e3),
            "wall_ms_max": float(walls.max() * 1e3),
            "cd_mean": float(cds.mean()),
            "cd_p50": float(np.median(cds)),
            "cd_scattered_mean": float(np.mean(cd0s)),
            "success_rate": float((cds < args.success_cd).mean()),
            "r_err_p50": float(np.median(rerrs)),
            "t_err_p50": float(np.median(terrs)),
            "seeds": args.seeds,
        }
        rows.append(row)
        print(f"K={k}: wall {row['wall_ms_mean']:.0f} ms "
              f"(p50 {row['wall_ms_p50']:.0f}, max {row['wall_ms_max']:.0f})"
              f"  cd {row['cd_mean']:.4f} (p50 {row['cd_p50']:.4f}, "
              f"scattered {row['cd_scattered_mean']:.4f})  "
              f"success {row['success_rate']:.0%}  "
              f"r_err p50 {row['r_err_p50']:.1f} deg  "
              f"t_err p50 {row['t_err_p50']:.3f}", flush=True)

    # recompile check: after warmup every assembly is pure execution; a
    # stray recompile would show as a >> p50 outlier in its row's max
    print("\n| K | wall ms (p50) | cd mean | cd p50 | scattered cd | "
          "success | r_err p50 | t_err p50 |")
    print("|---|---|---|---|---|---|---|---|")
    for row in rows:
        print(f"| {row['k']} | {row['wall_ms_p50']:.0f} "
              f"| {row['cd_mean']:.4f} | {row['cd_p50']:.4f} "
              f"| {row['cd_scattered_mean']:.4f} "
              f"| {row['success_rate']:.0%} "
              f"| {row['r_err_p50']:.1f} | {row['t_err_p50']:.3f} |")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"run_dir": args.run_dir, "family": family,
                       "cut": cut,
                       "success_cd": args.success_cd, "algo": args.algo,
                       "refine_iters": args.refine_iters,
                       "icp_iters": args.icp_iters,
                       "sync_iters": args.sync_iters,
                       "repair_iters": args.repair_iters,
                       "measure_refine": args.measure_refine,
                       "cc_iters": args.cc_iters,
                       "tta_gauges": args.tta_gauges,
                       "tta_mag": args.tta_mag,
                       "dir_fuse": args.dir_fuse,
                       "cons_w": args.cons_w,
                       "base_k": args.base_k,
                       "beam_cuts": args.beam_cuts,
                       "keep_frac": args.keep_frac,
                       "grow": args.grow, "rows": rows}, f,
                      indent=2)
        print("wrote", args.out)
    return rows


if __name__ == "__main__":
    main()
