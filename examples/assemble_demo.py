"""Multi-piece reassembly demo (BASELINE.json config #4).

Splits a synthetic vase cloud into K fragments, scatters them with random
rigid motions, and reassembles with the greedy pairwise loop using a trained
checkpoint. Reports per-round pair scores and the final chamfer between the
assembled cloud and the original.

    python examples/assemble_demo.py --run_dir TRG/vaser_demo --pieces 3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default=None,
                   help="trained run dir (random weights if omitted)")
    p.add_argument("--pieces", type=int, default=3)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_ply", default=None,
                   help="write assembled cloud to this .ply")
    args = p.parse_args(argv)

    from puzzlenet_tpu import viz
    from puzzlenet_tpu.assembly import (fragment_cloud, greedy_assemble,
                                        scatter_pieces)
    from puzzlenet_tpu.data import synthetic_clouds
    from puzzlenet_tpu.models import PuzzleNet
    from puzzlenet_tpu.ops import chamfer_loss

    rng = np.random.default_rng(args.seed)
    cloud = synthetic_clouds("vase", count=1, n_points=8192,
                             seed=args.seed)[0]
    pieces = fragment_cloud(cloud, args.pieces, args.num_points, rng)
    scattered, _ = scatter_pieces(pieces, rng)
    print(f"{args.pieces} pieces of {args.num_points} points each")

    model = PuzzleNet(num_points=args.num_points)
    if args.run_dir:
        from puzzlenet_tpu.core.config import Config
        from puzzlenet_tpu.train.losses import Batch
        from puzzlenet_tpu.train.trainer import Trainer

        cfg = Config.load(args.run_dir)
        cfg.output_path = args.run_dir
        trainer = Trainer(cfg)
        example = Batch(*[jnp.zeros((1, args.num_points, 3))] * 2,
                        jnp.zeros((1, 4, 4)),
                        jnp.zeros((1, args.num_points, 3)),
                        jnp.zeros((1, 128, 3)), jnp.zeros((1, 128, 3)),
                        jnp.zeros((1, args.num_points)),
                        jnp.zeros((1, args.num_points)))
        state = trainer.init_state(example)
        state = trainer.restore_checkpoint(
            state, os.path.join(args.run_dir, "checkpoints"))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        model = trainer.model
        print(f"loaded checkpoint from {args.run_dir}")
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros(
            (1, args.num_points, 3)), jnp.zeros((1, args.num_points, 3)),
            train=False)
        print("using untrained weights (pass --run_dir for a real model)")

    result = greedy_assemble(model, variables, scattered,
                             num_points=args.num_points)
    print("merge order:", result.merge_order)
    print("pair scores:", [f"{s:.4f}" for s in result.scores])

    # quality: chamfer(assembled, FPS of the original whole cloud)
    from puzzlenet_tpu.data.augment import fps_np
    gt = fps_np(cloud, args.num_points, rng=np.random.default_rng(1))
    cd = float(chamfer_loss(jnp.asarray(result.assembled)[None],
                            jnp.asarray(gt)[None])[0])
    # baseline: chamfer of the scattered (unassembled) union
    un = np.concatenate(scattered)[:args.num_points]
    cd0 = float(chamfer_loss(jnp.asarray(un)[None],
                             jnp.asarray(gt)[None])[0])
    print(f"chamfer(assembled, original) = {cd:.4f}")
    print(f"chamfer(scattered,  original) = {cd0:.4f}")
    if args.save_ply:
        viz.save_ply(args.save_ply, result.assembled)
        print("wrote", args.save_ply)
    return cd, cd0


if __name__ == "__main__":
    main()
