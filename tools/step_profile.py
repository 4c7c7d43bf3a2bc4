"""Step-breakdown profiler: where the training-step milliseconds go.

Times each component of the flagship training step as a standalone jitted
program at the SAME shapes the step uses (B x 1024 pts), plus the composed
forward / loss-grad / full-step programs, and prints a table. This is the
measurement tool behind PERFORMANCE.md's kernel table and the <= 40 ms
step target — component timings include one device->host sync each (the
remote-TPU tunnel adds ~1.5 ms dispatch per standalone call; composed
programs amortize it, so components can sum past the composed total).

    python tools/step_profile.py [--batch 64] [--bf16] [--boundary_fp]
        [--iters 20] [--json out.json]

Reference hot path being decomposed: model5_b.py:912-1155 (training_step),
pointnet_util.py:53-136 (FPS/kNN/gather), emd_kernel.cu:26-158 (EMD).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _sync(r):
    import numpy as np
    leaves = [x for x in jax.tree_util.tree_leaves(r)
              if hasattr(x, "ravel")]
    np.asarray(leaves[0].ravel()[0])


import jax  # noqa: E402  (after sys.path fix)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(fn, *args, iters=20, warmup=3):
    """Median wall ms per call of a jitted fn, host-readback synced."""
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def amortized(fn, reps):
    """Wrap ``fn`` so one dispatch runs it ``reps`` times serially.

    Per-call timing over the remote-TPU tunnel carries a ~1.5-36 ms
    dispatch+readback tax that can swamp ms-scale kernels (the r3
    step_profile artifact has a ~36 ms floor on every row). This wrapper
    chains ``reps`` executions inside ONE jitted fori_loop, serialized
    by a genuine data dependence: each rep's output is reduced into a
    scalar accumulator whose (vanishingly scaled) value perturbs the
    next rep's first float input — the add stays in the dataflow graph,
    so XLA cannot parallelize or elide reps, while the perturbation
    underflows to zero numerically. Timed cost = (wall - one dispatch)
    / reps ~= true device time."""
    from jax import lax

    @jax.jit
    def run(*args):
        leaves, treedef = jax.tree_util.tree_flatten(args)

        def body(_, carry):
            acc, lvs = carry
            out = fn(*jax.tree_util.tree_unflatten(treedef, lvs))
            l0 = jax.tree_util.tree_leaves(out)[0]
            acc = acc + jnp.sum(l0).astype(jnp.float32)
            lvs = list(lvs)
            for i, lf in enumerate(lvs):
                if jnp.issubdtype(lf.dtype, jnp.floating):
                    lvs[i] = lf + (acc * 1e-38).astype(lf.dtype)
                    break
            return acc, lvs

        acc, _ = lax.fori_loop(0, reps, body, (jnp.float32(0), leaves))
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--boundary_fp", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--amortize", type=int, default=0,
                    help="run each component this many times inside ONE "
                         "dispatch (fori_loop chain) and report per-rep "
                         "device time — removes the remote-tunnel "
                         "per-dispatch tax from every row")
    ap.add_argument("--loss_mode", type=int, default=1)
    ap.add_argument("--layout_ts", action="store_true",
                    help="profile with the _LAYOUT_TS hybrid SG "
                         "selection layout (ops/sg_pallas.py) for the "
                         "row-major-vs-hybrid hardware A/B")
    ap.add_argument("--extract2", action="store_true",
                    help="profile with _EXTRACT2 pair extraction "
                         "(two winners per lane reduce, ops/sg_pallas.py)")
    ap.add_argument("--json", default=None)
    ns = ap.parse_args()

    if ns.layout_ts:
        from puzzlenet_tpu.ops import sg_pallas
        sg_pallas._LAYOUT_TS = True
        print("  (SG selection: _LAYOUT_TS hybrid layout)", flush=True)
    if ns.extract2:
        from puzzlenet_tpu.ops import sg_pallas
        sg_pallas._EXTRACT2 = True
        print("  (SG selection: _EXTRACT2 pair extraction)", flush=True)

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from puzzlenet_tpu.models import PuzzleNet
    from puzzlenet_tpu.models.encoder import PCTEncoder
    from puzzlenet_tpu.ops import farthest_point_sample, index_points
    from puzzlenet_tpu.ops.chamfer import chamfer_distances
    from puzzlenet_tpu.ops.emd import earth_mover_distance
    from puzzlenet_tpu.ops.sg_pallas import fused_set_abstraction
    from puzzlenet_tpu.train.losses import Batch, LossFlags
    from puzzlenet_tpu.train.trainer import (TrainState, _loss_fn,
                                             make_optimizer, train_step)
    from puzzlenet_tpu.core.config import Config

    B, n = ns.batch, ns.n
    dt = jnp.bfloat16 if ns.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    fpc, mrpc, rpc = f32(B, n, 3), f32(B, n, 3), f32(B, n, 3)

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"  {name:<34s} {ms:8.2f} ms", flush=True)

    if ns.amortize:
        _bench = bench

        def bench_am(fn, *args, iters=ns.iters, warmup=None):
            wrapped = amortized(fn, ns.amortize)
            base = _bench(wrapped, *args, iters=max(3, iters // 3))
            # one dispatch+readback still rides on top; subtract the
            # measured empty-loop cost of this wrapper form
            return max(0.0, (base - _dispatch_ms)) / ns.amortize

        _dispatch_ms = _bench(amortized(lambda x: x, ns.amortize), fpc,
                              iters=5)
        print(f"  (amortize={ns.amortize}; dispatch floor "
              f"{_dispatch_ms:.2f} ms subtracted)")
        globals()['bench'] = bench_am

    print(f"# step_profile  B={B} n={n} bf16={ns.bf16} "
          f"boundary_fp={ns.boundary_fp} backend={jax.default_backend()}")

    # ---- primitive ops at model shapes -------------------------------
    bf16_mm = ns.bf16
    fps_j = jax.jit(functools.partial(farthest_point_sample, npoint=512))
    add("fps 1024->512", bench(fps_j, fpc, iters=ns.iters))

    x1 = index_points(fpc, farthest_point_sample(fpc, 512))
    feats1 = f32(B, n, 64)
    w3, b3 = f32(67, 128), jnp.zeros((128,))
    w4, b4 = f32(128, 128), jnp.zeros((128,))
    sg1 = jax.jit(lambda *a: fused_set_abstraction(*a, 32, bf16_mm))
    add("sg stage1 fwd (no-grad primal)",
        bench(sg1, x1, fpc, feats1, w3, b3, w4, b4, iters=ns.iters))
    sg1g = jax.jit(jax.grad(
        lambda *a: jnp.sum(fused_set_abstraction(*a, 32, bf16_mm)),
        argnums=(0, 1, 2, 3, 4, 5, 6)))
    add("sg stage1 fwd+bwd",
        bench(sg1g, x1, fpc, feats1, w3, b3, w4, b4, iters=ns.iters))

    x2 = x1[:, :256]
    f1f = f32(B, 512, 128)
    w5, b5 = f32(131, 256), jnp.zeros((256,))
    w6, b6 = f32(256, 256), jnp.zeros((256,))
    add("sg stage2 fwd (no-grad primal)",
        bench(sg1, x2, x1, f1f, w5, b5, w6, b6, iters=ns.iters))
    add("sg stage2 fwd+bwd",
        bench(sg1g, x2, x1, f1f, w5, b5, w6, b6, iters=ns.iters))

    # attention stack alone (4 blocks at [B, 256, 256])
    import flax.linen as nn
    from puzzlenet_tpu.models.encoder import OffsetAttention

    class AttStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            outs = []
            for i in range(4):
                x, _ = OffsetAttention(256, dtype=dt, name=f"a{i}")(x)
                outs.append(x)
            return jnp.concatenate(outs, axis=-1)

    att_in = f32(B, 256, 256)
    att = AttStack()
    att_vars = att.init(jax.random.PRNGKey(0), att_in)
    att_j = jax.jit(lambda v, x: att.apply(v, x))
    add("attention stack (4 blocks) fwd",
        bench(att_j, att_vars, att_in, iters=ns.iters))
    att_g = jax.jit(jax.grad(
        lambda v, x: jnp.sum(att.apply(v, x)), argnums=(0, 1)))
    add("attention stack fwd+bwd",
        bench(att_g, att_vars, att_in, iters=ns.iters))

    # loss kernels
    emd_j = jax.jit(earth_mover_distance)
    add("emd 1024x1024 fwd", bench(emd_j, mrpc, rpc, iters=ns.iters))
    emd_g = jax.jit(jax.grad(
        lambda a, b: jnp.sum(earth_mover_distance(a, b)), argnums=(0, 1)))
    add("emd fwd+bwd", bench(emd_g, mrpc, rpc, iters=ns.iters))

    cd_j = jax.jit(lambda a, b: chamfer_distances(a, b))
    add("chamfer fwd", bench(cd_j, mrpc, rpc, iters=ns.iters))
    cd_g = jax.jit(jax.grad(
        lambda a, b: sum(jnp.sum(x) for x in chamfer_distances(a, b)),
        argnums=(0, 1)))
    add("chamfer fwd+bwd", bench(cd_g, mrpc, rpc, iters=ns.iters))

    if ns.boundary_fp:
        from puzzlenet_tpu.ops.interp_pallas import three_nn_interpolate
        fi = f32(B, 512, 128)
        it_j = jax.jit(three_nn_interpolate)
        add("3-NN interp fwd", bench(it_j, fpc, x1, fi, iters=ns.iters))
        it_g = jax.jit(jax.grad(
            lambda a, b, c: jnp.sum(three_nn_interpolate(a, b, c)),
            argnums=(0, 1, 2)))
        add("3-NN interp fwd+bwd", bench(it_g, fpc, x1, fi, iters=ns.iters))

    # ---- composed programs -------------------------------------------
    model = PuzzleNet(num_points=n, boundary_fp=ns.boundary_fp, dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), fpc, mrpc, train=False)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
    add("model fwd (inference)", bench(fwd, variables, fpc, mrpc,
                                       iters=ns.iters))

    enc = PCTEncoder(num_points=n, dtype=dt)
    enc_vars = enc.init(jax.random.PRNGKey(0), fpc)
    enc_j = jax.jit(lambda v, a: enc.apply(v, a, train=False))
    add("one encoder tower fwd", bench(enc_j, enc_vars, fpc,
                                       iters=ns.iters))

    flags = LossFlags(loss_mode=ns.loss_mode, bnd_ce_w=7.0)
    batch = Batch(fpc=fpc, mrpc=mrpc, igt=jnp.tile(jnp.eye(4), (B, 1, 1)),
                  rpc=rpc, fpcb=fpc[:, :128], rpcb=rpc[:, :128],
                  fpc_idx=jnp.zeros((B, n), jnp.int32),
                  rpc_idx=jnp.zeros((B, n), jnp.int32))

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    lg = jax.jit(jax.grad(
        lambda p, bs, bt: _loss_fn(model, p, bs, bt, flags, False)[0],
        argnums=0))
    add("loss fwd+bwd (grad only)", bench(lg, params, bstats, batch,
                                          iters=ns.iters))

    cfg = Config(lr=9e-4)
    tx = make_optimizer(cfg)
    state = TrainState(params=params, batch_stats=bstats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))

    # train_step donates state — rebuild it each iteration is wrong (adds
    # H2D); instead chain states like the trainer does
    step_j = functools.partial(train_step, model, tx, flags, False)
    st = state
    for _ in range(3):
        st, m = step_j(st, batch)
        _sync(m)
    ts = []
    for _ in range(ns.iters):
        t0 = time.perf_counter()
        st, m = step_j(st, batch)
        _sync(m)
        ts.append((time.perf_counter() - t0) * 1e3)
    add("FULL train step (fwd+bwd+adam)", float(np.median(ts)))

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump({"batch": B, "n": n, "bf16": ns.bf16,
                       "boundary_fp": ns.boundary_fp,
                       "backend": jax.default_backend(),
                       "rows": dict(rows)}, f, indent=1)
        print(f"wrote {ns.json}")


if __name__ == "__main__":
    main()
