"""Training harness.

Capability parity with the Lightning setup (train.py:75-136 +
TouchedRegraster.configure_optimizers / training_epoch_end,
model5_b.py:1157-1170, 1453-1457):

* Adam with the reference schedule lr * 0.999^(step // 50) stepped per step
* pretrain gate: epoch < pretrain_epochs runs the pose-only predict6 path
* per-epoch mean loss; writes ``stop.txt`` when it drops below 7
  (model5_b.py:1165-1170)
* checkpointing: top-2 by train_loss, every ``save_on_epochs`` epochs
  (orbax CheckpointManager replacing Lightning ModelCheckpoint,
  train.py:119-124), config embedded so eval can reconstruct the run
* validation every ``check_val_every_n_epoch`` epochs (train.py:132) with
  the val/* metric suite (model5_b.py:1172-1277)
* TensorBoard scalars with the reference tag names, mesh + attention viz

TPU-native: the train step is a single jitted function over a
('data','model') mesh — batch sharded on data (gradient all-reduce is
inserted by XLA), large kernels optionally column-sharded on model.
"""

import functools
import os
from typing import Any

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..core.sharding import make_mesh, shard_batch, shard_params
from ..models import PuzzleNet
from .. import metrics as M
from ..semath import se3
from .loader import Loader
from .logging_util import TBLogger
from .losses import Batch, LossFlags, compute_losses


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(base_lr):
    """StepLR(step_size=50, gamma=0.999) applied per step
    (model5_b.py:1453-1457)."""
    def schedule(step):
        return base_lr * jnp.power(0.999, step // 50)
    return schedule


def make_optimizer(cfg):
    return optax.adam(lr_schedule(cfg.lr))


def _loss_fn(model, params, batch_stats, batch, flags, pretrain):
    variables = {"params": params, "batch_stats": batch_stats}
    out, mutated = model.apply(
        variables, batch.fpc, batch.mrpc, train=True, pretrain=pretrain,
        mutable=["batch_stats"])
    loss, metrics = compute_losses(out, batch, flags, pretrain)
    return loss, (metrics, mutated["batch_stats"])


@functools.partial(jax.jit, static_argnames=("model", "tx", "flags",
                                             "pretrain"),
                   donate_argnames=("state",))
def train_step(model, tx, flags, pretrain, state, batch):
    """One optimizer step. ``state`` is donated: params/opt buffers update
    in place on device (halves optimizer HBM traffic); callers must not
    reuse the old state object after the call."""
    grad_fn = jax.value_and_grad(_loss_fn, argnums=1, has_aux=True)
    (_, (metrics, new_bs)), grads = grad_fn(
        model, state.params, state.batch_stats, batch, flags, pretrain)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_bs, new_opt, state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("model", "pretrain"))
def viz_step(model, pretrain, state, batch):
    """Forward pass returning everything the TB visualizations need:
    the registered piece, stage-2 centroids + attention, and top-128
    predicted boundary points (model5_b.py:972-982, 1213-1227, 1268-1277
    call sites)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, batch.fpc, batch.mrpc, train=False,
                      pretrain=pretrain)
    mat = se3.exp(out.twist)
    de_mrpc = se3.transform_points(mat, batch.mrpc)
    vis = {"de_mrpc": de_mrpc, "fpc_x2": out.fpc_x2,
           "mrpc_x2": out.mrpc_x2, "fpc_attention": out.fpc_attention,
           "mrpc_attention": out.mrpc_attention}
    if not pretrain:
        from ..ops import index_points
        logits_f = jnp.swapaxes(out.fpcb_logits, 1, 2)
        logits_m = jnp.swapaxes(out.mrpcb_logits, 1, 2)
        _, top_f = jax.lax.top_k(logits_f[..., 1] - logits_f[..., 0], 128)
        _, top_m = jax.lax.top_k(logits_m[..., 1] - logits_m[..., 0], 128)
        de_fpcb = index_points(batch.fpc, top_f)
        de_mrpcb = se3.transform_points(
            mat, index_points(batch.mrpc, top_m))
        vis["de_fpcb"] = de_fpcb
        vis["de_mrpcb"] = de_mrpcb
    return vis


@functools.partial(jax.jit, static_argnames=("model", "pretrain", "flags"))
def eval_step(model, pretrain, state, batch, flags=None):
    """validation_step metric suite (model5_b.py:1172-1277). When ``flags``
    (a LossFlags) is given, the training loss terms are also evaluated on
    the val batch and logged under val/loss* — the scalars the reference's
    validation pass surfaces alongside the metrics."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, batch.fpc, batch.mrpc, train=False,
                      pretrain=pretrain)
    mat = se3.exp(out.twist)
    R, t = mat[:, :3, :3], mat[:, :3, 3]
    r_mse, r_mae, t_mse, t_mae, r_iso, t_iso = M.compute_pose_metrics(
        R, t, batch.igt)
    vals = {
        "val/r_mse": jnp.mean(r_mse), "val/r_mae": jnp.mean(r_mae),
        "val/t_mse": jnp.mean(t_mse), "val/t_mae": jnp.mean(t_mae),
        "val/r_isotropic": jnp.mean(r_iso),
        "val/t_isotropic": jnp.mean(t_iso),
    }
    if not pretrain:
        from .losses import _boundary_terms
        _, bmetrics = _boundary_terms(out, batch, mat,
                                      LossFlags(log_all=False))
        vals["val/fpc_iou"] = bmetrics["train/fpc_iou"]
        vals["val/mrpcb_iou"] = bmetrics["train/mrpcb_iou"]
    if flags is not None:
        from .losses import compute_losses
        loss, lmetrics = compute_losses(out, batch, flags, pretrain)
        vals["val/loss"] = loss
        for k, v in lmetrics.items():
            if k == "train_loss":
                continue        # already logged as val/loss
            # train/loss_re -> val/loss_re etc.; skip duplicated iou tags
            tag = k.replace("train/", "val/").replace("train_", "val_")
            vals.setdefault(tag, v)
    return vals


class Trainer:
    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh or make_mesh(cfg.mesh_data, cfg.mesh_model,
                                      batch_size=cfg.batch_size)
        self.model = PuzzleNet(
            num_points=cfg.num_points,
            asymmetric_global_quirk=cfg.asymmetric_global_quirk,
            boundary_fp=cfg.boundary_fp,
            dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
        self.tx = make_optimizer(cfg)
        self.flags = LossFlags(
            loss_mode=cfg.loss_mode, loss_sum=cfg.loss_sum,
            use_emd2=cfg.use_emd2, use_cd2=cfg.use_cd2,
            use_emd3=cfg.use_emd3, log_all=cfg.log_all_losses,
            bnd_ce_w=cfg.bnd_ce_w, bnd_cd_w=cfg.bnd_cd_w,
            bnd_w=cfg.bnd_w)
        # lazy: SummaryWriter creates event files at construction, and
        # read-only consumers (infer.Session.from_run, cli/test.py,
        # tools/) must not write into — or require write access to — a
        # training run's dir just to load its checkpoint
        self._logger = None
        self.ckpt_manager = None
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

    @property
    def logger(self):
        if self._logger is None:
            self._logger = TBLogger(
                os.path.join(self.cfg.output_path, "tb"))
        return self._logger

    # -- state ------------------------------------------------------------

    def init_state(self, example_batch: Batch, seed=None):
        seed = self.cfg.seed if seed is None else seed
        variables = self.model.init(
            jax.random.PRNGKey(seed), example_batch.fpc, example_batch.mrpc,
            train=False)
        params = shard_params(self.mesh, variables["params"])
        batch_stats = shard_params(self.mesh, variables["batch_stats"])
        opt_state = self.tx.init(params)
        # commit every state leaf to the mesh: freshly-created scalars
        # (adam count, step) otherwise carry SingleDeviceSharding, and the
        # first train_step output would change their sharding -> a silent
        # full recompile on step 2
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())

        def commit(x):
            if hasattr(x, "sharding") and isinstance(x.sharding,
                                                     NamedSharding):
                return x
            return jax.device_put(x, repl)

        opt_state = jax.tree_util.tree_map(commit, opt_state)
        step = jax.device_put(jnp.zeros((), jnp.int32), repl)
        return TrainState(params, batch_stats, opt_state, step)

    # -- checkpointing ----------------------------------------------------

    def _ckpt(self):
        if self.ckpt_manager is None:
            import orbax.checkpoint as ocp
            path = os.path.abspath(
                os.path.join(self.cfg.output_path, "checkpoints"))
            os.makedirs(path, exist_ok=True)
            self.ckpt_manager = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=2, best_fn=lambda m: m["train_loss"],
                    best_mode="min"),
            )
        return self.ckpt_manager

    def save_checkpoint(self, state, epoch, train_loss, pretrain=False):
        """Top-2-by-train_loss retention (the reference's Lightning
        ``save_top_k=2, monitor="train_loss"``, train.py:90-97) — with one
        fix: ``pretrain=True`` saves are recorded at +inf loss, making
        them evict-FIRST. The pose-only pretrain phase scores far lower
        raw losses than the full loss_mode-1 objective, so ranking the
        two phases on one scale let 1.5k-step pretrain checkpoints evict
        every main-phase save INCLUDING the final trained model (the
        reference has the same hazard, masked only by its default
        pretrain_epochs=0 recipe). Pretrain saves still serve crash
        recovery until two main-phase saves exist."""
        import orbax.checkpoint as ocp
        self._ckpt().save(
            epoch, args=ocp.args.StandardSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state,
                 "step": state.step}),
            metrics={"train_loss": float("inf") if pretrain
                     else float(train_loss)})

    def restore_checkpoint(self, state, path=None, step=None):
        """Restore a TrainState (elastic recovery / --resume / serving).

        With an explicit ``path`` the restore is READ-ONLY: it never
        constructs a CheckpointManager on the target — manager INIT
        garbage-collects checkpoints it considers unfinalized/legacy,
        which is fatal on a LIVE training run's dir (CLAUDE.md gotcha;
        it wiped a run's checkpoints once). Instead the numeric step
        dirs are listed and ``<path>/<step>/default`` is restored
        directly with a plain checkpointer."""
        import orbax.checkpoint as ocp
        template = {"params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        if path is not None:
            path = os.path.abspath(path)
            steps = sorted(
                int(d) for d in os.listdir(path)
                if d.isdigit() and os.path.isdir(
                    os.path.join(path, d, "default")))
            if not steps:
                raise FileNotFoundError(
                    f"no checkpoint step dirs (<step>/default) under "
                    f"{path} — pass the run's checkpoints/ dir or a "
                    f"snapshot dir containing numeric step subdirs")
            step = steps[-1] if step is None else step
            if step not in steps:
                raise FileNotFoundError(
                    f"checkpoint step {step} not found; available: "
                    f"{steps} (top-2-by-train_loss retention)")
            restored = ocp.StandardCheckpointer().restore(
                os.path.join(path, str(step), "default"), template)
        else:
            mngr = self._ckpt()
            step = mngr.latest_step() if step is None else step
            if step not in mngr.all_steps():
                raise FileNotFoundError(
                    f"checkpoint step {step} not found; available: "
                    f"{mngr.all_steps()} (top-2-by-train_loss retention)")
            restored = mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        return TrainState(restored["params"], restored["batch_stats"],
                          restored["opt_state"], restored["step"])

    # -- loops ------------------------------------------------------------

    def _to_batch(self, arrays):
        batch = Batch(*[np.asarray(a, np.float32) for a in arrays[:8]])
        return shard_batch(self.mesh, batch)

    def _start_run(self):
        """setting.txt/config.json/model.txt dumps + TB text entries
        (train.py:81-87, model5_b.py:905-909) — shared by both fit paths."""
        cfg = self.cfg
        os.makedirs(cfg.output_path, exist_ok=True)
        cfg.save(cfg.output_path)
        with open(os.path.join(cfg.output_path, "model.txt"), "w") as f:
            f.write("puzzlenet_tpu.models.PuzzleNet\n")
        self.logger.text("message", cfg.m)
        self.logger.text("path", cfg.output_path)
        self.logger.text("loss_mode", cfg.loss_mode)
        self.logger.text("lr", cfg.lr)

    def fit(self, train_ds, val_ds=None):
        cfg = self.cfg
        self._start_run()
        if cfg.global_pose:
            print("WARNING: --global_pose only applies to the device-data "
                  "path (fit_device_data); ignored by the host Loader",
                  flush=True)

        loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                        drop_last=True, num_workers=cfg.num_workers,
                        seed=cfg.seed, use_processes=cfg.loader_processes)
        val_loader = None
        if val_ds is not None and len(val_ds) >= cfg.batch_size:
            val_loader = Loader(val_ds, cfg.batch_size, shuffle=False,
                                drop_last=True, num_workers=cfg.num_workers)

        state = None
        global_step = 0
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
        try:
            for epoch in range(cfg.epochs):
                loader.set_epoch(epoch)
                pretrain = epoch < cfg.pretrain_epochs
                epoch_losses = []
                for arrays in loader:
                    batch = self._to_batch(arrays)
                    if state is None:
                        state = self.init_state(batch)
                        if cfg.resume:
                            state = self.restore_checkpoint(state,
                                                            cfg.resume)
                            # continue the original run's step axis (TB
                            # scalars, lr logging, max_steps accounting)
                            global_step = int(state.step)
                    state, metrics = train_step(
                        self.model, self.tx, self.flags, pretrain, state,
                        batch)
                    global_step += 1
                    epoch_losses.append(metrics["train_loss"])
                    if global_step % cfg.log_every == 0 or global_step == 1:
                        vals = {k: float(v) for k, v in metrics.items()}
                        vals["lr"] = float(lr_schedule(cfg.lr)(
                            global_step - 1))
                        self.logger.scalars(vals, global_step)
                    if cfg.viz_every and (global_step % cfg.viz_every == 0
                                          or global_step == 1):
                        self._viz_train(state, batch, pretrain, global_step)
                    if cfg.max_steps and global_step >= cfg.max_steps:
                        break

                if not epoch_losses:
                    raise RuntimeError(
                        "empty epoch: dataset smaller than batch_size?")
                epoch_loss = float(jnp.mean(jnp.stack(epoch_losses)))
                self.logger.scalar("epoch_loss", epoch_loss, global_step)

                # threshold-based early-stop marker (model5_b.py:1165-1170)
                if epoch_loss < cfg.early_stop_threshold:
                    with open(os.path.join(cfg.output_path, "stop.txt"),
                              "w") as f:
                        f.write(f"stop\n{epoch}\n{epoch_loss}")

                # every-n semantics (Lightning ModelCheckpoint
                # every_n_epochs, train.py:119-124): first save at epoch
                # save_on_epochs - 1, not at epoch 0
                if (epoch + 1) % cfg.save_on_epochs == 0:
                    self.save_checkpoint(state, epoch, epoch_loss,
                                         pretrain=pretrain)

                if (val_loader is not None
                        and (epoch + 1) % cfg.check_val_every_n_epoch == 0):
                    self.validate(state, val_loader, pretrain, global_step)

                if cfg.max_steps and global_step >= cfg.max_steps:
                    break
        finally:
            if cfg.profile_dir:
                jax.profiler.stop_trace()
            if self.ckpt_manager is not None:
                self.ckpt_manager.wait_until_finished()
            self.logger.flush()
        return state

    def fit_device_data(self, clouds, steps, val_ds=None, log_every=20,
                        scan_chunk=1, pretrain_steps=None, cut=None,
                        split_twice=None, save_every=1000):
        """TPU-resident training: batches generated on-device per step
        (data/device_pipeline.py) from a preloaded cloud stack — no host
        data path at all. ``clouds``: [n_clouds, M, 3] array.

        Validation runs on device too (eval_step metric suite + val loss
        scalars every check_val_every_n_epoch epochs, on a fixed batch
        from a held-out key); ``val_ds`` is accepted for fit() signature
        compatibility but unused — the device path never touches host
        datasets.

        The reference's equivalent is 64 DataLoader worker processes
        feeding the GPU (train.py:100-109); here the whole pipeline (cut,
        masked FPS, boundary, twist) is device time per batch.

        Reference-recipe parity knobs:
          * ``pretrain_steps`` — the per-epoch pretrain->main gate
            (model5_b.py:928-933) in step units; defaults to
            cfg.pretrain_epochs * (n_clouds // batch_size). Phase 1 runs the
            pose-only predict6 path, phase 2 the full predict5 losses.
          * ``cut``/``split_twice`` — the cut primitive and second-cut
            scheme; default from the run's dataset category and
            --random_slice flag, so the device path samples the same data
            distribution as the host datasets.

        ``scan_chunk`` > 1 runs that many steps inside one lax.scan
        (single dispatch per chunk) — measured SLOWER on the remote-TPU
        tunnel (the big fused program compiles long and pipelines worse
        than async per-step dispatch), so the default stays 1.
        """
        from ..data.device_pipeline import make_batch
        from ..data.registry import category_cut

        cfg = self.cfg
        clouds = jnp.asarray(clouds)
        n_clouds = clouds.shape[0]
        cut = category_cut(cfg.dataset) if cut is None else cut
        split_twice = (cfg.random_slice if split_twice is None
                       else split_twice)
        frag_cuts = cfg.frag_cuts
        postcut = cfg.postcut
        if frag_cuts and split_twice:
            print("WARNING: --frag_cuts only applies to the single-cut "
                  "path; ignored under --random_slice/split_twice",
                  flush=True)
            frag_cuts = 0          # make_batch raises on the combination
        if postcut and split_twice:
            print("WARNING: --postcut only applies to the single-cut "
                  "path; ignored under --random_slice/split_twice",
                  flush=True)
            postcut = 0.0          # make_batch raises on the combination
        steps_per_epoch = max(1, n_clouds // cfg.batch_size)
        if pretrain_steps is None:
            pretrain_steps = cfg.pretrain_epochs * steps_per_epoch
        pretrain_steps = min(pretrain_steps, steps)

        # training batch_fn: one split into (selection, pipeline) keys —
        # the exact per-step stream the documented bit-deterministic runs
        # derive from fold_in(key, step)
        def batch_fn(k):
            k_sel, k_batch = jax.random.split(k)
            sel = jax.random.choice(k_sel, n_clouds, (cfg.batch_size,),
                                    replace=n_clouds < cfg.batch_size)
            return make_batch(k_batch, clouds[sel], npoint=cfg.num_points,
                              cut=cut, split_twice=split_twice,
                              frag_cuts=frag_cuts, mag=cfg.mag,
                              mag_randomly=cfg.random,
                              global_mag=cfg.global_pose,
                              postcut=postcut)

        # init/viz/val sample WITH replacement like the training path so
        # n_clouds < batch_size still yields a full, mesh-divisible batch
        # (clouds[:B] would crash shard_batch); they pass the UNSPLIT key
        # to both the selection and the pipeline (historical stream,
        # kept so documented runs stay bit-deterministic)
        def sample_clouds(k):
            sel = jax.random.choice(k, n_clouds, (cfg.batch_size,),
                                    replace=n_clouds < cfg.batch_size)
            return clouds[sel]

        def init_fn(k):
            return make_batch(k, sample_clouds(k), npoint=cfg.num_points,
                              cut=cut, split_twice=split_twice,
                              frag_cuts=frag_cuts, mag=cfg.mag,
                              mag_randomly=cfg.random,
                              global_mag=cfg.global_pose, postcut=postcut)

        # val stays on the single-cut, canonical-fpc pair distribution
        # (frag_cuts and global_pose are training-distribution knobs;
        # default mag) so val metrics remain comparable across runs
        def val_fn(k):
            return make_batch(k, sample_clouds(k), npoint=cfg.num_points,
                              cut=cut, split_twice=split_twice,
                              mag_randomly=cfg.random)

        return self._device_train_loop(
            steps, pretrain_steps, steps_per_epoch, batch_fn, init_fn,
            val_fn, init_fn, log_every, scan_chunk, save_every)

    def fit_device_pairs(self, pairs, steps, val_ds=None, log_every=20,
                         scan_chunk=1, pretrain_steps=None,
                         save_every=1000):
        """TPU-resident training on PRECOMPUTED pairs (fragment-pair
        categories: bbv & Precomputed variants).

        ``pairs``: tuple of stacked canonical item arrays
        (fpc [M,N,3], rpc [M,N,3], fpcb [M,k,3], rpcb [M,k,3],
        fpc_idx [M,N], rpc_idx [M,N]) — data/registry.py
        ``category_pairs``. Geometry is host-generated ONCE (the
        fragment sampling cannot be expressed as a cut pipeline); the
        per-draw rigid augmentation (MovedDataset semantics) runs on
        device via make_pair_batch, so the step loop has no host data
        path at all — the same one-dispatch-per-step property as
        :meth:`fit_device_data`. On the 1-CPU VM this removes the
        ~100 ms/item host Loader bottleneck that capped bbv training
        (VERDICT r4 weak #4).

        Validation uses a held-out KEY on the training stack (fresh
        twists, canonical pose) — fragment sets are small, so the val
        signal is augmentation-generalization, as on the clouds path.
        """
        cfg = self.cfg
        pairs = tuple(jnp.asarray(p) for p in pairs)
        n_items = pairs[0].shape[0]
        steps_per_epoch = max(1, n_items // cfg.batch_size)
        if pretrain_steps is None:
            pretrain_steps = cfg.pretrain_epochs * steps_per_epoch
        pretrain_steps = min(pretrain_steps, steps)

        from ..data.device_pipeline import make_pair_batch

        def batch_fn(k):
            k_sel, k_batch = jax.random.split(k)
            sel = jax.random.choice(k_sel, n_items, (cfg.batch_size,),
                                    replace=n_items < cfg.batch_size)
            return make_pair_batch(k_batch, *(p[sel] for p in pairs),
                                   mag=cfg.mag, mag_randomly=cfg.random,
                                   global_mag=cfg.global_pose)

        def val_fn(k):
            k_sel, k_batch = jax.random.split(k)
            sel = jax.random.choice(k_sel, n_items, (cfg.batch_size,),
                                    replace=n_items < cfg.batch_size)
            return make_pair_batch(k_batch, *(p[sel] for p in pairs),
                                   mag_randomly=cfg.random)

        return self._device_train_loop(
            steps, pretrain_steps, steps_per_epoch, batch_fn, batch_fn,
            val_fn, batch_fn, log_every, scan_chunk, save_every)

    def _device_train_loop(self, steps, pretrain_steps, steps_per_epoch,
                           batch_fn, init_fn, val_fn, viz_fn, log_every,
                           scan_chunk, save_every):
        """Shared device-resident training loop: per-step keys fold the
        step counter into cfg.seed's key ON DEVICE (resume-stable), one
        jit dispatch per chunk, orbax top-2 retention on the window-mean
        monitor, periodic on-device validation + TB viz. ``batch_fn``/
        ``init_fn``/``val_fn``/``viz_fn`` map a key to a Batch under
        jit."""
        cfg = self.cfg
        self._start_run()
        key = jax.random.PRNGKey(cfg.seed)

        @functools.partial(jax.jit, static_argnames=("pretrain", "n_steps"),
                           donate_argnames=("state",))
        def chunk_fn(pretrain, n_steps, state):
            def body(state, _):
                k = jax.random.fold_in(key, state.step)
                state, metrics = train_step(self.model, self.tx, self.flags,
                                            pretrain, state, batch_fn(k))
                return state, metrics["train_loss"]
            return jax.lax.scan(body, state, None, length=n_steps)

        first = shard_batch(self.mesh, jax.jit(init_fn)(key))
        state = self.init_state(first)
        if cfg.resume:
            state = self.restore_checkpoint(state, cfg.resume)

        viz_batch_fn = jax.jit(viz_fn)
        # periodic validation (the host fit()'s check_val_every_n_epoch
        # cadence, model5_b.py:1172-1277 metrics): one FIXED batch drawn
        # from a held-out key — procedurally fresh augmentation the
        # training stream never sees.
        val_every = max(1, cfg.check_val_every_n_epoch * steps_per_epoch)
        val_batch_fn = jax.jit(val_fn)
        val_batch = None
        losses = []
        since_save = []  # device scalars; only reduced at save time
        done = int(state.step)
        while done < steps:
            pretrain = done < pretrain_steps
            # never cross the phase boundary inside one chunk
            limit = pretrain_steps if pretrain else steps
            n = min(scan_chunk, limit - done)
            state, chunk_losses = chunk_fn(pretrain, n, state)
            losses = [chunk_losses]      # only the latest window is read
            since_save.append(chunk_losses)
            done += n
            if done % log_every < n or done == limit:
                window = float(jnp.mean(losses[-1]))
                phase = "pretrain" if pretrain else "main"
                self.logger.scalar("train_loss", window, done)
                print(f"step {done}/{steps} [{phase}] loss {window:.4f}",
                      flush=True)
            if save_every and done % save_every < n and done < steps:
                # retention monitor = MEAN loss since the last save (the
                # Lightning epoch-mean analogue). A single-step sample is
                # ~30x noisier at save_every=1000: top-2 retention then
                # keeps the two luckiest dips and evicts the FINAL
                # trained model (observed: vcone_bfp_r2 kept 52k/53k
                # noise dips and GC'd step 60000).
                self.save_checkpoint(
                    state, done,
                    float(jnp.mean(jnp.concatenate(
                        [jnp.ravel(x) for x in since_save]))),
                    pretrain=pretrain)
                since_save = []
            if done % val_every < n or done == steps:
                if val_batch is None:
                    vk = jax.random.fold_in(key, 0x7FFFFFFF)
                    val_batch = shard_batch(self.mesh, val_batch_fn(vk))
                vals = eval_step(self.model, pretrain, state, val_batch,
                                 self.flags)
                for tag, v in vals.items():
                    self.logger.scalar(tag, float(v), done)
            if cfg.viz_every and done % cfg.viz_every < n:
                vzk = jax.random.fold_in(key, steps + done)
                viz_batch = viz_batch_fn(vzk)
                self._viz_train(state, viz_batch, pretrain, done)
                self._viz_val(state, viz_batch, pretrain, done)
        if not losses:   # resumed at/after the target step: nothing to do
            return state
        final_loss = float(jnp.mean(jnp.concatenate(
            [jnp.ravel(x) for x in since_save or losses])))
        self.save_checkpoint(state, steps, final_loss)
        self.ckpt_manager.wait_until_finished()
        self.ensure_final_checkpoint(state, steps)
        if final_loss < cfg.early_stop_threshold:
            with open(os.path.join(cfg.output_path, "stop.txt"), "w") as f:
                f.write(f"stop\n{steps}\n{final_loss}")
        return state

    def ensure_final_checkpoint(self, state, step):
        """Guarantee the final trained model exists on disk.

        Top-2-by-train_loss retention can still evict the FINAL save if
        two retained mid-run means happen to rank lower — losing the
        model the whole run was for. If the manager no longer lists
        ``step``, write it out-of-band in the read-only restorer's
        layout (``checkpoints/<step>/default``), which
        ``restore_checkpoint(path=...)``, the eval CLI and
        ``Session.from_run`` all consume. Never pointed at by a live
        CheckpointManager afterwards, so the manager-GC hazard
        (CLAUDE.md) does not apply."""
        if step in self.ckpt_manager.all_steps():
            return
        import orbax.checkpoint as ocp
        path = os.path.join(os.path.abspath(self.cfg.output_path),
                            "checkpoints", str(step), "default")
        ocp.StandardCheckpointer().save(
            path, {"params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step})
        print(f"final checkpoint re-written out-of-band at step {step} "
              "(retention had evicted it)", flush=True)

    # -- visualization ------------------------------------------------------

    def _viz_train(self, state, batch, pretrain, step):
        """Training-step point-cloud + attention viz with the reference
        tags (model5_b.py:972-982): train_output / train_dataset /
        train_gt / train__x2 mesh pairs and the two attention maps."""
        v = viz_step(self.model, pretrain, state, batch)
        i = min(1, batch.fpc.shape[0] - 1)  # index=1 in the reference
        fpc = np.asarray(batch.fpc[i])
        self.logger.mesh_pair("train_output", fpc,
                              np.asarray(v["de_mrpc"][i]), step)
        self.logger.mesh_pair("train_dataset", fpc,
                              np.asarray(batch.mrpc[i]), step)
        self.logger.mesh_pair("train_gt", fpc, np.asarray(batch.rpc[i]),
                              step)
        self.logger.mesh_pair("train__x2", np.asarray(v["fpc_x2"][i]),
                              np.asarray(v["mrpc_x2"][i]), step)
        self.logger.attention_figure("train_fpc_attention_map",
                                     v["fpc_x2"][i], v["fpc_attention"][i],
                                     step)
        self.logger.attention_figure("train_mrpc_attention_map",
                                     v["mrpc_x2"][i],
                                     v["mrpc_attention"][i], step)

    def _viz_val(self, state, batch, pretrain, step):
        """Validation viz (model5_b.py:1213-1227, 1268-1277): result / gt /
        dataset meshes plus the three boundary pairs."""
        v = viz_step(self.model, pretrain, state, batch)
        i = min(1, batch.fpc.shape[0] - 1)
        fpc = np.asarray(batch.fpc[i])
        # the reference's tags are '实验结果'/'gt'/'数据集' (result/gt/dataset)
        self.logger.mesh_pair("val_result", np.asarray(v["de_mrpc"][i]),
                              fpc, step)
        self.logger.mesh_pair("val_gt", np.asarray(batch.rpc[i]), fpc, step)
        self.logger.mesh_pair("val_dataset", np.asarray(batch.mrpc[i]), fpc,
                              step)
        if not pretrain:
            self.logger.mesh_pair("val_rpcb&fpcb", np.asarray(batch.rpcb[i]),
                                  np.asarray(batch.fpcb[i]), step)
            self.logger.mesh_pair("val_de_mrpcb&fpcb",
                                  np.asarray(v["de_mrpcb"][i]),
                                  np.asarray(batch.fpcb[i]), step)
            self.logger.mesh_pair("val_de_mrpcb&de_fpcb",
                                  np.asarray(v["de_mrpcb"][i]),
                                  np.asarray(v["de_fpcb"][i]), step)

    def validate(self, state, val_loader, pretrain, global_step):
        agg = None
        n = 0
        for arrays in val_loader:
            batch = self._to_batch(arrays)
            if n == 0:
                self._viz_val(state, batch, pretrain, global_step)
            vals = eval_step(self.model, pretrain, state, batch,
                             flags=self.flags)
            vals = {k: float(v) for k, v in vals.items()}
            agg = vals if agg is None else {
                k: agg[k] + vals[k] for k in vals}
            n += 1
        if agg:
            self.logger.scalars({k: v / n for k, v in agg.items()},
                                global_step)
        return {k: v / n for k, v in agg.items()} if agg else {}
