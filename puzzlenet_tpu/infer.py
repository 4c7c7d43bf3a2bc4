"""Deployment inference API.

The reference's only inference surface is test.py (checkpoint -> metrics);
users who want predictions must drive the Lightning module by hand. This
module packages the deployed forward path (predict5 semantics,
model5_b.py:672-759) behind a warm serving session:

  * one jit at a fixed serving batch size — partial batches are padded to
    the compiled shape, oversized inputs are chunked, so the TPU never
    recompiles after warmup;
  * outputs decoded to what an application consumes: the 4x4 rigid
    transform (se3.exp of the twist — maps mrpc back onto rpc), the
    aligned moved piece, per-point boundary probabilities, and the top-k
    boundary masks (model5_b.py:1323-1347 decoding);
  * constructors for every checkpoint format in play: a training run dir
    (orbax), raw param trees, or a reference PyTorch-Lightning .ckpt via
    core/torch_compat.

Multi-piece reassembly stays in assembly/greedy.py; ``Session.assemble``
delegates to it with the session's weights.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import PuzzleNet
from .semath import se3


class Session:
    """Warm inference session over a fixed [batch, n, 3] compiled shape."""

    def __init__(self, params, batch_stats, num_points=1024, batch_size=64,
                 asymmetric_global_quirk=False, boundary_fp=False,
                 bf16=False):
        # ``bf16``: serve with bfloat16 activations + bf16-operand
        # (f32-accumulated) SG matmuls — the TPU's native rate — from
        # f32-trained params (params stay f32; see PERFORMANCE.md for
        # the measured metric deltas)
        self.model = PuzzleNet(
            num_points=num_points,
            asymmetric_global_quirk=asymmetric_global_quirk,
            boundary_fp=boundary_fp,
            dtype=jnp.bfloat16 if bf16 else jnp.float32)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.batch_size = int(batch_size)
        self.num_points = int(num_points)

        @jax.jit
        def _forward(variables, fpc, mrpc):
            out = self.model.apply(variables, fpc, mrpc, train=False)
            mat = se3.exp(out.twist)
            aligned = se3.transform_points(mat, mrpc)
            probs_f = jax.nn.softmax(
                jnp.swapaxes(out.fpcb_logits, 1, 2), axis=-1)[..., 1]
            probs_m = jax.nn.softmax(
                jnp.swapaxes(out.mrpcb_logits, 1, 2), axis=-1)[..., 1]
            return out.twist, mat, aligned, probs_f, probs_m

        @jax.jit
        def _refine(variables, fpc, mrpc, mat):
            """One refinement pass: re-run the net on the aligned pair and
            compose the correction into ``mat`` (same compiled shape)."""
            aligned = se3.transform_points(mat, mrpc)
            out = self.model.apply(variables, fpc, aligned, train=False)
            mat = jnp.matmul(se3.exp(out.twist), mat,
                             precision="highest")
            probs_f = jax.nn.softmax(
                jnp.swapaxes(out.fpcb_logits, 1, 2), axis=-1)[..., 1]
            probs_m = jax.nn.softmax(
                jnp.swapaxes(out.mrpcb_logits, 1, 2), axis=-1)[..., 1]
            return (se3.log(mat), mat, se3.transform_points(mat, mrpc),
                    probs_f, probs_m)

        self._forward = _forward
        self._refine = _refine

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_run(cls, run_dir, step=None, batch_size=64, bf16=False):
        """Load a cli.train output dir (config.json + orbax checkpoints).

        ``bf16`` switches SERVING compute to bfloat16 regardless of the
        training dtype (params are f32 in the checkpoint either way)."""
        import os

        from .core.config import Config
        from .data.synthetic import synthetic_clouds
        from .train.losses import Batch
        from .train.trainer import Trainer

        cfg = Config.load(run_dir)
        cfg.output_path = run_dir
        trainer = Trainer(cfg)
        # template state from one tiny synthetic batch (shapes only)
        cloud = synthetic_clouds("vase", 1, n_points=4 * cfg.num_points)[0]
        pc = jnp.asarray(cloud[:cfg.num_points], jnp.float32)[None]
        example = Batch(pc, pc, jnp.eye(4)[None], pc,
                        pc[:, :128], pc[:, :128],
                        jnp.zeros((1, cfg.num_points)),
                        jnp.zeros((1, cfg.num_points)))
        state = trainer.init_state(example)
        state = trainer.restore_checkpoint(
            state, os.path.join(run_dir, "checkpoints"), step=step)
        return cls(state.params, state.batch_stats,
                   num_points=cfg.num_points, batch_size=batch_size,
                   asymmetric_global_quirk=cfg.asymmetric_global_quirk,
                   boundary_fp=cfg.boundary_fp, bf16=bf16)

    @classmethod
    def from_reference_checkpoint(cls, path, num_points=1024, batch_size=64,
                                  asymmetric_global_quirk=True):
        """Load a reference PyTorch-Lightning .ckpt (core/torch_compat).

        Defaults to the reference's asymmetric boundary-global quirk
        (model5_b.py:741) so logits match the checkpoint's training."""
        from .core.torch_compat import convert_lightning_checkpoint

        params, stats, _ = convert_lightning_checkpoint(path)
        return cls(params, stats, num_points=num_points,
                   batch_size=batch_size,
                   asymmetric_global_quirk=asymmetric_global_quirk)

    # -- serving ----------------------------------------------------------

    def _resample(self, cloud, rng):
        """[n, 3] any n >= 4 -> [num_points, 3]: FPS down (the same
        normalization the data path applies to raw clouds, dataset.py FPS
        to 1024) or resample-with-replacement up (duplicates leave the
        geometry, and hence the rigid fit, unchanged)."""
        from .data.augment import fps_np

        n = len(cloud)
        if n == self.num_points:
            return cloud
        if n > self.num_points:
            return fps_np(cloud, self.num_points, rng=rng)
        extra = rng.integers(0, n, size=self.num_points - n)
        return np.concatenate([cloud, cloud[extra]], axis=0)

    def predict(self, fpc, mrpc, boundary_k=128, seed=0, refine_iters=0):
        """fpc, mrpc: [B, n, 3] arrays (any B >= 1, any n >= 4) or lists of
        [n_i, 3] clouds with per-item sizes -> dict of numpy arrays:

        twist [B,6], transform [B,4,4], mrpc_aligned [B,num_points,3],
        fpc_boundary_prob / mrpc_boundary_prob [B,num_points],
        fpc_boundary_mask / mrpc_boundary_mask [B,num_points] (0/1 @ top-k).

        Inputs whose n != num_points are normalized first — FPS down /
        resample-with-replacement up (deterministic under ``seed``) — and
        the normalized clouds are returned under "fpc" / "mrpc" so the
        per-point outputs always align with what the network actually saw.
        The rigid ``transform`` applies to the ORIGINAL moved cloud
        unchanged (resampling is a subset/duplication of the same points).
        """
        if not 0 < boundary_k <= self.num_points:
            raise ValueError(
                f"boundary_k={boundary_k} must be in (0, num_points="
                f"{self.num_points}] — fail fast, not after the forward")

        def norm(x):
            try:
                arr = np.asarray(x, np.float32)
                items = [arr] if arr.ndim == 2 else list(arr)
            except ValueError:                   # ragged list of clouds
                items = [np.asarray(c, np.float32) for c in x]
            rng = np.random.default_rng(seed)
            return np.stack([self._resample(c, rng) for c in items])

        fpc = norm(fpc)
        mrpc = norm(mrpc)
        assert fpc.shape == mrpc.shape, (fpc.shape, mrpc.shape)
        B = fpc.shape[0]

        outs = []
        for lo in range(0, B, self.batch_size):
            chunk_f = fpc[lo:lo + self.batch_size]
            chunk_m = mrpc[lo:lo + self.batch_size]
            n_real = len(chunk_f)
            pad = self.batch_size - n_real
            if pad:
                chunk_f = np.concatenate(
                    [chunk_f, np.repeat(chunk_f[-1:], pad, axis=0)])
                chunk_m = np.concatenate(
                    [chunk_m, np.repeat(chunk_m[-1:], pad, axis=0)])
            cf, cm = jnp.asarray(chunk_f), jnp.asarray(chunk_m)
            res = self._forward(self.variables, cf, cm)
            for _ in range(refine_iters):
                res = self._refine(self.variables, cf, cm, res[1])
            outs.append([np.asarray(r)[:n_real] for r in res])
        twist, mat, aligned, pf, pm = (
            np.concatenate([o[i] for o in outs]) for i in range(5))

        def topk_mask(p):
            mask = np.zeros_like(p)
            top = np.argpartition(-p, boundary_k - 1, axis=1)[:, :boundary_k]
            np.put_along_axis(mask, top, 1.0, axis=1)
            return mask

        return {
            "fpc": fpc, "mrpc": mrpc,
            "twist": twist, "transform": mat, "mrpc_aligned": aligned,
            "fpc_boundary_prob": pf, "mrpc_boundary_prob": pm,
            "fpc_boundary_mask": topk_mask(pf),
            "mrpc_boundary_mask": topk_mask(pm),
        }

    def assemble(self, pieces, pad_to=8, refine_iters=0, icp_iters=0,
                 algo="spanning", sync_iters=0, grow=False,
                 polish_iters=0, include_greedy=False, repair_iters=0,
                 measure_refine=0, base_k=4, cc_iters=0,
                 tta_gauges=0, tta_mag=0.8, beam_cuts=1, dir_fuse=0.0,
                 cons_w=0.0):
        """Multi-piece reassembly with this session's weights.

        ``algo``: ``"spanning"`` (pose-graph over the pair-score minimum
        spanning tree), ``"sync"`` (global pose synchronization over all
        reliable pair measurements), ``"ensemble"`` (verified hypothesis
        ensemble — MST + edge swaps + sync grid, best by posed
        re-measurement; assembly/ensemble.py), or ``"greedy"``
        (iterative re-merging).
        ``pad_to``: fixed slot-stack size — one compiled program set
        serves every K <= pad_to across calls (serving-friendly; set to
        None/0 to compile exactly-K programs instead).
        ``refine_iters``/``icp_iters``: per-merge/per-edge pose polish —
        extra network forwards on the aligned pair / boundary-ICP
        iterations (see assembly.greedy_assemble).
        ``sync_iters`` (sync only): iterative re-measurement rounds on
        the posed stack. ``grow`` (greedy only): accretion mode.
        ``polish_iters`` (sync/ensemble): joint boundary-contact pose
        polish over the kept measurement graph (assembly/polish.py).
        ``repair_iters`` (ensemble only): verification-guided
        worst-piece repair iterations (assembly/ensemble.py).
        ``measure_refine`` (spanning/sync/ensemble/hierarchical):
        batched composed-refinement rounds of ALL pair measurements
        before any solve — one extra fixed-shape forward per round; the
        inference-side fix for out-of-trained-range scattered relative
        poses (assembly/spanning.py::_refine_all_jit).
        ``algo="hierarchical"``: recursive MST bipartition down to
        ``base_k``-piece ensemble leaves + verified two-cluster merges
        (assembly/hierarchy.py; never verifies worse than flat).
        ``tta_gauges``/``tta_mag`` (spanning/sync/ensemble/
        hierarchical): gauge-augmented re-measurement rounds — re-score
        every pair under random rigid gauges, keep the best fit score
        per pair (assembly/spanning.py::_score_all_gauged_jit).
        ``cc_iters`` (ensemble/hierarchical): cluster-complement
        refinement rounds of the final poses — re-measure each piece
        against the union of the others, the in-distribution
        fragment/complement presentation (assembly/complement.py);
        accepted only on strict verification improvement.
        ``dir_fuse``/``cons_w`` (spanning/sync/ensemble/hierarchical):
        direction-consistency fusion of the pair measurements — replace
        both directions of each unordered pair that agree within
        ``dir_fuse`` degrees by their chordal mean, and/or penalize
        inconsistent pairs' fit scores by ``cons_w`` x composition
        residual (assembly/spanning.py::symmetrize_measurements). Zero
        extra forwards."""
        from .assembly import (ensemble_assemble, greedy_assemble,
                               hierarchical_assemble, spanning_assemble,
                               sync_assemble)

        fn = {"greedy": greedy_assemble, "spanning": spanning_assemble,
              "sync": sync_assemble, "ensemble": ensemble_assemble,
              "hierarchical": hierarchical_assemble}[algo]
        kw = {}
        if sync_iters:
            if algo != "sync":
                raise ValueError("sync_iters requires algo='sync'")
            kw["sync_iters"] = sync_iters
        if grow:
            if algo != "greedy":
                raise ValueError("grow requires algo='greedy'")
            kw["grow"] = True
        if polish_iters:
            if algo not in ("sync", "ensemble", "hierarchical"):
                raise ValueError(
                    "polish_iters requires algo='sync', 'ensemble' or "
                    "'hierarchical'")
            kw["polish_iters"] = polish_iters
        if include_greedy:
            if algo != "ensemble":
                raise ValueError("include_greedy requires algo='ensemble'")
            kw["include_greedy"] = True
        if repair_iters:
            if algo not in ("ensemble", "hierarchical"):
                raise ValueError("repair_iters requires algo='ensemble' "
                                 "or 'hierarchical'")
            kw["repair_iters"] = repair_iters
        if algo == "hierarchical":
            kw["base_k"] = base_k
            if beam_cuts > 1:
                kw["beam_cuts"] = beam_cuts
        elif beam_cuts > 1:
            raise ValueError("beam_cuts requires algo='hierarchical'")
        if tta_gauges:
            if algo == "greedy":
                raise ValueError("tta_gauges requires algo='spanning', "
                                 "'sync', 'ensemble' or 'hierarchical'")
            kw["tta_gauges"] = tta_gauges
            kw["tta_mag"] = tta_mag
        if cc_iters:
            if algo not in ("ensemble", "hierarchical"):
                raise ValueError("cc_iters requires algo='ensemble' or "
                                 "'hierarchical'")
            kw["cc_iters"] = cc_iters
        if measure_refine:
            if algo == "greedy":
                raise ValueError("measure_refine requires algo='spanning',"
                                 " 'sync' or 'ensemble' (greedy re-scores "
                                 "every round; use refine_iters there)")
            kw["measure_refine"] = measure_refine
        if dir_fuse or cons_w:
            if algo == "greedy":
                raise ValueError("dir_fuse/cons_w fuse the batched pair "
                                 "measurements; greedy re-scores every "
                                 "round — use another algo")
            kw["dir_fuse"] = dir_fuse
            kw["cons_w"] = cons_w
        return fn(self.model, self.variables, pieces,
                  num_points=self.num_points, pad_to=pad_to or None,
                  refine_iters=refine_iters, icp_iters=icp_iters, **kw)


@functools.lru_cache(maxsize=4)
def _cached_session(run_dir, step, batch_size):
    return Session.from_run(run_dir, step=step, batch_size=batch_size)


def predict(run_dir, fpc, mrpc, step=None, batch_size=64):
    """One-call convenience wrapper (sessions cached per run_dir)."""
    return _cached_session(run_dir, step, batch_size).predict(fpc, mrpc)
