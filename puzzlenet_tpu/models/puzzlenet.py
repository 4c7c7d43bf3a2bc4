"""The two-branch PuzzleNet assembly model (flax).

Capability parity with TouchedRegraster's network components and predict5 /
predict6 paths (model5_b.py:519-759):

* twin PCT encoders (separate weights, model5_b.py:530-531);
* pose head ``tfMLP``: MLP 2048 -> 1024 -> 512 -> 512 -> 256 -> 6 on the
  concatenated global features, output is an se(3) twist
  (model5_b.py:559-569, applied at 723-725);
* boundary branch: per-point MLPs on the pre-grouping features, max-pooled
  to a 64-d global, cross-concatenated with the *other* piece's global, then
  per-point classifier MLPs 128 -> 64 -> 32 -> 2 (model5_b.py:571-599,
  738-754).

Known reference quirk, reproduced behind a flag: predict5 computes the fpc
"global" from the mrpc branch (model5_b.py:741), so both seg globals come
from mrpc. The architecture figure shows a symmetric cross-swap; default is
the symmetric version, set ``asymmetric_global_quirk=True`` for bit-parity
with reference checkpoints (SURVEY.md §3.2).

The pretrain path (= predict6, model5_b.py:612-659) encodes *both* pieces
with encoder #1 and skips the boundary branch.
"""

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

# inverse-distance 3-NN feature upsampling (PointNet++ FP semantics,
# pointnet_util.py:265-315): fused Pallas kernel on TPU — the XLA top_k
# formulation lowers to a full [B, N, S] sort and dominated the
# boundary_fp forward (ops/interp_pallas.py)
from ..ops.interp_pallas import three_nn_interpolate
from .encoder import PCTEncoder


class PuzzleNetOutput(NamedTuple):
    twist: jnp.ndarray            # [B, 6] se(3) twist; exp(twist) maps mrpc -> rpc
    fpcb_logits: jnp.ndarray      # [B, 2, N] boundary logits on fpc
    mrpcb_logits: jnp.ndarray     # [B, 2, N] boundary logits on mrpc
    fpc_x2: jnp.ndarray           # [B, 256, 3] stage-2 centroids (fpc)
    fpc_attention: jnp.ndarray    # [B, 256, 256] mean attention (fpc)
    mrpc_x2: jnp.ndarray          # [B, 256, 3]
    mrpc_attention: jnp.ndarray   # [B, 256, 256]


class PoseMLP(nn.Module):
    """tfMLP (model5_b.py:559-569)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f):
        f = f.astype(self.dtype)
        for w in (1024, 512, 512, 256):
            f = nn.relu(nn.Dense(w, dtype=self.dtype)(f))
        # the twist head stays f32: its 6 outputs feed se3.exp directly
        return nn.Dense(6)(f.astype(jnp.float32))


class _PointMLP(nn.Module):
    """Per-point MLP applied on a flattened [B*N, C] view.

    The flatten is load-bearing, not cosmetic: a Dense on a rank-3
    [B, N, 64] tensor whose producer (the encoder's point-slot BN) forces a
    transposed layout gets lowered by the TPU backend as a spatial-major
    convolution, and with --xla_allow_excess_precision the fused bf16
    window op hits an XLA compiler CHECK failure (fusion_util
    TransformWindow, "Loop will not make progress"). A 2-D dot takes the
    canonical MXU matmul path and is faster anyway.
    """

    widths: tuple

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        x = x.reshape(b * n, c)
        for i, w in enumerate(self.widths):
            x = nn.Dense(w)(x)
            if i + 1 < len(self.widths):
                x = nn.relu(x)
        return x.reshape(b, n, self.widths[-1])


class PuzzleNet(nn.Module):
    num_points: int = 1024
    asymmetric_global_quirk: bool = False
    boundary_fp: bool = False     # beyond-reference: feed the boundary heads
                                  # 3-NN-interpolated stage-1 neighborhood
                                  # features alongside x_feature. The
                                  # reference's heads see only pointwise
                                  # MLP(xyz) features (model5_b.py:738-754),
                                  # which cannot observe the one-sided-
                                  # neighborhood signature of fracture-rim
                                  # points; the FP path can. Off by default
                                  # (parity); changes the param tree.
    dtype: Any = jnp.float32      # activation dtype (--bf16 sets bfloat16);
                                  # params, BN stats, twist head, boundary
                                  # logits stay f32

    def setup(self):
        self.encoder_fpc = PCTEncoder(num_points=self.num_points,
                                      dtype=self.dtype)
        self.encoder_mrpc = PCTEncoder(num_points=self.num_points,
                                       dtype=self.dtype)
        self.pose_mlp = PoseMLP(dtype=self.dtype)
        # per-point boundary feature MLPs 64->64->64 (all layers relu'd in
        # the reference? model5_b.py:571-584 ends without a trailing relu)
        self.local_pre_fpc = _PointMLP((64, 64, 64))
        self.local_pre_rpc = _PointMLP((64, 64, 64))
        self.head_fpcb = _PointMLP((64, 32, 2))
        self.head_rpcb = _PointMLP((64, 32, 2))

    def __call__(self, fpc, mrpc, train: bool = False,
                 pretrain: bool = False):
        """fpc, mrpc: [B, N, 3] -> PuzzleNetOutput.

        ``pretrain`` selects the predict6 path: both pieces through encoder
        #1, pose only (boundary logits are zeros placeholders so the output
        shape stays static under jit).
        """
        if pretrain:
            # predict6 (model5_b.py:644-649): both branches share encoder 1
            f_fpc, fx2, fattn, _, _ = self.encoder_fpc(fpc, train=train)
            f_mrpc, mx2, mattn, _, _ = self.encoder_fpc(mrpc, train=train)
            twist = self.pose_mlp(jnp.concatenate([f_fpc, f_mrpc], axis=-1))
            B, N = fpc.shape[0], fpc.shape[1]
            zeros = jnp.zeros((B, 2, N), fpc.dtype)
            return PuzzleNetOutput(twist, zeros, zeros, fx2, fattn, mx2,
                                   mattn)

        if self.boundary_fp:
            (f_fpc, fx2, fattn, _, xfeat_fpc, fx1,
             f1f_fpc) = self.encoder_fpc(fpc, train=train,
                                         return_stages=True)
            (f_mrpc, mx2, mattn, _, xfeat_mrpc, mx1,
             f1f_mrpc) = self.encoder_mrpc(mrpc, train=train,
                                           return_stages=True)
            xfeat_fpc = jnp.concatenate(
                [xfeat_fpc, three_nn_interpolate(fpc, fx1, f1f_fpc)],
                axis=-1)                       # [B, N, 64 + 128]
            xfeat_mrpc = jnp.concatenate(
                [xfeat_mrpc, three_nn_interpolate(mrpc, mx1, f1f_mrpc)],
                axis=-1)
        else:
            f_fpc, fx2, fattn, _, xfeat_fpc = self.encoder_fpc(
                fpc, train=train)
            f_mrpc, mx2, mattn, _, xfeat_mrpc = self.encoder_mrpc(
                mrpc, train=train)

        twist = self.pose_mlp(jnp.concatenate([f_fpc, f_mrpc], axis=-1))

        # boundary branch (model5_b.py:738-754)
        nf = self.local_pre_fpc(xfeat_fpc)     # [B, N, 64]
        nm = self.local_pre_rpc(xfeat_mrpc)    # [B, N, 64]
        if self.asymmetric_global_quirk:
            fpc_global = jnp.max(nm, axis=1, keepdims=True)  # quirk: mrpc
        else:
            fpc_global = jnp.max(nf, axis=1, keepdims=True)
        mrpc_global = jnp.max(nm, axis=1, keepdims=True)

        n = fpc.shape[1]
        # each piece's per-point features concat the OTHER piece's global
        fpc_seg = jnp.concatenate(
            [jnp.broadcast_to(mrpc_global,
                              (mrpc_global.shape[0], n,
                               mrpc_global.shape[-1])), nf],
            axis=-1)
        mrpc_seg = jnp.concatenate(
            [jnp.broadcast_to(fpc_global,
                              (fpc_global.shape[0], n,
                               fpc_global.shape[-1])), nm],
            axis=-1)

        fpcb_logits = jnp.swapaxes(self.head_fpcb(fpc_seg), 1, 2)    # [B,2,N]
        mrpcb_logits = jnp.swapaxes(self.head_rpcb(mrpc_seg), 1, 2)  # [B,2,N]

        return PuzzleNetOutput(twist, fpcb_logits, mrpcb_logits, fx2, fattn,
                               mx2, mattn)
