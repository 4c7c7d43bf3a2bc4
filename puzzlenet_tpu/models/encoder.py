"""PCT point-cloud encoder (flax).

Capability parity with the reference encoder stack:
* ``OffsetAttention``  = layerAttention + scaled_dot_production
  (model5_b.py:67-101): single-head offset attention, q/k projected to d/4.
* ``PCTEncoder``       = PCTransformer_nonsort (model5_b.py:411-478):
  per-point MLP -> two sample_and_group stages (FPS 512/256, kNN 32) with
  shared MLPs + max over neighbors -> 4 stacked offset-attention blocks ->
  concat -> Linear(1280 -> 1024) -> max-pool global feature.
* ``PointSlotBatchNorm`` reproduces the reference's unusual BatchNorm
  placement: torch ``BatchNorm1d(num_points)`` applied to a [B, N, C] tensor
  (model5_b.py:424-425, 447-448) normalizes each *point slot* over the batch
  and channel axes. Kept bit-faithful for checkpoint parity; it is flagged as
  a quirk in SURVEY.md §7.2(5).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import farthest_point_sample, index_points
from ..ops.sg_pallas import fused_set_abstraction


class PointSlotBatchNorm(nn.Module):
    """BatchNorm over (batch, channel) per point slot.

    Input [B, N, C]; statistics and the learned scale/bias are per-N
    (matching torch BatchNorm1d(N) fed a [B, N, C] tensor, which treats N as
    the channel dim and C as spatial).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9   # torch's 0.1 in flax convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=1,  # stats per point slot, reduced over (batch, channels)
        )(x)


class OffsetAttention(nn.Module):
    """Single-head offset attention (model5_b.py:83-101).

    q, k project to dim/4, v to dim; r = x - softmax(q k^T / sqrt(dim/4)) v;
    out = x + relu(Linear(r)). Returns (out, attention).

    ``dtype`` is the computation dtype (bfloat16 under --bf16; params stay
    f32). The softmax runs in f32 either way (standard mixed-precision
    hygiene: bf16 logits into a f32-accumulated softmax).
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_qk = self.dim // 4
        q = nn.Dense(d_qk, name="q", dtype=self.dtype)(x)
        k = nn.Dense(d_qk, name="k", dtype=self.dtype)(x)
        v = nn.Dense(self.dim, name="v", dtype=self.dtype)(x)
        logits = jnp.einsum("bnd,bmd->bnm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(d_qk, jnp.float32))
        attention = nn.softmax(logits, axis=-1)
        r = jnp.einsum("bnm,bmd->bnd", attention.astype(self.dtype), v)
        r = x - r
        out = x + nn.relu(nn.Dense(self.dim, name="out",
                                   dtype=self.dtype)(r))
        return out, attention


class PCTEncoder(nn.Module):
    """PCTransformer_nonsort (model5_b.py:411-478), TPU-idiomatic.

    __call__(xyz [B, N, 3]) -> (f_global [B, 1024], x2 [B, 256, 3],
    attention [B, 256, 256] (mean of the 4 blocks), out_local [B, 256, 1024],
    x_feature [B, N, 64]).
    """

    num_points: int = 1024
    feature_size: int = 64
    gs2_feature_size: int = 128
    out_dim: int = 1024
    sg1_points: int = 512
    sg2_points: int = 256
    knn: int = 32
    dtype: Any = jnp.float32    # activation dtype (bf16 under --bf16); the
                                # fused SG kernel and BN stats stay f32

    @nn.compact
    def __call__(self, xyz, train: bool = False,
                 return_stages: bool = False):
        d2 = self.gs2_feature_size * 2

        # per-point embedding with point-slot BN (reference quirk, see module)
        # (named_scope blocks label jax.profiler traces, --profile_dir)
        x = nn.relu(PointSlotBatchNorm(name="bn1")(
            nn.Dense(64, name="mlp1")(xyz), use_running_average=not train))
        x_feature = nn.relu(PointSlotBatchNorm(name="bn2")(
            nn.Dense(self.feature_size, name="mlp2")(x),
            use_running_average=not train))

        # set-abstraction stages: FPS centroids, then the fused
        # kNN+gather+MLP+max kernel (ops/sg_pallas.py) — the unfused
        # reference-shaped path runs off-TPU with identical math
        def sg_params(name, c_in, h1, h2):
            init = nn.initializers.lecun_normal()
            zeros = nn.initializers.zeros_init()
            return (self.param(f"{name}a_kernel", init, (c_in, h1)),
                    self.param(f"{name}a_bias", zeros, (h1,)),
                    self.param(f"{name}b_kernel", init, (h1, h2)),
                    self.param(f"{name}b_bias", zeros, (h2,)))

        # stage 1: FPS 512 + kNN 32, shared MLP(67->128->128), max.
        # Under --bf16 the fused kernel's MLP matmuls (fwd and, under
        # grad, bwd) run with bf16 operands + f32 accumulation — full
        # MXU rate; gradient routing is dtype-proof (ops/sg_pallas.py).
        bf16_mm = jnp.dtype(self.dtype) == jnp.bfloat16
        w3, b3, w4, b4 = sg_params("mlp34", self.feature_size + 3, 128,
                                   self.gs2_feature_size)
        with jax.named_scope("sg_stage1"):
            x1 = index_points(xyz,
                              farthest_point_sample(xyz, self.sg1_points))
            f1f = fused_set_abstraction(x1, xyz, x_feature, w3, b3, w4, b4,
                                        self.knn, bf16_mm)  # [B, 512, 128]

        # stage 2: FPS 256 + kNN 32, shared MLP(131->256->256), max.
        # FPS orderings are prefix-stable: the greedy argmax chain over the
        # stage-1 subset, seeded at the same index 0, reproduces the
        # stage-1 ordering step for step (each stage-1 winner is a member
        # of the subset and keeps winning over any subset of the original
        # candidates). So FPS(x1, 256) == x1[:, :256] exactly (tie order
        # aside) and the second FPS kernel call is free.
        w5, b5, w6, b6 = sg_params("mlp56", self.gs2_feature_size + 3, d2,
                                   d2)
        # the prefix shortcut (and the architecture) requires the
        # stage-2 centroid count to be a subset of stage 1's — slicing
        # would otherwise clamp silently
        assert self.sg2_points <= self.sg1_points, \
            (self.sg2_points, self.sg1_points)
        with jax.named_scope("sg_stage2"):
            x2 = x1[:, :self.sg2_points]
            f2f = fused_set_abstraction(x2, x1, f1f, w5, b5, w6, b6,
                                        self.knn, bf16_mm)  # [B, 256, 256]

        # 4 stacked offset-attention blocks; attentions averaged
        f2f = f2f.astype(self.dtype)
        with jax.named_scope("offset_attention"):
            att1, attention1 = OffsetAttention(d2, dtype=self.dtype,
                                               name="atten1")(f2f)
        att2, attention2 = OffsetAttention(d2, dtype=self.dtype,
                                           name="atten2")(att1)
        att3, attention3 = OffsetAttention(d2, dtype=self.dtype,
                                           name="atten3")(att2)
        att4, attention4 = OffsetAttention(d2, dtype=self.dtype,
                                           name="atten4")(att3)
        att = jnp.concatenate([att1, att2, att3, att4, f2f], axis=-1)
        attention = (attention1 + attention2 + attention3 + attention4) / 4

        out_local = nn.Dense(self.out_dim, name="out",
                             dtype=self.dtype)(att)          # [B, 256, 1024]
        out_local = out_local.astype(jnp.float32)
        f_global = jnp.max(out_local, axis=1)                # [B, 1024]

        if return_stages:
            # stage-1 centroids + grouped features for downstream feature
            # propagation (boundary_fp enrichment, models/puzzlenet.py)
            return (f_global, x2, attention, out_local, x_feature,
                    x1, f1f.astype(jnp.float32))
        return f_global, x2, attention, out_local, x_feature
