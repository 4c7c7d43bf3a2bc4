"""Fused set-abstraction: CPU fallback correctness (value + gradient vs a
directly-differentiated unfused implementation), plus interpret-mode runs
of the actual Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import puzzlenet_tpu.ops.sg_pallas as sg
from puzzlenet_tpu.ops import knn_indices
from puzzlenet_tpu.ops.sg_pallas import (_mlp_max_from_idx,
                                         fused_set_abstraction)

B, S, N, C, K = 2, 32, 128, 16, 8


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    q = xyz[:, :S]
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C + 3, 24)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(24,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(24, 16)).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    return q, xyz, feats, w1, b1, w2, b2


def _direct(q, xyz, feats, w1, b1, w2, b2):
    idx = knn_indices(q, xyz, K)
    return _mlp_max_from_idx(q, xyz, feats, w1, b1, w2, b2, idx)


class TestFusedSetAbstraction:
    def test_value_matches_direct(self):
        args = _inputs()
        a = fused_set_abstraction(*args, K)
        b = _direct(*args)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gradients_match_direct(self):
        args = _inputs(1)

        def loss_fused(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, K) ** 2)

        def loss_direct(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(_direct(q, xyz, feats, w1, b1, w2, b2) ** 2)

        g1a, g2a = jax.grad(loss_fused, argnums=(0, 1))(args[3], args[2])
        g1b, g2b = jax.grad(loss_direct, argnums=(0, 1))(args[3], args[2])
        np.testing.assert_allclose(np.asarray(g1a), np.asarray(g1b),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2a), np.asarray(g2b),
                                   rtol=1e-4, atol=1e-5)

    def test_jittable(self):
        args = _inputs(2)
        out = jax.jit(lambda *a: fused_set_abstraction(*a, K))(*args)
        assert out.shape == (B, S, 16)
        assert np.all(np.isfinite(np.asarray(out)))


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setattr(sg, "_INTERPRET", True)


class TestKernelInterpret:
    """Run the real Pallas forward/backward kernels in interpret mode on
    CPU at a kernel-eligible shape (N >= 256 so the sorted-column top-k
    path is taken) and compare against the unfused math. bf16 gather/MLP
    inside the kernel vs f32 outside bounds the tolerance."""

    def _kargs(self, seed=0):
        rng = np.random.default_rng(seed)
        b, s, n, c = 1, 256, 512, 8
        xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 16)).astype(np.float32)
                         * 0.3)
        b1 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)
                         * 0.3)
        b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        return q, xyz, feats, w1, b1, w2, b2

    def test_forward_kernel(self, interpret_mode):
        args = self._kargs()
        got = fused_set_abstraction(*args, 32)
        want = _direct_k(*args, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_backward_kernel(self, interpret_mode):
        """Gradients vs a rounding-matched direct oracle: the kernel
        gathers xyz in f32 (centered BEFORE any bf16 rounding) and
        features through one bf16 rounding — mirroring that in the
        oracle makes the relu gates and max winners agree, so
        routing-sensitive gradient rows line up instead of flipping on
        near-ties."""
        args = self._kargs(1)

        def bf16_direct(q, xyz, feats, w1, b1, w2, b2):
            fb = feats.astype(jnp.bfloat16).astype(jnp.float32)
            idx = knn_indices(q, xyz, 32)
            return _mlp_max_from_idx(q, xyz, fb, w1, b1, w2, b2, idx)

        def loss(impl, w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(impl(q, xyz, feats, w1, b1, w2, b2) ** 2)

        fused = lambda *a: fused_set_abstraction(*a, 32)
        g1a, g2a = jax.grad(lambda w, f: loss(fused, w, f),
                            argnums=(0, 1))(args[3], args[2])
        g1b, g2b = jax.grad(lambda w, f: loss(bf16_direct, w, f),
                            argnums=(0, 1))(args[3], args[2])
        np.testing.assert_allclose(np.asarray(g1a), np.asarray(g1b),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(g2a), np.asarray(g2b),
                                   rtol=1e-2, atol=1e-2)


    def test_pipelined_matches_unpipelined(self, interpret_mode,
                                           monkeypatch):
        """The software-pipelined kernel must be bit-identical to the
        sequential one (same extraction order, same compute): out, idx,
        argmax and relu-support masks all match exactly."""
        args = self._kargs(2)
        res = {}
        for pipe in (False, True):
            monkeypatch.setattr(sg, "_PIPELINE", pipe)
            res[pipe] = sg._fused_forward(*args, 32, with_masks=True)
        for a, b, name in zip(res[False], res[True],
                              ("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_nograd_primal_matches_masked_out(self, interpret_mode,
                                              monkeypatch):
        """with_masks=False (the serving primal) must produce the same
        stage output as the under-grad forward while returning only tiny
        zero dummies for the backward-routing artifacts (both kernel
        variants)."""
        args = self._kargs(2)
        for pipe in (False, True):
            monkeypatch.setattr(sg, "_PIPELINE", pipe)
            full = sg._fused_forward(*args, 32, with_masks=True)
            lean = sg._fused_forward(*args, 32, with_masks=False)
            np.testing.assert_array_equal(np.asarray(full[0]),
                                          np.asarray(lean[0]),
                                          err_msg=f"pipe={pipe}")
            assert lean[1].shape == (1, 8, 128)
            assert lean[2].shape == (1, 8, 128)


    def test_transposed_layout_matches_row_major(self, interpret_mode,
                                                 monkeypatch):
        """_LAYOUT_T (transposed selection + dim0 x dim0 one-hot gathers)
        must reproduce the row-major pipe kernel exactly: stage output,
        argmax and relu-support masks bit-identical, the saved idx the
        same neighbor sets transposed."""
        args = self._kargs(3)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        tr = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in ((0, "out"), (2, "amax"), (3, "m1"), (4, "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(tr[i]), err_msg=name)
        idx_row = np.sort(np.asarray(row[1]), axis=2)          # [B, S, k]
        idx_tr = np.sort(np.swapaxes(np.asarray(tr[1]), 1, 2), axis=2)
        np.testing.assert_array_equal(idx_row, idx_tr, err_msg="idx sets")

    def test_transposed_layout_grads(self, interpret_mode, monkeypatch):
        """Full VJP through the transposed kernels vs the row-major ones:
        same routing (saved masks/indices match), so gradients agree to
        accumulation-order tolerance."""
        args = self._kargs(4)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2,
                                      32) ** 2)

        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        g_row = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        g_tr = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(g_row, g_tr, ("dw1", "dfeats")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_hybrid_ts_layout_bit_identical(self, interpret_mode,
                                            monkeypatch):
        """_LAYOUT_TS (transposed selection + row-major consume) must be
        BIT-identical to the row-major pipe kernel on every output
        including the saved idx: both streams pack the same (chunk,
        within-chunk) identity bits, so winners come out in the same
        ascending order with the same tie rule."""
        args = self._kargs(5)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        monkeypatch.setattr(sg, "_LAYOUT_TS", False)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        hyb = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in enumerate(("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(hyb[i]), err_msg=name)

    def test_hybrid_ts_grads_match(self, interpret_mode, monkeypatch):
        args = self._kargs(6)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2,
                                      32) ** 2)

        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", False)
        g_row = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        g_hyb = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(g_row, g_hyb, ("dw1", "dfeats")):
            # same saved idx layout -> same backward kernel; identical
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_extract2_bit_identical(self, interpret_mode, monkeypatch):
        """_EXTRACT2 (two-winners-per-reduce pair extraction in the
        row-major pipe kernel) must be BIT-identical on every output
        including the saved idx: the pair tree returns the serial
        stream's exact winner sequence (tests/test_ops.py proves the
        stream; this proves the kernel wiring)."""
        args = self._kargs(7)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_EXTRACT2", False)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_EXTRACT2", True)
        pair = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in enumerate(("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(pair[i]),
                                          err_msg=name)

    def test_extract2_grads_match(self, interpret_mode, monkeypatch):
        args = self._kargs(8)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2,
                                      32) ** 2)

        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_EXTRACT2", False)
        g_row = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_EXTRACT2", True)
        g_pair = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(g_row, g_pair, ("dw1", "dfeats")):
            # same saved idx -> same backward kernel; identical
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_extract2_composes_with_ts_layout(self, interpret_mode,
                                              monkeypatch):
        """_EXTRACT2 + _LAYOUT_TS (pair extraction on the transposed
        stream) stays bit-identical to the plain row-major kernel."""
        args = self._kargs(9)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        monkeypatch.setattr(sg, "_EXTRACT2", True)
        hyb = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in enumerate(("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(hyb[i]), err_msg=name)

    def test_transposed_nograd_primal(self, interpret_mode, monkeypatch):
        """The serving primal under _LAYOUT_T: same stage output, dummy
        artifacts."""
        args = self._kargs(3)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        full = sg._fused_forward(*args, 32, with_masks=True)
        lean = sg._fused_forward(*args, 32, with_masks=False)
        np.testing.assert_array_equal(np.asarray(full[0]),
                                      np.asarray(lean[0]))
        assert lean[1].shape == (1, 8, 128)


def _direct_k(q, xyz, feats, w1, b1, w2, b2, k):
    idx = knn_indices(q, xyz, k)
    return _mlp_max_from_idx(q, xyz, feats, w1, b1, w2, b2, idx)


class TestCollapsedForward:
    """_FWD_COLLAPSED (bf16-only collapsed compute phase in the pipe
    kernel): the hi/lo-split projection must track the f32 reference at
    least as tightly as the plain bf16 gather path, and the f32 path must
    be bit-unchanged by the flag."""

    def _kargs(self, seed=0):
        rng = np.random.default_rng(seed)
        b, s, n, c = 1, 256, 512, 8
        xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 16)).astype(np.float32)
                         * 0.3)
        b1 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)
                         * 0.3)
        b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        return q, xyz, feats, w1, b1, w2, b2

    def test_bf16_accuracy_vs_f32(self, interpret_mode, monkeypatch):
        args = self._kargs(20)
        want = np.asarray(fused_set_abstraction(*args, 32, False))
        monkeypatch.setattr(sg, "_FWD_COLLAPSED", False)
        plain = np.asarray(fused_set_abstraction(*args, 32, True))
        monkeypatch.setattr(sg, "_FWD_COLLAPSED", True)
        coll = np.asarray(fused_set_abstraction(*args, 32, True))
        err_plain = np.abs(plain - want).max()
        err_coll = np.abs(coll - want).max()
        # strictly-better-or-equal precision claim, with slack for
        # max-winner flips on near-ties
        assert err_coll <= err_plain * 1.5 + 1e-3, (err_coll, err_plain)
        np.testing.assert_allclose(coll, want, rtol=2e-2, atol=2e-2)

    def test_f32_path_bit_unchanged(self, interpret_mode, monkeypatch):
        args = self._kargs(21)
        monkeypatch.setattr(sg, "_FWD_COLLAPSED", False)
        a = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_FWD_COLLAPSED", True)
        b = sg._fused_forward(*args, 32, with_masks=True)
        for x, y, name in zip(a, b, ("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)

    def test_bf16_grads_consistent(self, interpret_mode, monkeypatch):
        """VJP through the collapsed bf16 forward: masks are emitted by
        the collapsed a1 itself, so routing is self-consistent and
        gradients stay within bf16 value noise of the plain path."""
        args = self._kargs(22)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 32,
                                      True) ** 2)

        monkeypatch.setattr(sg, "_FWD_COLLAPSED", False)
        ga = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_FWD_COLLAPSED", True)
        gb = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(ga, gb, ("dw1", "dfeats")):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, rtol=0, atol=3e-2 * scale,
                                       err_msg=name)


class TestCollapsedBackward:
    """_BWD_COLLAPSED (_sg_bwd_kernel_c): same saved-artifact routing as
    the straightforward backward, different matmul association — gradients
    must agree to accumulation-order tolerance in f32 and to bf16-value
    tolerance under bf16_mm."""

    def _kargs(self, seed=0):
        rng = np.random.default_rng(seed)
        b, s, n, c = 1, 256, 512, 8
        xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 16)).astype(np.float32)
                         * 0.3)
        b1 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)
                         * 0.3)
        b2 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        return q, xyz, feats, w1, b1, w2, b2

    def _grads(self, args, bf16_mm):
        def loss(q, xyz, feats, w1, b1, w2, b2):
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 32,
                                      bf16_mm) ** 2)
        return jax.grad(loss, argnums=tuple(range(7)))(*args)

    def test_matches_straightforward_backward(self, interpret_mode,
                                              monkeypatch):
        # bf16_mm only: _fused_backward gates the collapsed kernel to the
        # bf16 path (the f32 A/B was ~1.0x with avoidable value noise —
        # see the _BWD_COLLAPSED comment), so f32 always runs the
        # per-term kernel and a f32 parametrization would compare it to
        # itself.
        bf16_mm = True
        args = self._kargs(11)
        monkeypatch.setattr(sg, "_BWD_COLLAPSED", False)
        ref = self._grads(args, bf16_mm)
        monkeypatch.setattr(sg, "_BWD_COLLAPSED", True)
        got = self._grads(args, bf16_mm)
        # f32: the collapsed kernel's wide matmuls run as bf16 hi/lo
        # pairs (~2^-16 value accuracy) — re-association plus that split.
        # bf16: the collapsed a1/U pass rounds different intermediates
        # than the per-term backward. Error is judged against each
        # ARRAY's scale: these are summed contractions (entries ~1e3)
        # whose near-zero entries carry the sum's absolute noise, so
        # per-element rtol is meaningless there.
        tol = 1e-3 if not bf16_mm else 2e-2
        names = ("dq", "dxyz", "dfeats", "dw1", "db1", "dw2", "db2")
        for a, b, name in zip(ref, got, names):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, rtol=0, atol=tol * scale,
                                       err_msg=name)

    def test_matches_direct_oracle(self, interpret_mode, monkeypatch):
        """Collapsed backward vs the rounding-matched unfused oracle
        (same contract as TestKernelInterpret.test_backward_kernel)."""
        args = self._kargs(12)
        monkeypatch.setattr(sg, "_BWD_COLLAPSED", True)

        def bf16_direct(q, xyz, feats, w1, b1, w2, b2):
            fb = feats.astype(jnp.bfloat16).astype(jnp.float32)
            idx = knn_indices(q, xyz, 32)
            return _mlp_max_from_idx(q, xyz, fb, w1, b1, w2, b2, idx)

        def loss(impl, w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(impl(q, xyz, feats, w1, b1, w2, b2) ** 2)

        fused = lambda *a: fused_set_abstraction(*a, 32)
        g1a, g2a = jax.grad(lambda w, f: loss(fused, w, f),
                            argnums=(0, 1))(args[3], args[2])
        g1b, g2b = jax.grad(lambda w, f: loss(bf16_direct, w, f),
                            argnums=(0, 1))(args[3], args[2])
        np.testing.assert_allclose(np.asarray(g1a), np.asarray(g1b),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(g2a), np.asarray(g2b),
                                   rtol=1e-2, atol=1e-2)
