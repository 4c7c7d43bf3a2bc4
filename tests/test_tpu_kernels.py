"""TPU-only Pallas kernel tests (skipped on CPU backends).

The CPU suite validates the lax/unfused reference paths; these tests check
the Pallas kernels against them on real hardware. Run manually with:
    PUZZLENET_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
(the shared conftest pins CPU, so these tests re-check the backend and
skip unless a TPU is actually active).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a TPU backend")


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(4, 256, 3)).astype(np.float32)
    x2 = (x1 + 0.1 * rng.normal(size=x1.shape)).astype(np.float32)
    return jnp.asarray(x1), jnp.asarray(x2)


class TestPallasFPS:
    def test_matches_lax(self, clouds):
        from puzzlenet_tpu.ops import farthest_point_sample
        from puzzlenet_tpu.ops.fps_pallas import fps_pallas

        xyz, _ = clouds
        start = jnp.zeros((4,), jnp.int32)
        a = np.asarray(fps_pallas(xyz, 64, start))
        b = np.asarray(farthest_point_sample(xyz, 64, use_pallas=False))
        np.testing.assert_array_equal(a, b)


class TestPallasEMD:
    def test_cost_matches_lax(self, clouds):
        from puzzlenet_tpu.ops.emd import _emd_cost
        from puzzlenet_tpu.ops.emd_pallas import emd_cost_pallas

        x1, x2 = clouds
        a = np.asarray(emd_cost_pallas(x1, x2))
        b = np.asarray(_emd_cost(x1, x2))
        np.testing.assert_allclose(a, b, rtol=2e-3)

    def test_grad_matches_lax(self, clouds):
        from puzzlenet_tpu.ops.emd import _emd_cost
        from puzzlenet_tpu.ops.emd_pallas import emd_cost_pallas

        x1, x2 = clouds
        ga = jax.grad(lambda a: jnp.sum(emd_cost_pallas(a, x2)))(x1)
        gb = jax.grad(lambda a: jnp.sum(_emd_cost(a, x2)))(x1)
        scale = float(jnp.max(jnp.abs(gb)))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=0.02 * scale)


class TestPallasSG:
    def test_forward_close_to_unfused(self, clouds):
        from puzzlenet_tpu.ops import knn_indices
        from puzzlenet_tpu.ops.sg_pallas import (_mlp_max_from_idx,
                                                 fused_set_abstraction)

        xyz, _ = clouds
        q = xyz[:, :128]
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(4, 256, 16)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(19, 32)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(32)
        w2 = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(32)
        a = fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 8)
        idx = knn_indices(q, xyz, 8)
        b = _mlp_max_from_idx(q, xyz, feats, w1, b1, w2, b2, idx)
        # bf16 gather rounding bounds the difference
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)

    def test_bf16_mm_close_to_f32(self, clouds):
        """bf16-operand MLP matmuls (the inference primal's serving
        dtype): same neighbor sets as f32 are not guaranteed, but the
        outputs must agree within bf16 rounding of the activations."""
        from puzzlenet_tpu.ops.sg_pallas import fused_set_abstraction

        xyz, _ = clouds
        q = xyz[:, :128]
        rng = np.random.default_rng(4)
        feats = jnp.asarray(rng.normal(size=(4, 256, 16)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(19, 32)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(32)
        w2 = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(32)
        a = fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 8)
        c = fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 8, True)
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   atol=0.03 * scale)

    def test_fd_gradient(self, clouds):
        from puzzlenet_tpu.ops.sg_pallas import fused_set_abstraction

        xyz, _ = clouds
        q = xyz[:, :128]
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.normal(size=(4, 256, 16)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(19, 32)).astype(np.float32) * 0.2)
        b1 = jnp.zeros(32)
        w2 = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 0.2)
        b2 = jnp.zeros(32)

        def loss(w1):
            return jnp.sum(
                fused_set_abstraction(q, xyz, feats, w1, b1, w2, b2, 8) ** 2)

        g = jax.grad(loss)(w1)
        v = jnp.asarray(rng.normal(size=w1.shape).astype(np.float32))
        eps = 1e-2
        fd = (float(loss(w1 + eps * v)) - float(loss(w1 - eps * v))) / (
            2 * eps)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) / max(abs(fd), 1e-6) < 0.1, (fd, an)


class TestPallasSGLayoutT:
    """Hardware twin of tests/test_sg_fused.py's transposed-layout parity:
    _LAYOUT_T claims bit-identical outputs to the row-major kernel, and
    the transposed stream repeats the mantissa-id packing — the denormal
    FTZ class of bug (CLAUDE.md invariant) only shows on real hardware."""

    def _kargs(self, seed=0):
        rng = np.random.default_rng(seed)
        b, s, n, c = 2, 512, 1024, 64
        xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 128)).astype(np.float32)
                         * 0.3)
        b1 = jnp.asarray(rng.normal(size=(128,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)
                         * 0.3)
        b2 = jnp.asarray(rng.normal(size=(128,)).astype(np.float32) * 0.1)
        return q, xyz, feats, w1, b1, w2, b2

    def test_forward_matches_row_major_hw(self, monkeypatch):
        from puzzlenet_tpu.ops import sg_pallas as sg

        args = self._kargs(11)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        tr = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in ((0, "out"), (2, "amax"), (3, "m1"), (4, "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(tr[i]), err_msg=name)
        idx_row = np.sort(np.asarray(row[1]), axis=2)
        idx_tr = np.sort(np.swapaxes(np.asarray(tr[1]), 1, 2), axis=2)
        np.testing.assert_array_equal(idx_row, idx_tr, err_msg="idx sets")

    def test_grads_match_row_major_hw(self, monkeypatch):
        from puzzlenet_tpu.ops import sg_pallas as sg

        args = self._kargs(12)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(sg.fused_set_abstraction(
                q, xyz, feats, w1, b1, w2, b2, 32) ** 2)

        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        g_row = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        g_tr = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(g_row, g_tr, ("dw1", "dfeats")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

    def test_coincident_points_hw(self, monkeypatch):
        """Duplicate points force zero distances in the packed selection
        stream — the FTZ trap. The transposed kernel must still select k
        distinct indices and produce finite outputs."""
        from puzzlenet_tpu.ops import sg_pallas as sg

        rng = np.random.default_rng(13)
        b, s, n, c = 1, 256, 512, 64
        base = rng.normal(size=(b, n // 2, 3)).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([base, base], axis=1))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 128)).astype(np.float32)
                         * 0.3)
        b1 = jnp.zeros(128)
        w2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)
                         * 0.3)
        b2 = jnp.zeros(128)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", True)
        out, idx, amax, m1, m2 = sg._fused_forward(
            q, xyz, feats, w1, b1, w2, b2, 32, with_masks=True)
        assert np.isfinite(np.asarray(out)).all()
        idx = np.asarray(idx)                                  # [B, k, S]
        for r in range(idx.shape[2]):
            assert len(set(idx[0, :, r].tolist())) == idx.shape[1], r


class TestPallasSGLayoutTS:
    """Hardware parity for the HYBRID layout (_LAYOUT_TS: transposed
    sublane-tree selection + row-major consume): claims full bit-identity
    with the row-major pipe kernel INCLUDING the saved idx (same packing
    bits, same tie rule, same winner order), plus the FTZ duplicate-point
    class and the in-kernel int32 winners transpose only hardware
    exercises."""

    _kargs = TestPallasSGLayoutT._kargs

    def test_forward_bit_identical_hw(self, monkeypatch):
        from puzzlenet_tpu.ops import sg_pallas as sg

        args = self._kargs(21)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_T", False)
        monkeypatch.setattr(sg, "_LAYOUT_TS", False)
        row = sg._fused_forward(*args, 32, with_masks=True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        hyb = sg._fused_forward(*args, 32, with_masks=True)
        for i, name in enumerate(("out", "idx", "amax", "m1", "m2")):
            np.testing.assert_array_equal(np.asarray(row[i]),
                                          np.asarray(hyb[i]), err_msg=name)

    def test_grads_bit_identical_hw(self, monkeypatch):
        from puzzlenet_tpu.ops import sg_pallas as sg

        args = self._kargs(22)

        def loss(w1, feats):
            q, xyz, _, _, b1, w2, b2 = args
            return jnp.sum(sg.fused_set_abstraction(
                q, xyz, feats, w1, b1, w2, b2, 32) ** 2)

        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", False)
        g_row = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        g_hyb = jax.grad(loss, argnums=(0, 1))(args[3], args[2])
        for a, b, name in zip(g_row, g_hyb, ("dw1", "dfeats")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_coincident_points_hw(self, monkeypatch):
        from puzzlenet_tpu.ops import sg_pallas as sg

        rng = np.random.default_rng(23)
        b, s, n, c = 1, 256, 512, 64
        base = rng.normal(size=(b, n // 2, 3)).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([base, base], axis=1))
        q = xyz[:, :s]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(c + 3, 128)).astype(np.float32)
                         * 0.3)
        b1 = jnp.zeros(128)
        w2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)
                         * 0.3)
        b2 = jnp.zeros(128)
        monkeypatch.setattr(sg, "_PIPELINE", True)
        monkeypatch.setattr(sg, "_LAYOUT_TS", True)
        out, idx, amax, m1, m2 = sg._fused_forward(
            q, xyz, feats, w1, b1, w2, b2, 32, with_masks=True)
        assert np.isfinite(np.asarray(out)).all()
        idx = np.asarray(idx)                                  # [B, S, k]
        for r in range(idx.shape[1]):
            assert len(set(idx[0, r].tolist())) == idx.shape[2], r


class TestSortedTopkNearTies:
    """sorted_topk packs chunk + lane ids into the low mantissa bits of
    the squared distances, so two DISTINCT points whose distances differ
    by less than the tie band (sorted_topk_tie_band ulps) may swap in/out
    of the selected set vs the exact oracle. This bounds the drift: every
    selected distance must be within one band of the true k-th smallest,
    and everything strictly below that band must be selected. Run on
    hardware (the denormal-FTZ class of bug is invisible in CPU interpret
    mode)."""

    def test_near_tie_band_contract(self):
        from puzzlenet_tpu.ops.lanered import (sorted_topk,
                                               sorted_topk_tie_band)

        rng = np.random.default_rng(5)
        k, n, rows = 32, 1024, 64
        band = sorted_topk_tie_band(n)
        d = rng.uniform(0.1, 4.0, size=(rows, n)).astype(np.float32)
        # plant a near-tie cluster straddling the k-th rank: 12 values
        # within a few ulps of each other around each row's k-th smallest
        kth = np.partition(d, k, axis=1)[:, k]
        for r in range(rows):
            base = np.float32(kth[r])
            ulp = np.spacing(base, dtype=np.float32)
            js = rng.choice(n, size=12, replace=False)
            d[r, js] = base + (rng.integers(-3, 4, size=12) * ulp
                               ).astype(np.float32)
        dj = jnp.asarray(d)
        idx = np.asarray(jax.jit(lambda x: sorted_topk(x, k))(dj))
        for r in range(rows):
            sel = d[r, idx[r]]
            order = np.sort(d[r])
            thresh = order[k - 1]
            band_hi = thresh + band * np.spacing(thresh, dtype=np.float32)
            band_lo = thresh - band * np.spacing(thresh, dtype=np.float32)
            assert len(set(idx[r].tolist())) == k, r
            assert sel.max() <= band_hi, (r, sel.max(), thresh)
            must = np.where(d[r] < band_lo)[0]
            assert set(must).issubset(set(idx[r].tolist())), r


class TestPallasMaskedFPS:
    """Masked FPS (the data pipeline's 11k->1024 path). Exact chain
    equality with the lax path is not guaranteed at depth — TPU vs CPU
    float reduction order flips near-ties deep in the chain — so the
    contract is validity + sampling quality (covering radius)."""

    def test_valid_selection_and_quality(self):
        from puzzlenet_tpu.ops import farthest_point_sample
        from puzzlenet_tpu.ops.fps_pallas import fps_pallas

        rng = np.random.default_rng(3)
        xyz = jnp.asarray(rng.normal(size=(4, 2200, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random((4, 2200)) < 0.6)
        start = jnp.argmax(mask, axis=1).astype(jnp.int32)
        idx = np.asarray(fps_pallas(xyz, 256, start, mask))
        m = np.asarray(mask)
        assert all(m[b, i] for b in range(4) for i in idx[b])
        np.testing.assert_array_equal(idx[:, 0], np.asarray(start))

        # covering radius (max over valid points of distance to the chosen
        # set) must match the lax chain's within a few percent
        ref = np.asarray(farthest_point_sample(
            xyz, 256, start_idx=start, valid_mask=mask, use_pallas=False))
        x = np.asarray(xyz)

        def cover(sel):
            out = []
            for b in range(4):
                d = ((x[b][:, None] - x[b][sel[b]][None]) ** 2).sum(-1)
                out.append(np.sqrt(d.min(1)[m[b]].max()))
            return np.asarray(out)

        c_pallas, c_lax = cover(idx), cover(ref)
        np.testing.assert_allclose(c_pallas, c_lax, rtol=0.05)

    def test_short_chain_exact(self):
        """Shallow chains (before near-tie divergence) match exactly."""
        from puzzlenet_tpu.ops import farthest_point_sample
        from puzzlenet_tpu.ops.fps_pallas import fps_pallas

        rng = np.random.default_rng(4)
        xyz = jnp.asarray(rng.normal(size=(4, 1500, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random((4, 1500)) < 0.5)
        start = jnp.argmax(mask, axis=1).astype(jnp.int32)
        a = np.asarray(fps_pallas(xyz, 64, start, mask))
        b = np.asarray(farthest_point_sample(
            xyz, 64, start_idx=start, valid_mask=mask, use_pallas=False))
        np.testing.assert_array_equal(a, b)


class TestPallasChamfer:
    def test_forward_matches_oracle(self):
        """Fused chamfer on hardware vs the HIGHEST-GEMM oracle: exact
        elementwise distances; also covers the single-sublane (1, 1, M)
        d_b accumulator block and the packed-row argmin (FTZ class)."""
        from puzzlenet_tpu.ops.chamfer_pallas import chamfer_distances_fused
        from puzzlenet_tpu.ops.pointops import square_distance

        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.normal(size=(4, 1024, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4, 768, 3)).astype(np.float32))
        db, da = chamfer_distances_fused(a, b)
        P = square_distance(a, b, precision="highest")
        np.testing.assert_allclose(np.asarray(db),
                                   np.asarray(jnp.min(P, axis=1)),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da),
                                   np.asarray(jnp.min(P, axis=2)),
                                   rtol=5e-4, atol=1e-5)

    def test_grads_match_oracle(self):
        from puzzlenet_tpu.ops import chamfer_pallas as cp
        from puzzlenet_tpu.ops.pointops import square_distance

        rng = np.random.default_rng(8)
        a = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))

        def loss_fused(a, b):
            db, da = cp.chamfer_distances_fused(a, b)
            return jnp.mean(db) + 2.0 * jnp.mean(da ** 2)

        def loss_xla(a, b):
            P = square_distance(a, b, precision="highest")
            db, da = jnp.min(P, axis=1), jnp.min(P, axis=2)
            return jnp.mean(db) + 2.0 * jnp.mean(da ** 2)

        ga, gb = jax.grad(loss_fused, argnums=(0, 1))(a, b)
        wa, wb = jax.grad(loss_xla, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                                   rtol=1e-3, atol=1e-5)

    def test_grad_zero_distance_hw(self):
        """Coincident winners: d == 0 packed ids must survive the VPU's
        denormal flush on REAL hardware (interpret mode cannot catch
        this class — CLAUDE.md invariant)."""
        from puzzlenet_tpu.ops.chamfer_pallas import chamfer_distances_fused

        rng = np.random.default_rng(9)
        pts = rng.normal(size=(1, 512, 3)).astype(np.float32)
        a = jnp.asarray(pts)
        b = jnp.asarray(np.concatenate(
            [pts[:, :256], pts[:, :256] + 0.5], axis=1))

        def loss(a, b):
            db, da = chamfer_distances_fused(a, b)
            return jnp.sum(db) + jnp.sum(da)

        db, da = chamfer_distances_fused(a, b)
        assert float(jnp.max(da[:, :512][:, :256])) == 0.0  # a[:256] hit
        ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
        assert np.isfinite(np.asarray(ga)).all()
        assert np.isfinite(np.asarray(gb)).all()
