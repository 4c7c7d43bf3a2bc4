"""Ambiguity-factored pose metrics: swing-twist math vs brute force, and
the cut-symmetry invariants each factored error must satisfy."""

import numpy as np
import pytest

from puzzlenet_tpu.ambiguity import (_axis_angle_mat, cut_axis,
                                     factored_pose_error, swing_twist)


def _rand_rot(rng, scale=1.0):
    w = rng.standard_normal(3) * scale
    return _axis_angle_mat(w / (np.linalg.norm(w) + 1e-12),
                           np.linalg.norm(w))


def _geo_deg(R):
    return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))


class TestSwingTwist:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_bruteforce_min(self, seed):
        """swing angle == min over theta of angle(R_a(theta)^-1 @ R)."""
        rng = np.random.default_rng(seed)
        R = _rand_rot(rng, scale=rng.uniform(0.1, 2.5))
        a = rng.standard_normal(3)
        a /= np.linalg.norm(a)
        swing_deg, twist_deg = swing_twist(R, a)
        thetas = np.linspace(-np.pi, np.pi, 20001)
        brute = min(_geo_deg(_axis_angle_mat(a, -t) @ R) for t in thetas)
        assert abs(swing_deg - brute) < 0.05
        # the reported twist achieves the minimum
        achieved = _geo_deg(
            _axis_angle_mat(a, -np.radians(twist_deg)) @ R)
        assert abs(swing_deg - achieved) < 1e-6

    def test_pure_twist_and_pure_swing(self):
        a = np.array([0.0, 0.0, 1.0])
        R = _axis_angle_mat(a, 0.7)
        s, t = swing_twist(R, a)
        assert abs(s) < 1e-6 and abs(t - np.degrees(0.7)) < 1e-6
        R = _axis_angle_mat(np.array([1.0, 0, 0]), 0.5)
        s, t = swing_twist(R, a)
        assert abs(s - np.degrees(0.5)) < 1e-6 and abs(t) < 1e-6

    def test_identity(self):
        s, t = swing_twist(np.eye(3), np.array([0, 1.0, 0]))
        assert s < 1e-6 and abs(t) < 1e-6


class TestFactoredPoseError:
    @pytest.mark.parametrize("kind", ["cone", "cylinder", "plane"])
    def test_axis_symmetry_is_free(self, kind):
        """Composing the prediction with ANY rotation about the cut axis
        line must not change the factored errors (it IS the symmetry)."""
        rng = np.random.default_rng(3)
        R_cut = _rand_rot(rng)
        cut = {"cone": {"type": "cone", "R": R_cut},
               "cylinder": {"type": "cylinder", "R": R_cut,
                            "t": rng.random(3) / 3},
               "plane": {"type": "plane", "normal": rng.random(3),
                         "z": float(rng.random() / 3)}}[kind]
        igt = np.eye(4)
        igt[:3, :3] = _rand_rot(rng)
        igt[:3, 3] = rng.standard_normal(3) * 0.3

        # imperfect prediction
        g = np.linalg.inv(igt)
        g[:3, :3] = _rand_rot(rng, 0.05) @ g[:3, :3]
        g[:3, 3] += rng.standard_normal(3) * 0.01
        base = factored_pose_error(g, igt, cut)

        a, p0 = cut_axis(cut)
        for theta in (0.4, -1.2, 2.9):
            S = np.eye(4)
            S[:3, :3] = _axis_angle_mat(a, theta)
            S[:3, 3] = p0 - S[:3, :3] @ p0
            sym = factored_pose_error(S @ g, igt, cut)
            # raw error blows up, factored error is invariant
            assert sym["r_factored_deg"] == pytest.approx(
                base["r_factored_deg"], abs=1e-5)
            assert sym["t_factored"] == pytest.approx(
                base["t_factored"], abs=1e-5)
        # a perturbation NOT about the axis is not free
        S = np.eye(4)
        off = _axis_angle_mat(np.cross(a, [1.0, 0.33, -0.2]), 0.5)
        S[:3, :3] = off
        worse = factored_pose_error(S @ g, igt, cut)
        assert worse["r_factored_deg"] > base["r_factored_deg"] + 5

    def test_perfect_prediction_is_zero(self):
        rng = np.random.default_rng(0)
        igt = np.eye(4)
        igt[:3, :3] = _rand_rot(rng)
        igt[:3, 3] = rng.standard_normal(3) * 0.3
        cut = {"type": "cone", "R": _rand_rot(rng)}
        e = factored_pose_error(np.linalg.inv(igt), igt, cut)
        assert e["r_iso_deg"] < 1e-5 and e["r_factored_deg"] < 1e-5
        assert e["t_iso"] < 1e-9 and e["t_factored"] < 1e-9

    def test_sphere_center_rotation_is_free(self):
        rng = np.random.default_rng(1)
        igt = np.eye(4)
        igt[:3, :3] = _rand_rot(rng)
        cut = {"type": "sphere", "center": rng.random(3) / 3,
               "radius": 0.5}
        g = np.linalg.inv(igt)
        ctr = cut["center"]
        S = np.eye(4)
        S[:3, :3] = _rand_rot(rng, 2.0)
        S[:3, 3] = ctr - S[:3, :3] @ ctr
        e = factored_pose_error(S @ g, igt, cut)
        assert e["r_iso_deg"] > 10         # raw metric charges it
        assert e["r_factored_deg"] == 0.0  # symmetry absorbs it all
        assert e["t_factored"] < 1e-6

    def test_factored_never_exceeds_raw(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            igt = np.eye(4)
            igt[:3, :3] = _rand_rot(rng)
            igt[:3, 3] = rng.standard_normal(3) * 0.2
            g = np.linalg.inv(igt)
            g[:3, :3] = _rand_rot(rng, rng.uniform(0, 1.5)) @ g[:3, :3]
            cut = {"type": "cone", "R": _rand_rot(rng)}
            e = factored_pose_error(g, igt, cut)
            assert e["r_factored_deg"] <= e["r_iso_deg"] + 1e-6
