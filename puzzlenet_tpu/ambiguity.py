"""Ambiguity-factored pose errors for rotationally-symmetric cuts.

The reference's pose metrics (metrics.py:54-70) charge the full geodesic
rotation error to the model. For curved cut primitives that is partly
unfair: a cone or cylinder cut surface is rotationally symmetric about
its axis, so rotating the restored piece about that axis leaves the cut
interface geometrically seamless — the boundary ring carries NO signal
for that rotation component, only the piece's bulk asymmetry does. On
vase_cone this shows up as r_mae ~15 deg (PERFORMANCE.md) dominated by
the near-ambiguous mode.

This module factors the pose residual into that symmetry mode and its
complement (host numpy; swing-twist decomposition about the cut axis):

    E = g_pred @ igt          (ideal prediction is igt^-1, so E ~ I)
    E = S(theta*) @ E_perp    with S a rotation about the cut's symmetry
                              axis line and E_perp the part the cut
                              geometry actually pins down

``factored`` errors are E_perp's; ``twist_deg`` is |theta*|, the
magnitude the raw metric charged to the ambiguous mode. For planes the
symmetry axis is the normal (the cut SURFACE is symmetric; the ring
usually is not — the factored number is then a lower bound on the fair
error). Spheres are symmetric about every axis through the center, so
only translation is constrained; factored rotation error is 0 by
definition there.

No reference equivalent (its eval never conditions on the cut,
dataset4val2.py only returns the primitive for visualization) — this is
analysis tooling for the curved-cut convergence rows.
"""

import numpy as np


def _quat_from_mat(R):
    """Unit quaternion (w, x, y, z) from a rotation matrix (numpy, one)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
        q = np.zeros(4)
        q[1 + i] = 0.25 * s
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
        w, x, y, z = q
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _axis_angle_mat(axis, theta):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def swing_twist(R, axis):
    """Decompose R = twist @ swing with twist a rotation about ``axis``.

    Returns (swing_deg, twist_deg): the geodesic angle of the swing
    component (the minimal rotation distance from R to the 1-parameter
    subgroup of rotations about ``axis``) and the signed-magnitude twist
    angle that was factored out. Standard quaternion swing-twist: the
    twist is the normalized projection of the quaternion onto
    (w, (v.a)a); the swing is R composed with its inverse.
    """
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    w, x, y, z = _quat_from_mat(np.asarray(R, np.float64))
    v = np.array([x, y, z])
    p = float(v @ a)
    n = np.hypot(w, p)
    if n < 1e-12:
        # 180-degree swing exactly orthogonal to the axis: twist undefined,
        # whole rotation is swing
        return 180.0, 0.0
    tw = np.array([w, p * a[0], p * a[1], p * a[2]]) / n
    # swing = q * conj(twist): only its w component is needed for the angle
    sw_w = np.clip(w * tw[0] + v @ tw[1:], -1.0, 1.0)
    swing_deg = float(np.degrees(2 * np.arccos(abs(sw_w))))
    twist_deg = float(np.degrees(2 * np.arctan2(p, w)))
    # wrap twist into (-180, 180]
    if twist_deg > 180.0:
        twist_deg -= 360.0
    elif twist_deg <= -180.0:
        twist_deg += 360.0
    return swing_deg, twist_deg


def cut_axis(cut):
    """(axis direction, a point on the axis line) of a cut dict from
    data/slicers.py (need=True), in the canonical cloud frame — or None
    for spheres (every axis through the center is a symmetry).

    plane:    the normal, through any in-plane point (translations along
              the axis are NOT cut symmetries, but rotation about the
              normal through any of its points is the same rotation
              family — pick the foot point of the origin).
    cylinder: R @ z through the translation t.
    cone:     R @ z; the canonical cone's axis passes through the origin
              (base center (0,0,-1), apex (0,0,1)) and the pose is a
              pure rotation (slicers.py:79-91), so the line passes
              through the origin.
    """
    kind = cut["type"]
    if kind == "plane":
        n = np.asarray(cut["normal"], np.float64)
        nn = n / np.linalg.norm(n)
        # plane is dot(p, normal) + z = 0; foot of origin
        return nn, -float(cut["z"]) / np.linalg.norm(n) * nn
    if kind == "cylinder":
        return (np.asarray(cut["R"], np.float64)[:, 2],
                np.asarray(cut["t"], np.float64))
    if kind == "cone":
        return np.asarray(cut["R"], np.float64)[:, 2], np.zeros(3)
    if kind == "sphere":
        return None
    raise ValueError(kind)


def factored_pose_error(g_pred, igt, cut):
    """Factor the pose residual of one prediction by the cut symmetry.

    ``g_pred`` [4, 4]: the net's output transform (maps mrpc back onto
    rpc — it approximates igt^-1). ``igt`` [4, 4]: the ground-truth
    motion. ``cut``: slicer dict (need=True). Returns a dict:

      r_iso_deg      raw geodesic rotation error (the reference metric)
      t_iso          raw translation error ||t_E|| of E = g_pred @ igt
      r_factored_deg rotation error after removing the best cut-axis twist
      t_factored     translation error after removing that same symmetry
      twist_deg      the removed axis-rotation magnitude (signed)
    """
    E = np.asarray(g_pred, np.float64) @ np.asarray(igt, np.float64)
    R_E, t_E = E[:3, :3], E[:3, 3]
    c = np.clip((np.trace(R_E) - 1) / 2, -1, 1)
    r_iso = float(np.degrees(np.arccos(c)))
    t_iso = float(np.linalg.norm(t_E))

    ax = cut_axis(cut)
    if ax is None:
        # sphere: rotation about the center is fully symmetric. The
        # nearest symmetry element to E rotates by R_E about the center:
        # E_perp = S^-1 E has identity rotation; its translation is what
        # the cut still pins down.
        ctr = np.asarray(cut["center"], np.float64)
        resid = t_E - (ctr - R_E @ ctr)
        return {"r_iso_deg": r_iso, "t_iso": t_iso,
                "r_factored_deg": 0.0,
                "t_factored": float(np.linalg.norm(resid)),
                "twist_deg": r_iso}
    a, p0 = ax
    swing_deg, twist_deg = swing_twist(R_E, a)
    S = np.eye(4)
    S[:3, :3] = _axis_angle_mat(a, np.radians(twist_deg))
    S[:3, 3] = p0 - S[:3, :3] @ p0
    E_perp = np.linalg.inv(S) @ E
    Rp = E_perp[:3, :3]
    cp = np.clip((np.trace(Rp) - 1) / 2, -1, 1)
    return {"r_iso_deg": r_iso, "t_iso": t_iso,
            "r_factored_deg": float(np.degrees(np.arccos(cp))),
            "t_factored": float(np.linalg.norm(E_perp[:3, 3])),
            "twist_deg": twist_deg}
