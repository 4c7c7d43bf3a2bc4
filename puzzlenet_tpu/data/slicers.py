"""Random-primitive slicing engines (host-side numpy).

Capability parity with dataset.py:715-775. The reference builds an open3d
RaycastingScene per cut and evaluates mesh signed distances; only the SIGN is
ever used (inside/outside partition), so closed-form inside tests on the
randomly-posed primitive are exact replacements (and ~1000x cheaper):

* sphere_split   — radius-0.5 sphere translated by U[0,1)^3 / 3
  (dataset.py:715-728)
* cylinder_split — radius-0.6, height-1 cylinder, random axis-angle
  rotation (angle = |w|, w ~ U[0,1)^3), translated U[0,1)^3 / 3
  (dataset.py:730-744)
* cone_split     — radius-1, height-2 cone with base center moved to
  (0,0,-1) (apex at +1), random axis-angle rotation (dataset.py:746-759)
* plane_split    — random normal in U[0,1)^3 (positive octant, unnormalized,
  as in the reference), offset z ~ U[0,1)/3 (dataset.py:761-775)

Each returns (up, down): the points inside the primitive (signed distance
< 0) and the rest. All take a numpy Generator for determinism.
"""

import numpy as np


def _axis_angle_matrix(w):
    """Rotation matrix from an axis-angle vector (angle = |w|)."""
    t = np.linalg.norm(w)
    if t < 1e-12:
        return np.eye(3)
    a = w / t
    K = np.array([[0, -a[2], a[1]],
                  [a[2], 0, -a[0]],
                  [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)


def plane_split(points, z=None, rng=None, need=False):
    """Cut by a random plane: dot(p, normal) + z >= 0 -> up.

    ``need=True`` additionally returns the cut parameters (the reference's
    dataset4val2.py slicers return the cutting primitive the same way)."""
    rng = rng or np.random.default_rng()
    normal = rng.random(3)
    if z is None:
        z = rng.random() / 3
    dis = points @ normal + z
    up = points[dis >= 0]
    down = points[dis < 0]
    if need:
        return up, down, {"type": "plane", "normal": normal, "z": float(z)}
    return up, down


def sphere_split(points, z=None, rng=None, need=False):
    rng = rng or np.random.default_rng()
    center = rng.random(3) / 3
    inside = np.linalg.norm(points - center, axis=1) < 0.5
    if need:
        return points[inside], points[~inside], {
            "type": "sphere", "center": center, "radius": 0.5}
    return points[inside], points[~inside]


def cylinder_split(points, z=None, rng=None, need=False):
    rng = rng or np.random.default_rng()
    R = _axis_angle_matrix(rng.random(3))
    t = rng.random(3) / 3
    # primitive frame: rotate-then-translate was applied to the cylinder, so
    # map points back: p' = R^T (p - t); canonical cylinder is axis-z,
    # z in [-1/2, 1/2], radius 0.6
    p = (points - t) @ R
    inside = (np.hypot(p[:, 0], p[:, 1]) < 0.6) & (np.abs(p[:, 2]) < 0.5)
    if need:
        return points[inside], points[~inside], {
            "type": "cylinder", "R": R, "t": t, "radius": 0.6, "height": 1.0}
    return points[inside], points[~inside]


def cone_split(points, z=None, rng=None, need=False):
    rng = rng or np.random.default_rng()
    R = _axis_angle_matrix(rng.random(3))
    # cone: radius 1, height 2, base center translated to (0,0,-1) BEFORE the
    # rotation (dataset.py:747-749), apex at (0,0,+1)
    p = points @ R  # undo rotation (rotation was about the origin)
    zc = p[:, 2] + 1.0  # height above the base plane
    r_at_z = 1.0 - zc / 2.0  # linear taper from r=1 at base to 0 at apex
    inside = (zc > 0) & (zc < 2.0) & (np.hypot(p[:, 0], p[:, 1]) < r_at_z)
    if need:
        return points[inside], points[~inside], {
            "type": "cone", "R": R, "radius": 1.0, "height": 2.0}
    return points[inside], points[~inside]


SLICERS = {
    "plane": plane_split,
    "sphere": sphere_split,
    "cylinder": cylinder_split,
    "cone": cone_split,
}


def sample_cut_surface(cut, n=512, rng=None, extent=1.2):
    """Sample n points on the cutting surface described by ``cut``
    (the analytic stand-in for dataset4val2's returned o3d primitive)."""
    rng = rng or np.random.default_rng()
    if cut["type"] == "plane":
        normal = np.asarray(cut["normal"], np.float64)
        nrm = normal / np.linalg.norm(normal)
        # orthonormal tangent basis
        a = np.array([1.0, 0, 0]) if abs(nrm[0]) < 0.9 else np.array([0, 1.0, 0])
        u = np.cross(nrm, a); u /= np.linalg.norm(u)
        v = np.cross(nrm, u)
        uv = (rng.random((n, 2)) - 0.5) * 2 * extent
        base = -cut["z"] / np.linalg.norm(normal) * nrm
        return (base + uv[:, :1] * u + uv[:, 1:] * v).astype(np.float32)
    if cut["type"] == "sphere":
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return (cut["center"] + cut["radius"] * d).astype(np.float32)
    if cut["type"] == "cylinder":
        th = rng.random(n) * 2 * np.pi
        z = (rng.random(n) - 0.5) * cut["height"]
        p = np.stack([cut["radius"] * np.cos(th),
                      cut["radius"] * np.sin(th), z], 1)
        return (p @ cut["R"].T + cut["t"]).astype(np.float32)
    if cut["type"] == "cone":
        zc = rng.random(n) * cut["height"]
        r = cut["radius"] * (1 - zc / cut["height"])
        th = rng.random(n) * 2 * np.pi
        p = np.stack([r * np.cos(th), r * np.sin(th), zc - 1.0], 1)
        return (p @ cut["R"].T).astype(np.float32)
    raise ValueError(cut["type"])
