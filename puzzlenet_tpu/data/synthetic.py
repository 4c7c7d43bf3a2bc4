"""Synthetic whole-cloud generation.

The reference ships its training clouds as pickled object-array npys
(np_vase_all_11000_train_2.npy etc.), but the repo copies are git-LFS
pointer stubs (SURVEY.md §0). Until real payloads are supplied, these
parametric families generate clouds with the same contract: an object array
of float32 [~n_points, 3] clouds roughly normalized to the unit ball.

Families mimic the reference categories:
  * vase     — surface of revolution with a random radius profile
  * bed      — box slab + headboard + legs (boxy union)
  * airplane — fuselage (elongated ellipsoid) + wings + tail planes
  * blob     — random smooth radial field (generic CAD-ish shape)
"""

import numpy as np


def _unit_normalize(pts):
    pts = pts - pts.mean(0, keepdims=True)
    return (pts / np.linalg.norm(pts, axis=1).max()).astype(np.float32)


def _vase(rng, n):
    z = rng.random(n)
    # random smooth radius profile: positive trig polynomial of z
    a = rng.uniform(0.2, 0.5, 3)
    ph = rng.uniform(0, 2 * np.pi, 3)
    r = 0.35 + a[0] * np.sin(np.pi * z + ph[0]) ** 2 \
        + a[1] * 0.3 * np.sin(2 * np.pi * z + ph[1]) \
        + a[2] * 0.15 * np.sin(3 * np.pi * z + ph[2])
    r = np.clip(r, 0.08, 1.0)
    th = rng.uniform(0, 2 * np.pi, n)
    # azimuthal asymmetry — a perfect surface of revolution makes the
    # axial component of the assembly rotation unidentifiable (any
    # near-axial cut admits a continuum of valid poses), which floors
    # r_mae regardless of training. Low-order angular modes (lean +
    # ellipticity) plus a localized spout/handle bump keep the shape
    # vase-like while making the pose unique. Real vases (the
    # reference's LFS payloads) are asymmetric the same way.
    m1 = rng.uniform(0.08, 0.2)
    m2 = rng.uniform(0.05, 0.15)
    p1, p2 = rng.uniform(0, 2 * np.pi, 2)
    ang = 1.0 + m1 * np.cos(th - p1) + m2 * np.cos(2 * th - p2)
    tb = rng.uniform(0, 2 * np.pi)
    zb = rng.uniform(0.25, 0.75)
    dth = np.angle(np.exp(1j * (th - tb)))
    bump = rng.uniform(0.15, 0.35) * np.exp(
        -dth ** 2 / (2 * 0.35 ** 2) - (z - zb) ** 2 / (2 * 0.08 ** 2))
    r = r * ang + bump
    pts = np.stack([r * np.cos(th), r * np.sin(th), 1.6 * (z - 0.5)], 1)
    return _unit_normalize(pts)


def _box_surface(rng, n, cx, cy, cz, sx, sy, sz):
    """n points on the surface of an axis-aligned box."""
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u, v = rng.random(n) - 0.5, rng.random(n) - 0.5
    pts = np.empty((n, 3))
    for f in range(6):
        m = face == f
        axis, sign = f // 2, 1.0 if f % 2 == 0 else -1.0
        p = np.zeros((m.sum(), 3))
        others = [i for i in range(3) if i != axis]
        size = [sx, sy, sz]
        p[:, axis] = sign * size[axis] / 2
        p[:, others[0]] = u[m] * size[others[0]]
        p[:, others[1]] = v[m] * size[others[1]]
        pts[m] = p + [cx, cy, cz]
    return pts


def _bed(rng, n):
    slab = _box_surface(rng, int(n * 0.55), 0, 0, 0.0, 2.0, 1.2, 0.25)
    head = _box_surface(rng, int(n * 0.2), -1.0, 0, 0.35, 0.12, 1.2, 0.9)
    legs = []
    n_leg = (n - len(slab) - len(head)) // 4
    for sx in (-0.9, 0.9):
        for sy in (-0.5, 0.5):
            legs.append(_box_surface(rng, n_leg, sx, sy, -0.35, 0.12, 0.12,
                                     0.5))
    rest = n - len(slab) - len(head) - sum(len(l) for l in legs)
    extra = _box_surface(rng, max(rest, 0), 0, 0, 0.0, 2.0, 1.2, 0.25)
    return _unit_normalize(np.concatenate([slab, head, *legs, extra]))


def _airplane(rng, n):
    nf = int(n * 0.45)
    u = rng.standard_normal((nf, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    fuselage = u * [1.6, 0.22, 0.22]
    wing = _box_surface(rng, int(n * 0.3), 0.1, 0, 0, 0.5, 2.4, 0.06)
    tail_h = _box_surface(rng, int(n * 0.12), -1.3, 0, 0.05, 0.3, 0.9, 0.05)
    rest = n - nf - len(wing) - len(tail_h)
    tail_v = _box_surface(rng, max(rest, 1), -1.35, 0, 0.3, 0.3, 0.05, 0.5)
    return _unit_normalize(np.concatenate([fuselage, wing, tail_h, tail_v]))


def _blob(rng, n):
    u = rng.standard_normal((n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    a = rng.uniform(0.05, 0.3, 4)
    r = 1.0 + a[0] * u[:, 0] * u[:, 1] + a[1] * u[:, 2] ** 2 \
        + a[2] * np.sin(3 * u[:, 0]) + a[3] * np.cos(2 * u[:, 1] * u[:, 2])
    return _unit_normalize(u * r[:, None])


_FAMILIES = {"vase": _vase, "bed": _bed, "airplane": _airplane, "blob": _blob}


def synthetic_clouds(family="vase", count=32, n_points=11000, seed=0):
    """Object array of `count` float32 clouds (same contract as the
    reference's pickled npys of ~11k-point clouds)."""
    gen = _FAMILIES[family]
    rng = np.random.default_rng(seed)
    out = np.empty(count, dtype=object)
    for i in range(count):
        out[i] = gen(rng, n_points)
    return out
