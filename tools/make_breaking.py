"""Synthetic Breaking-Bad-style fragment generator (bbv category).

The reference's BreakingDataset (dataset.py:1008-1099) consumes JSON
manifests (``config/tmp.json``) listing fragment mesh pairs under a data
dir; the real Breaking-Bad payloads are absent from the environment. This
tool generates a synthetic substitute with the same layout so the bbv
category can train end-to-end:

- base shapes: UV-sphere triangulations with low-order radial bumps (so
  no rotational symmetry makes the pose unidentifiable — the round-2
  vase lesson, data/synthetic.py)
- fragments: one or two random plane cuts; each fragment is the subset
  of triangles whose centroid falls on one side (an open mesh whose
  surface sampling matches the fractured-piece distribution)
- pairs: two-fragment items ([piece0, piece1]) plus, for 3-fragment
  shapes, list-valued item0 entries ([pieceA, pieceB], pieceC) —
  exercising the manifest's merged-group contract
- layout: meshes under <out>/breaking_synth/*.obj, manifests at
  <out>/config/tmp.json with train_maps_tiny / test_maps_tiny keys

Usage:
    python tools/make_breaking.py --out data [--shapes 24 --test_frac 0.2]

Then train with PUZZLENET_DATA_DIR=<out>:
    python train.py --dataset bbv --host_data ...
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def bumpy_sphere(rng, nu=48, nv=96):
    """Closed UV-sphere triangulation with random low-order radial bumps
    -> (vertices [n,3] f32, faces [m,3] i32)."""
    th = np.linspace(0, np.pi, nu)              # polar
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = np.ones_like(T)
    for _ in range(3):
        k = rng.integers(1, 4)
        m = rng.integers(1, 5)
        r += 0.12 * rng.random() * np.cos(k * T + rng.random() * 6.28) \
            * np.cos(m * P + rng.random() * 6.28)
    x = r * np.sin(T) * np.cos(P)
    y = r * np.sin(T) * np.sin(P)
    z = r * np.cos(T)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)

    def vid(i, j):
        return i * nv + (j % nv)

    faces = []
    for i in range(nu - 1):
        for j in range(nv):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            faces.append((a, b, c))
            faces.append((b, d, c))
    return verts, np.asarray(faces, np.int32)


def plane_fragments(verts, faces, rng):
    """Split a triangle mesh by a random plane (centroid side test) ->
    two (verts, faces) fragments, or None if a side is too small."""
    n = rng.normal(size=3)
    n /= np.linalg.norm(n)
    off = rng.uniform(-0.25, 0.25)
    cent = verts[faces].mean(axis=1)
    side = cent @ n - off > 0
    out = []
    for sel in (side, ~side):
        f = faces[sel]
        if len(f) < 400:        # enough area for 2000-sample coverage
            return None
        used = np.unique(f)
        remap = np.zeros(len(verts), np.int32)
        remap[used] = np.arange(len(used))
        out.append((verts[used], remap[f]))
    return out


def write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:     # OBJ is 1-indexed
            f.write(f"f {a} {b} {c}\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data",
                   help="dataset root (meshes under <out>/breaking_synth, "
                        "manifests under <out>/config)")
    p.add_argument("--shapes", type=int, default=24)
    p.add_argument("--test_frac", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(argv)

    rng = np.random.default_rng(ns.seed)
    mesh_dir = os.path.join(ns.out, "breaking_synth")
    cfg_dir = os.path.join(ns.out, "config")
    os.makedirs(mesh_dir, exist_ok=True)
    os.makedirs(cfg_dir, exist_ok=True)

    items = []
    for s in range(ns.shapes):
        verts, faces = bumpy_sphere(rng)
        frags = None
        tries = 0
        while frags is None and tries < 100:
            frags = plane_fragments(verts, faces, rng)
            tries += 1
        if frags is None:
            raise RuntimeError(
                f"shape {s}: no valid primary plane split in 100 tries "
                "(parameters may make the face-count minimum unreachable)")
        names = []
        # every 3rd shape: cut fragment 0 again -> a 3-piece shape whose
        # pair is ([pieceA, pieceB], pieceC) — the merged-group contract
        three_way = s % 3 == 2
        if three_way:
            sub = None
            tries = 0
            while sub is None and tries < 20:
                sub = plane_fragments(*frags[0], rng)
                tries += 1
            if sub is not None:
                frags = [sub[0], sub[1], frags[1]]
        for i, (v, f) in enumerate(frags):
            name = f"breaking_synth/shape{s:03d}_frag{i}.obj"
            write_obj(os.path.join(ns.out, name), v, f)
            names.append(name)
        if len(names) == 3:
            items.append([[names[0], names[1]], names[2]])
        else:
            items.append([names[0], names[1]])

    n_test = max(1, int(round(len(items) * ns.test_frac)))
    manifest = {"train_maps_tiny": items[n_test:],
                "test_maps_tiny": items[:n_test]}
    out_json = os.path.join(cfg_dir, "tmp.json")
    with open(out_json, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(items) - n_test} train / {n_test} test pairs -> "
          f"{out_json}")
    return out_json


if __name__ == "__main__":
    main()
