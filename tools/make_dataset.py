"""Mesh-directory -> reference-format npy dataset builder.

Replaces the reference's manual preprocessing pipeline
(/root/reference/README.md:35-46: CloudCompare CLI sampling ~12000
points/mesh, unit normalization, manual train/test split) with one
command:

    python tools/make_dataset.py --mesh_dir /path/to/offs \
        --out data/np_vase_all_11000 --n_points 11000 [--test_frac 0.2]

Writes ``<out>_train_2.npy`` / ``<out>_test_2.npy`` — object arrays of
[n_points, 3] float32 clouds, area-weighted surface samples normalized
into the unit sphere — the exact payload contract the category registry
loads (data/registry.py::_load_clouds, matching the reference's
data/*.npy files consumed at /root/reference/dataset.py:1110-1121).

Supports .off (including the broken-ModelNet header variant), .obj and
.ply via data/meshio.py — no external tools.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puzzlenet_tpu.data.meshio import read_mesh  # noqa: E402


def mesh_to_cloud(path, n_points, rng):
    mesh = read_mesh(path)
    pts = mesh.sample_uniform(n_points, rng=rng).astype(np.float32)
    # normalize into the unit sphere (reference step 3)
    pts -= pts.mean(axis=0, keepdims=True)
    scale = np.linalg.norm(pts, axis=1).max()
    if scale > 0:
        pts /= scale
    return pts


def main(argv=None):
    p = argparse.ArgumentParser("make_dataset")
    p.add_argument("--mesh_dir", required=True,
                   help="directory of .off/.obj/.ply meshes (recursive)")
    p.add_argument("--out", required=True,
                   help="output base path; writes <out>_train_2.npy and "
                        "<out>_test_2.npy")
    p.add_argument("--n_points", type=int, default=11000)
    p.add_argument("--test_frac", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0,
                   help="cap the number of meshes (0 = all)")
    ns = p.parse_args(argv)

    exts = (".off", ".obj", ".ply")
    paths = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(ns.mesh_dir)
        for f in fs if f.lower().endswith(exts))
    if ns.limit:
        paths = paths[:ns.limit]
    if not paths:
        raise SystemExit(f"no meshes under {ns.mesh_dir}")

    rng = np.random.default_rng(ns.seed)
    clouds = []
    for i, path in enumerate(paths):
        try:
            clouds.append(mesh_to_cloud(path, ns.n_points, rng))
        except Exception as e:  # noqa: BLE001 — skip unreadable meshes
            print(f"skip {path}: {e}")
            continue
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{len(paths)}")

    order = rng.permutation(len(clouds))
    n_test = max(1, int(round(len(clouds) * ns.test_frac)))
    test_idx = set(order[:n_test].tolist())
    train = [clouds[i] for i in range(len(clouds)) if i not in test_idx]
    test = [clouds[i] for i in range(len(clouds)) if i in test_idx]

    os.makedirs(os.path.dirname(os.path.abspath(ns.out)) or ".",
                exist_ok=True)
    arr_t = np.empty(len(train), dtype=object)
    arr_t[:] = train
    arr_e = np.empty(len(test), dtype=object)
    arr_e[:] = test
    np.save(ns.out + "_train_2.npy", arr_t, allow_pickle=True)
    np.save(ns.out + "_test_2.npy", arr_e, allow_pickle=True)
    print(f"wrote {len(train)} train / {len(test)} test clouds of "
          f"{ns.n_points} pts -> {ns.out}_{{train,test}}_2.npy")


if __name__ == "__main__":
    main()
