"""Breaking-Bad-style fragment dataset.

Capability parity with BreakingDataset (dataset.py:1008-1099): JSON manifests
(``tmp.json`` + ``tiny_only.json`` under a config dir) list fragment mesh
pairs; each mesh is uniformly surface-sampled at 2000 points (item0 may be a
LIST of meshes whose samples are concatenated), FPS'd to 1024, and
boundary-labeled. Uses the numpy mesh reader/sampler (meshio.py) instead of
open3d.
"""

import json
import os

import numpy as np

from .augment import fps_np
from .boundary import get_boundary_np
from .meshio import read_mesh


class BreakingDataset:
    def __init__(self, mode="train", config_dir="config", data_dir="data",
                 manifests=("tmp.json", "tiny_only.json"), seed=0,
                 samples_per_mesh=2000, cache=False):
        """``cache=True`` precomputes every item's sampled/FPS'd/boundary-
        labeled arrays once at init (deterministic per (seed, index), so
        identical to on-demand generation) — the per-item mesh read +
        numpy FPS costs ~100 ms on a 1-CPU host, which would starve a
        TPU training loop if paid per draw; the twist augmentation on
        top (MovedDataset) stays per-draw either way."""
        self.mode = mode
        self.data_dir = data_dir
        self.seed = seed
        self.samples_per_mesh = samples_per_mesh
        self.items_list = []
        key = f"{mode}_maps_tiny"
        for name in manifests:
            path = os.path.join(config_dir, name)
            if not os.path.exists(path):
                continue
            with open(path) as f:
                self.items_list.extend(json.load(f).get(key, []))
        if not self.items_list:
            raise FileNotFoundError(
                f"no Breaking manifests with key {key!r} under {config_dir}")
        self._cache = None
        if cache:
            self._cache = [self._build(i) for i in range(len(self))]

    def __len__(self):
        return len(self.items_list)

    def _sample(self, item, rng):
        if isinstance(item, list):
            parts = [read_mesh(os.path.join(self.data_dir, m)).sample_uniform(
                self.samples_per_mesh, rng=rng) for m in item]
            return np.concatenate(parts, 0)
        mesh = read_mesh(os.path.join(self.data_dir, item))
        return mesh.sample_uniform(self.samples_per_mesh, rng=rng)

    def _build(self, index):
        rng = np.random.default_rng((self.seed, index))
        item0, item1 = self.items_list[index][0], self.items_list[index][1]
        points1 = fps_np(self._sample(item0, rng), 1024, rng=rng)
        points2 = fps_np(self._sample(item1, rng), 1024, rng=rng)
        if points1 is None or points2 is None:
            raise ValueError(
                "breaking-bad piece sampled fewer than 1024 points — "
                "mesh too small for the 1024-point contract")
        fpcb, rpcb, fpc_idx, rpc_idx = get_boundary_np(points1, points2)
        return (points2.astype(np.float32), points1.astype(np.float32),
                fpcb, rpcb, fpc_idx, rpc_idx)

    def __getitem__(self, index):
        out = (self._cache[index] if self._cache is not None
               else self._build(index))
        if self.mode == "test":
            return out + (self.items_list[index],)
        return out
