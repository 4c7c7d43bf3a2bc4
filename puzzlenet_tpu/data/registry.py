"""Dataset category registry.

Capability parity with get_dataset / get_test_dataset (dataset.py:1434-1558,
777-787): the same category names map to the same (shape family, slicer)
combinations, each wrapped in the mag-0.8 rigid-augmentation MovedDataset.

Data resolution: real npy payloads are looked up under
``$PUZZLENET_DATA_DIR`` (default ./data). The reference's bundled npys are
git-LFS pointer stubs (SURVEY.md §0), so when a file is missing or is a
stub, the registry transparently substitutes synthetic clouds of the
matching family (synthetic.py) — same object-array contract, pipeline
identical from the slicer down.
"""

import os
import warnings

import numpy as np

from .datasets import BuildingDataset, MovedDataset, SlicedCloudDataset
from .slicers import cone_split, cylinder_split, plane_split, sphere_split
from .synthetic import synthetic_clouds

# category -> (npy base name, synthetic family, slicer)
_NAMES = {
    "cadr": ("np_out2_all_11000_train_2.npy", "airplane", plane_split),
    "cad_cyl": ("np_out2_all_11000_train_2.npy", "airplane", cylinder_split),
    "cad_cone": ("np_out2_all_11000_train_2.npy", "airplane", cone_split),
    "cad_sphere": ("np_out2_all_11000_train_2.npy", "airplane", sphere_split),
    "bedr": ("np_ob_all_10000_train_2.npy", "bed", plane_split),
    "bed_cyl": ("np_ob_all_10000_train_2.npy", "bed", cylinder_split),
    "bed_cone": ("np_ob_all_10000_train_2.npy", "bed", cone_split),
    "bed_sphere": ("np_ob_all_10000_train_2.npy", "bed", sphere_split),
    "vaser": ("np_vase_all_11000_train_2.npy", "vase", plane_split),
    "vase_cyl": ("np_vase_all_11000_train_2.npy", "vase", cylinder_split),
    "vase_cone": ("np_vase_all_11000_train_2.npy", "vase", cone_split),
    "vase_sphere": ("np_vase_all_11000_train_2.npy", "vase", sphere_split),
}


def data_dir():
    return os.environ.get("PUZZLENET_DATA_DIR", "data")


def _building_payloads_present():
    p = os.path.join(data_dir(), "buildings_f_train1024.npy")
    return os.path.exists(p) and not _is_lfs_stub(p)


def supports_device_pipeline(category):
    """True for slicer categories that can train through the on-device
    data pipeline (whole-cloud stack + in-jit cut/FPS/boundary/twist).

    'fr' qualifies only while its real DublinCity payloads are absent:
    the real category is PRE-SPLIT facade/roof pairs (no slicing,
    dataset.py:1370-1429, host path only), but its synthetic substitute
    is a plane-sliced blob family (get_dataset) — exactly the pipeline's
    input format."""
    if category == "fr":
        return not _building_payloads_present()
    return category in _NAMES


def supports_device_pairs(category):
    """True for fragment-pair categories whose per-item GEOMETRY is
    precomputed (host, once) but whose per-draw augmentation can run on
    device (trainer.fit_device_pairs + device_pipeline.make_pair_batch).
    Disjoint from supports_device_pipeline: these categories have no
    whole-cloud stack to slice."""
    return category == "bbv"


def category_pairs(category):
    """Stack a precomputed-pair category's canonical training items into
    device-ready arrays (fpc, rpc, fpcb, rpcb, fpc_idx, rpc_idx), each
    leading dim = n_items — the input of trainer.fit_device_pairs.

    Item layout follows the cache tuple of data/breaking.py::_build
    (points2, points1, fpcb, rpcb, fpc_idx, rpc_idx) under the
    MovedDataset unpacking (datasets.py:255-261): points1 is the fixed
    piece (fpc), points2 the moved one (rpc)."""
    if not supports_device_pairs(category):
        raise ValueError(f"no precomputed-pair stack for {category!r}")
    base = get_dataset(category)[0].dataset      # cached BreakingDataset
    items = [base[i] for i in range(len(base))]
    rpc = np.stack([it[0] for it in items]).astype(np.float32)
    fpc = np.stack([it[1] for it in items]).astype(np.float32)
    fpcb = np.stack([it[2] for it in items]).astype(np.float32)
    rpcb = np.stack([it[3] for it in items]).astype(np.float32)
    fpc_idx = np.stack([it[4] for it in items]).astype(np.float32)
    rpc_idx = np.stack([it[5] for it in items]).astype(np.float32)
    return fpc, rpc, fpcb, rpcb, fpc_idx, rpc_idx


def category_cut(category):
    """Cut-primitive name for a category ('plane'/'sphere'/'cylinder'/
    'cone') — the device pipeline's static analogue of the registry's
    slicer assignment. Unknown/pair categories default to 'plane'."""
    if category in _NAMES:
        return _NAMES[category][2].__name__.replace("_split", "")
    return "plane"


def category_clouds(category, synth_count=64, split="train"):
    """The whole-cloud stack a category slices from, as one [n, M, 3] f32
    array (oversized clouds trimmed to the min cloud size by a seeded
    random subset so the stack is rectangular; masked FPS to npoint then
    happens on device) — the input format of
    data/device_pipeline.make_batch."""
    if category == "fr" and supports_device_pipeline("fr"):
        # synthetic substitute; _train in the name so the test split
        # resolves to a DIFFERENT payload (buildings_test.npy) if real
        # whole-cloud files are ever supplied — a split-invariant name
        # would silently evaluate on the training clouds
        warnings.warn(
            "'fr' is training on its plane-sliced SYNTHETIC substitute "
            "(real DublinCity payloads absent). Checkpoints from this run "
            "target a DIFFERENT task than the real pre-split facade/roof "
            "category and must be retrained once real payloads appear.",
            stacklevel=2)
        name, family = "buildings_train.npy", "blob"
    elif category not in _NAMES:
        raise ValueError(f"no whole-cloud stack for category {category!r}")
    else:
        name, family, _ = _NAMES[category]
    if split == "test":
        clouds = _load_clouds(name.replace("_train", "_test"), family,
                              max(synth_count // 4, 8), seed=10_000)
    else:
        clouds = _load_clouds(name, family, synth_count, seed=0)
    arrs = [np.asarray(c, np.float32) for c in clouds]
    m = min(a.shape[0] for a in arrs)
    rng = np.random.default_rng(1234)
    trimmed = [a[rng.permutation(a.shape[0])[:m]] if a.shape[0] > m else a
               for a in arrs]
    return np.stack(trimmed)


def _is_lfs_stub(path):
    try:
        if os.path.getsize(path) < 512:
            with open(path, "rb") as f:
                return f.read(24).startswith(b"version https://git-lfs")
    except OSError:
        return False
    return False


def _load_clouds(name, family, count, seed):
    path = os.path.join(data_dir(), name)
    if os.path.exists(path) and not _is_lfs_stub(path):
        return np.load(path, allow_pickle=True)
    return synthetic_clouds(family=family, count=count, seed=seed)


def _sliced_triple(name, family, slicer, random_slice, synth_count=64,
                   num_points=1024):
    train_clouds = _load_clouds(name, family, synth_count, seed=0)
    test_clouds = _load_clouds(name.replace("_train", "_test"), family,
                               max(synth_count // 4, 8), seed=10_000)
    mk = lambda clouds, mode: SlicedCloudDataset(  # noqa: E731
        clouds, mode=mode, slicer=slicer, split_twice=random_slice,
        npoint=num_points)
    return (mk(train_clouds, "train"), mk(train_clouds, "val"),
            mk(test_clouds, "test"))


def get_dataset(category, random=False, random_slice=False, synth_count=64,
                num_points=1024):
    """(train, val, test) MovedDataset triple for a category name.

    Mirrors dataset.py:1434-1558: 'fr' -> building pairs; 'cadr'/'bedr'/
    'vaser' (+ _cyl/_cone/_sphere variants) -> sliced clouds of the matching
    family; 'bbv' -> Breaking-Bad-style fragments. ``random`` toggles random
    twist magnitude; ``random_slice`` enables split_twice.
    """
    if category == "fr":
        try:
            tr = BuildingDataset(data_dir(), "train")
            va = BuildingDataset(data_dir(), "val")
            te = BuildingDataset(data_dir(), "test")
        except (FileNotFoundError, ValueError):
            # synthetic substitute: plane-split blob clouds. ValueError:
            # a git-LFS pointer stub reaches np.load and raises it — the
            # same missing-payload situation as an absent file
            # _train in the name: _sliced_triple derives the test payload
            # via _train -> _test, a split-invariant name would leak the
            # training clouds into the test split
            warnings.warn(
                "'fr' is using its plane-sliced SYNTHETIC substitute "
                "(real DublinCity payloads absent). Checkpoints from this "
                "data target a DIFFERENT task than the real pre-split "
                "facade/roof category and must be retrained once real "
                "payloads appear.", stacklevel=2)
            tr, va, te = _sliced_triple("buildings_train.npy", "blob",
                                        plane_split, False, synth_count,
                                        num_points=num_points)
    elif category == "bbv":
        from .breaking import BreakingDataset

        # manifests live under <data_dir>/config when PUZZLENET_DATA_DIR
        # points somewhere (tools/make_breaking.py's layout), else the
        # reference's ./config default (dataset.py:1008-1099). cache=True:
        # per-item mesh sampling + numpy FPS is ~100 ms on a 1-CPU host
        # and the tiny manifests refit in memory — precompute once so the
        # Loader can feed a TPU step loop.
        cfg_dir = os.path.join(data_dir(), "config")
        if not os.path.isdir(cfg_dir):
            cfg_dir = "config"
        kw = dict(config_dir=cfg_dir, data_dir=data_dir(), cache=True)
        tr = BreakingDataset(mode="train", **kw)
        # va and te share one underlying dataset: identical mode/seed/cache,
        # so a second instance would only duplicate the ~100 ms/item
        # mesh-sampling+FPS init cost and the cached arrays. The MovedDataset
        # wrappers below (different seeds) keep the splits' augmentation
        # distinct.
        va = BreakingDataset(mode="test", **kw)
        te = va
    elif category in _NAMES:
        name, family, slicer = _NAMES[category]
        tr, va, te = _sliced_triple(name, family, slicer, random_slice,
                                    synth_count, num_points=num_points)
    else:
        raise ValueError(f"Unknown dataset category: {category!r}")

    return (MovedDataset(tr, mag_randomly=random, seed=1),
            MovedDataset(va, mag_randomly=random, seed=2),
            MovedDataset(te, mag_randomly=random, seed=3))


def get_test_dataset(category, random=False, random_slice=False):
    """Standalone test split (dataset.py:777-787 contract)."""
    return get_dataset(category, random=random, random_slice=random_slice)[2]


class _PrecutSynthAdapter:
    """Slice synthetic clouds lazily into fixed (up, down) pairs — the
    synthetic stand-in for the reference's precomputed np_oa_*_up/down
    piece npys. Each index is cut once on first access and cached (the
    'precut' contract: the same index always returns the same pair), so
    constructing a large-count registry is O(1) instead of paying
    count x (64-try rejection slice + 2 host FPS) up front."""

    def __init__(self, family, count, seed, slicer=plane_split):
        self.clouds = synthetic_clouds(family=family, count=count, seed=seed)
        self.seed = seed
        self.slicer = slicer
        self._cache = {}

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, index):
        if index not in self._cache:
            from .augment import fps_np
            rng = np.random.default_rng((self.seed, index))
            pc = np.asarray(self.clouds[index], np.float32)
            for _ in range(64):
                up, down = self.slicer(pc, rng=rng)
                if len(up) >= 1024 and len(down) >= 1024:
                    break
            self._cache[index] = (fps_np(up, 1024, rng=rng),
                                  fps_np(down, 1024, rng=rng))
        return self._cache[index]


def get_cad_datasets(category="cad", random=False, random_slice=False,
                     synth_count=16):
    """Legacy 2-tuple (train, test) registry (dataset.py:611-703).

    'cad'/'cadr'/'cadpro'/'cadpro_cone'/'cadpro_sphere' -> boundary-less
    4-tuple pairs (MovedPairDataset); 'cadrr'/'cadrr2' -> the 8-tuple
    slice-on-draw contract; 'bs'/'snp' -> precomputed up/down/igt/mup npys.
    Falls back to synthetic stand-ins when npy payloads are absent —
    EXCEPT 'bs'/'snp', whose precomputed-pair format has no synthetic
    generator; those raise FileNotFoundError without their payloads.
    """
    from .datasets import (MovedPairDataset, PrecomputedPairDataset,
                           PrecutPairDataset, SlicedCloudDataset)

    slicer_map = {"cadpro": cylinder_split, "cadpro_cone": cone_split,
                  "cadpro_sphere": sphere_split}

    if category in ("cad", "cadr") or category in slicer_map:
        base = {"cad": "np_oa", "cadr": "np_oa",
                "cadpro": "np_oa_cylinder", "cadpro_cone": "np_oa_cone",
                "cadpro_sphere": "np_oa_sphere"}[category]
        slicer = slicer_map.get(category, plane_split)
        try:
            tr = PrecutPairDataset(data_dir(), base, train=True)
            te = PrecutPairDataset(data_dir(), base, train=False)
        except (FileNotFoundError, ValueError):
            tr = _PrecutSynthAdapter("airplane", synth_count, 0, slicer)
            te = _PrecutSynthAdapter("airplane", max(synth_count // 4, 4),
                                     999, slicer)
        rand = True if category == "cad" else random
        return (MovedPairDataset(tr, mag_randomly=rand, seed=1),
                MovedPairDataset(te, mag_randomly=rand, seed=2))

    if category in ("cadrr", "cadrr2"):
        clouds = _load_clouds("np_out2_all_11000_train_2.npy", "airplane",
                              synth_count, seed=0)
        mk = lambda mode: SlicedCloudDataset(  # noqa: E731
            clouds, mode=mode, split_rate=0.8,
            split_twice=(category == "cadrr2" and random_slice))
        from .datasets import MovedDataset
        return (MovedDataset(mk("train"), mag_randomly=random, seed=1),
                MovedDataset(mk("val"), mag_randomly=random, seed=2))

    if category in ("bs", "snp"):
        prefix = {"bs": "bs", "snp": "spn_airplane"}[category]
        sub = {"bs": "resso", "snp": "shapenet_part"}[category]
        path = os.path.join(data_dir(), sub)
        tr = PrecomputedPairDataset(path, prefix, train=True)
        te = PrecomputedPairDataset(path, prefix, train=False)
        return tr, te

    raise ValueError(f"Unknown cad dataset category: {category!r}")
