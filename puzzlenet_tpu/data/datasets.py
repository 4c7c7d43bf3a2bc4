"""Dataset classes (host-side generation, deterministic per (seed, index)).

Capability parity with /root/reference/dataset.py:

* ``SlicedCloudDataset``   = CADDataset (dataset.py:1103-1367): whole clouds
  sliced per draw, rejection-resampled, FPS'd to 1024/side, boundary-labeled;
  ``split_twice`` reproduces the 3-way second-cut/recombination scheme
  (dataset.py:1203-1354).
* ``MovedDataset``         = MovedCADDataset2 (dataset.py:88-105): applies a
  random mag-0.8 twist to the "up" piece, emits the 8-tuple batch contract
  (SURVEY.md §2.2).
* ``BuildingDataset``      = BuildingDataset (dataset.py:1370-1429):
  precomputed f/r 1024-point pairs + on-the-fly boundary.
* ``PrecomputedPairDataset`` = bs_dataset / snp_dataset (dataset.py:124-205):
  precomputed up/down/igt/mup npys.

Determinism: the reference draws from global RNG state inside DataLoader
workers (unreproducible); here every draw derives from
``np.random.default_rng((seed, epoch, index))`` so any item can be replayed.
"""

import os

import threading

import numpy as np

from .augment import fps_np, random_se3_np
from .boundary import get_boundary_np
from .slicers import plane_split, sample_cut_surface

NPOINT = 1024
BOUNDARY_K = 128


def _np_chamfer_mean(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(0).mean() + d.min(1).mean()


class SlicedCloudDataset:
    """Slice-on-draw dataset over an object array of whole clouds."""

    def __init__(self, clouds, mode="train", split_rate=0.9, slicer=None,
                 split_twice=False, seed=0, max_retries=64,
                 return_cut=False, npoint=NPOINT, boundary_k=BOUNDARY_K):
        """``clouds``: object array of [n_i, 3] float clouds (train split);
        for mode='test' pass the test-split array directly.

        ``max_retries`` bounds the rejection loop (the reference's is
        unbounded, dataset.py:1175-1179); after that the cut falls back to a
        centered plane which always bisects.
        ``return_cut`` appends the cut parameters draw (dataset4val2.py:38-109
        'need' behavior: expose the cutting surface for evaluation).
        """
        self.slicer = slicer or plane_split
        self.npoint = npoint
        self.boundary_k = boundary_k
        self.split_twice = split_twice
        self.seed = seed
        self.epoch = 0
        self.max_retries = max_retries
        self.return_cut = return_cut
        # per-thread cut stash: Loader worker threads share this dataset
        # object, and a plain attribute would let one worker's cut draw be
        # returned as another worker's cut surface
        self._cut_tls = threading.local()
        n = len(clouds)
        split = int(n * split_rate)
        if mode == "train":
            self.clouds = clouds[:split]
        elif mode == "val":
            self.clouds = clouds[split:]
        else:  # test: caller passes the dedicated test array
            self.clouds = clouds

    def __len__(self):
        return len(self.clouds)

    def __getstate__(self):
        # threading.local is unpicklable; the process Loader ships the
        # dataset to spawn workers by pickle, and each worker process gets
        # its own copy, so a fresh stash there is correct
        state = self.__dict__.copy()
        state["_cut_tls"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._cut_tls = threading.local()

    def set_epoch(self, epoch):
        self.epoch = epoch

    def last_cut(self):
        """The cut-parameter dict of the most recent __getitem__ on THIS
        thread (requires return_cut=True; None on split_twice paths that
        never drew a primary cut). Single-threaded eval tooling only —
        the analytic primitive parameters behind the sampled cut surface
        the item tuple carries (tools/ambiguity_probe.py consumes the
        axis; dataset4val2.py's need=True returns the o3d primitive the
        same way)."""
        return getattr(self._cut_tls, "last", None)

    def _rng(self, index):
        return np.random.default_rng((self.seed, self.epoch, index))

    def _cut_until_big_enough(self, pc, rng):
        """Re-slice until both sides have >= npoint points (bounded).
        Stashes the cut parameters in the per-thread cut stash when
        return_cut is on (dataset4val2's need=True contract)."""
        for _ in range(self.max_retries):
            res = self.slicer(pc, rng=rng, need=self.return_cut)
            up, down = res[0], res[1]
            if len(up) >= self.npoint and len(down) >= self.npoint:
                self._cut_tls.last = res[2] if self.return_cut else None
                return up, down
        # guaranteed fallback: plane through the centroid along the widest
        # axis splits any cloud with >= 2*npoint points into two big halves
        axis = int(np.argmax(pc.max(0) - pc.min(0)))
        med = np.median(pc[:, axis])
        normal = np.eye(3)[axis]
        self._cut_tls.last = {"type": "plane", "normal": normal,
                              "z": -float(med)} if self.return_cut else None
        up = pc[pc[:, axis] >= med]
        down = pc[pc[:, axis] < med]
        return up, down

    def _fps(self, pts, rng, what):
        out = fps_np(pts, self.npoint, rng=rng)
        if out is None:
            # fps_np returns None below npoint inputs; surface the real
            # cause instead of a distant NoneType AttributeError (the
            # median-plane fallback cannot bisect duplicate-heavy or
            # sub-2*npoint clouds)
            raise ValueError(
                f"{what}: piece has {len(pts)} < npoint={self.npoint} "
                "points — cloud too small/degenerate for this npoint")
        return out

    def _finalize(self, up, down, rng):
        up = self._fps(up, rng, "up piece")
        down = self._fps(down, rng, "down piece")
        fpcb, rpcb, fpc_idx, rpc_idx = get_boundary_np(down, up, self.boundary_k)
        return (up.astype(np.float32), down.astype(np.float32), fpcb, rpcb,
                fpc_idx, rpc_idx)

    def _getitem_once(self, pc, rng):
        up, down = self._cut_until_big_enough(pc, rng)
        return self._finalize(up, down, rng)

    def _getitem_twice(self, pc, rng):
        """3-way second-cut scheme (dataset.py:1203-1354).

        seed3 == 0: single cut. seed3 == 1/2: re-cut the up/down half; then
        se == 0 merges one sub-piece with the untouched half, se == 1 pairs a
        sub-piece against the untouched half (rejected if the boundaries are
        farther than 0.015 mean-chamfer), se == 2 pairs the two sub-pieces.
        (The reference's se == 2 'recombine extra' branch is dead code — it
        overwrites its recombination with the plain sub-pieces at
        dataset.py:1283-1285 — so the effective behavior implemented here is
        returning the two sub-pieces.)
        """
        seed3 = int(rng.integers(0, 3))
        up, down = self.slicer(pc, rng=rng)
        if seed3 == 1 and len(up) < 3000:
            seed3 = 2
        if seed3 == 2 and len(down) < 3000:
            seed3 = 1
        if seed3 == 0:
            return self._getitem_once(pc, rng)

        target, other = (up, down) if seed3 == 1 else (down, up)
        sub1 = sub2 = None
        for _ in range(7):
            sub1, sub2 = self.slicer(target, rng=rng)
            if len(sub1) >= self.npoint and len(sub2) >= self.npoint:
                break
        else:
            return self._getitem_once(pc, rng)

        se = int(rng.integers(0, 3))
        choice = int(rng.integers(0, 2))
        picked, rest = (sub1, sub2) if choice == 0 else (sub2, sub1)

        if se == 0 or len(other) < self.npoint:
            moved = self._fps(picked, rng, "sub-piece")
            fixed = self._fps(np.vstack([rest, other]), rng, "merged rest")
        elif se == 1:
            moved = self._fps(picked, rng, "sub-piece")
            fixed = self._fps(other, rng, "other half")
            fpcb, rpcb, fpc_idx, rpc_idx = get_boundary_np(fixed, moved,
                                                           self.boundary_k)
            if _np_chamfer_mean(fpcb, rpcb) > 0.015:
                return self._getitem_once(pc, rng)
            return (moved.astype(np.float32), fixed.astype(np.float32),
                    fpcb, rpcb, fpc_idx, rpc_idx)
        else:
            moved = self._fps(sub1, rng, "sub-piece 1")
            fixed = self._fps(sub2, rng, "sub-piece 2")

        fpcb, rpcb, fpc_idx, rpc_idx = get_boundary_np(fixed, moved,
                                                       self.boundary_k)
        return (moved.astype(np.float32), fixed.astype(np.float32), fpcb,
                rpcb, fpc_idx, rpc_idx)

    def __getitem__(self, index):
        rng = self._rng(index)
        pc = np.asarray(self.clouds[index], np.float32)
        # reset THIS thread's cut stash: split_twice se-paths never draw a
        # primary cut, and a stale one from a previous item must not leak
        # into their cut-surface output
        self._cut_tls.last = None
        if self.split_twice:
            item = self._getitem_twice(pc, rng)
        else:
            item = self._getitem_once(pc, rng)
        if self.return_cut:
            # dataset4val2's need=True returns the cutting primitive
            # (dataset4val2.py:38-109); here: points sampled on the
            # analytic cut surface (boundary union if unavailable, e.g.
            # split_twice paths)
            last = getattr(self._cut_tls, "last", None)
            if last is not None:
                cut = sample_cut_surface(last, n=512, rng=rng)
            else:
                cut = np.vstack([item[2], item[3]])
            return item + (cut,)
        return item


class MovedDataset:
    """Rigid-augmentation wrapper emitting the 8-tuple batch contract.

    (fpc, mrpc, igt, rpc, fpcb, rpcb, fpc_idx, rpc_idx) — SURVEY.md §2.2.
    """

    def __init__(self, dataset, mag=0.8, mag_randomly=False, seed=1,
                 need=False):
        self.dataset = dataset
        self.mag = mag
        self.mag_randomly = mag_randomly
        self.seed = seed
        self.epoch = 0
        self.need = need

    def __len__(self):
        return len(self.dataset)

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getitem__(self, index):
        item = self.dataset[index]
        up, down, downb, upb, fpc_idx, rpc_idx = item[:6]
        rng = np.random.default_rng((self.seed, self.epoch, index, 7))
        mup, igt, _, _ = random_se3_np(rng, up, self.mag, self.mag_randomly)
        out = (down, mup, igt, up, downb, upb,
               fpc_idx.astype(np.float32), rpc_idx.astype(np.float32))
        if self.need:
            return out + (item[-1],)
        return out


class MovedPairDataset:
    """4-tuple rigid-augmentation wrapper (MovedCADDataset,
    dataset.py:108-121): (down, mup, igt, up) — the boundary-less legacy
    contract used by get_cad_datasets' 'cad'/'cadr'/'cadpro*' categories."""

    def __init__(self, dataset, mag=0.8, mag_randomly=False, seed=1):
        self.dataset = dataset
        self.mag = mag
        self.mag_randomly = mag_randomly
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return len(self.dataset)

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getitem__(self, index):
        item = self.dataset[index]
        up, down = item[0], item[1]
        rng = np.random.default_rng((self.seed, self.epoch, index, 7))
        mup, igt, _, _ = random_se3_np(rng, np.asarray(up, np.float32),
                                       self.mag, self.mag_randomly)
        return np.asarray(down, np.float32), mup, igt, np.asarray(
            up, np.float32)


class PrecutPairDataset:
    """Precomputed up/down piece npys (cad_dataset, dataset.py:211-270
    family: `<base>_up_train.npy` / `<base>_down_train.npy`)."""

    def __init__(self, path, base="np_oa", train=True, split=0.8):
        suffix = "_train.npy"
        self.up = np.load(os.path.join(path, f"{base}_up{suffix}"),
                          allow_pickle=True)
        self.down = np.load(os.path.join(path, f"{base}_down{suffix}"),
                            allow_pickle=True)
        cut = int(len(self.up) * split)
        sl = slice(None, cut) if train else slice(cut, None)
        self.up, self.down = self.up[sl], self.down[sl]

    def __len__(self):
        return len(self.up)

    def __getitem__(self, index):
        return (np.asarray(self.up[index], np.float32),
                np.asarray(self.down[index], np.float32))


class BuildingDataset:
    """Precomputed facade/roof 1024-point pairs (dataset.py:1370-1429)."""

    def __init__(self, path, mode="train", split=0.8,
                 file="buildings_f_train1024.npy"):
        if mode == "test":
            file = file.replace("_train", "_test")
        self.fpcs = np.load(os.path.join(path, file))
        self.rpcs = np.load(os.path.join(path, file.replace("_f_", "_r_")))
        if mode in ("train", "val"):
            cut = int(len(self.fpcs) * split)
            sl = slice(None, cut) if mode == "train" else slice(cut, None)
            self.fpcs, self.rpcs = self.fpcs[sl], self.rpcs[sl]

    def __len__(self):
        return len(self.fpcs)

    def __getitem__(self, index):
        fpc = np.asarray(self.fpcs[index], np.float32)
        rpc = np.asarray(self.rpcs[index], np.float32)
        fpcb, rpcb, fpc_idx, rpc_idx = get_boundary_np(fpc, rpc, BOUNDARY_K)
        # (up=rpc, down=fpc, downb, upb, masks) — dataset.py:1422-1429
        return rpc, fpc, fpcb, rpcb, fpc_idx, rpc_idx


class PrecomputedPairDataset:
    """bs_/snp_-style datasets: precomputed up/down/igt/mup npys
    (dataset.py:124-205). Items: (up, down, igt, mup, index)."""

    def __init__(self, path, prefix, train=True, split=0.75):
        self.up = np.load(os.path.join(path, f"{prefix}_up.npy"))
        self.down = np.load(os.path.join(path, f"{prefix}_down.npy"))
        self.igt = np.load(os.path.join(path, f"{prefix}_igt.npy"))
        self.mup = np.load(os.path.join(path, f"{prefix}_mup.npy"))
        cut = int(len(self.up) * split)
        self.offset = 0 if train else cut
        sl = slice(None, cut) if train else slice(cut, None)
        self.up, self.down = self.up[sl], self.down[sl]
        self.igt, self.mup = self.igt[sl], self.mup[sl]

    def __len__(self):
        return len(self.up)

    def __getitem__(self, index):
        return (np.asarray(self.up[index], np.float32),
                np.asarray(self.down[index], np.float32),
                np.asarray(self.igt[index], np.float32),
                np.asarray(self.mup[index], np.float32),
                index + self.offset)
