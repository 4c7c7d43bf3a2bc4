"""Multi-fragment problem generation for assembly evaluation.

The reference describes N-piece reassembly (README.md:14) but ships no
fragmenter; this reproduces the pairwise data path's semantics (random
plane cuts with a both-sides-large-enough rejection loop, dataset.py
1172-1179) applied recursively until K fragments exist, then FPS-normalizes
each fragment exactly like the dataset pipeline (dataset.py:1147-1163).
"""

import numpy as np

from ..data.augment import fps_np, random_se3_np
from ..data.slicers import (cone_split, cylinder_split, plane_split,
                            sphere_split)

_SPLITTERS = {"plane": plane_split, "sphere": sphere_split,
              "cylinder": cylinder_split, "cone": cone_split}


def fragment_cloud(cloud, k, npoint=1024, rng=None, max_tries=64,
                   cut="plane"):
    """Cut a whole [M, 3] cloud into ``k`` fragments of ``npoint`` points.

    Recursive splitting: repeatedly split the largest fragment with the
    ``cut`` primitive ('plane'/'sphere'/'cylinder'/'cone' — the same
    slicers the data path uses, data/slicers.py), rejection-looping until
    both sides keep >= npoint points (falling back to a median cut along
    the widest axis when the random cuts keep failing), then FPS each
    fragment to npoint. Matching ``cut`` to the checkpoint's training
    category makes curved-fracture reassembly an in-distribution task.
    """
    rng = np.random.default_rng() if rng is None else rng
    split = _SPLITTERS[cut]
    parts = [np.asarray(cloud, np.float32)]
    while len(parts) < k:
        # try fragments largest-first; accept the first cut that leaves
        # both sides >= npoint
        parts.sort(key=len, reverse=True)
        for pos, cand in enumerate(parts):
            a = b = None
            for _ in range(max_tries):
                a, b = split(cand, rng=rng)
                if len(a) >= npoint and len(b) >= npoint:
                    break
            else:
                continue
            parts.pop(pos)
            break
        else:
            # no fragment admits a clean cut: median-cut the largest and
            # let the undersized side be padded below
            cand = parts.pop(0)
            axis = int(np.argmax(cand.max(0) - cand.min(0)))
            med = np.median(cand[:, axis])
            a, b = cand[cand[:, axis] >= med], cand[cand[:, axis] < med]
            if len(a) == 0 or len(b) == 0:
                # degenerate coordinates (e.g. duplicated points) can put
                # everything on one side of the median — split by index
                # instead so neither side is empty (empty sides crash the
                # resample padding below)
                if len(cand) < 2:
                    a = b = cand        # duplicate rather than crash
                else:
                    half = len(cand) // 2
                    a, b = cand[:half], cand[half:]
        parts += [a, b]

    out = []
    for p in parts:
        if len(p) < npoint:
            # pad by resampling with replacement: duplicated points leave
            # the geometry (and any rigid fit to it) unchanged
            extra = rng.integers(0, len(p), npoint - len(p))
            out.append(np.concatenate([p, p[extra]]).astype(np.float32))
        else:
            out.append(fps_np(p, npoint, rng=rng))
    return out


def scatter_pieces(pieces, rng=None, mag=0.8):
    """Rigidly perturb every fragment but the first (the anchor) with a
    random mag-``mag`` twist — the same distribution RandomTransformSE3
    applies to training pairs (se_math/transforms.py:151-197). Returns
    (scattered pieces, [4, 4] ground-truth motions per piece; identity for
    the anchor)."""
    rng = np.random.default_rng() if rng is None else rng
    scattered, gts = [pieces[0]], [np.eye(4, dtype=np.float32)]
    for piece in pieces[1:]:
        moved, igt, _, _ = random_se3_np(rng, piece, mag=mag)
        scattered.append(moved)
        gts.append(np.asarray(igt, np.float32))
    return scattered, gts
