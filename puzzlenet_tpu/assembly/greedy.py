"""Iterative greedy multi-piece reassembly.

The reference README (README.md:14) and paper Fig. 1 describe multi-piece
reassembly by iterating the pairwise network greedily — **no code for this
exists in the reference repo** (SURVEY.md §0); this module implements the
described behavior, TPU-style:

per round, ALL ordered candidate pairs (fixed_i, moved_j) are scored in ONE
batched jitted forward (the candidate axis is just the batch axis), the
best-fitting pair is merged (moved piece transformed by exp(twist),
concatenated, FPS'd back to the working resolution), and the loop repeats
until a single piece remains.

Pair score = symmetric chamfer between the two predicted top-128 boundary
sets after applying the predicted transform (the quantity the reference's
test_step evaluates per pair, model5_b.py:1349-1360) — lower is better.
"""

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import chamfer_distances, farthest_point_sample, index_points
from ..semath import se3


class AssemblyResult(NamedTuple):
    assembled: np.ndarray        # [num_points, 3] final merged cloud
    merge_order: list            # [(fixed_idx, moved_idx), ...] per round
    transforms: list             # [4, 4] applied to the moved piece per round
    scores: list                 # winning pair score per round


def _pair_forward(model, variables, fpc, mrpc):
    """Batched pairwise net + boundary extraction + fit score.

    fpc, mrpc: [P, N, 3] candidate pairs. Returns (twist [P,6], score [P]).
    """
    out = model.apply(variables, fpc, mrpc, train=False)
    mat = se3.exp(out.twist)

    lf = jnp.swapaxes(out.fpcb_logits, 1, 2)
    lm = jnp.swapaxes(out.mrpcb_logits, 1, 2)
    _, top_f = lax.top_k(lf[..., 1] - lf[..., 0], 128)
    _, top_m = lax.top_k(lm[..., 1] - lm[..., 0], 128)
    bnd_f = index_points(fpc, top_f)                       # [P, 128, 3]
    bnd_m = se3.transform_points(mat, index_points(mrpc, top_m))
    d1, d2 = chamfer_distances(bnd_f, bnd_m)
    score = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)  # [P]
    return out.twist, score


import functools

_pair_forward_jit = functools.partial(
    jax.jit, static_argnames=("model",))(_pair_forward)


def score_pairs(model, variables, pieces):
    """Score all ordered pairs of a piece stack [K, N, 3] in one forward.

    Returns (pairs list [(i, j)], twists [P, 6], scores [P]).
    """
    k = len(pieces)
    pairs = [(i, j) for i, j in itertools.product(range(k), range(k))
             if i != j]
    fpc = jnp.stack([pieces[i] for i, _ in pairs])
    mrpc = jnp.stack([pieces[j] for _, j in pairs])
    twists, scores = _pair_forward_jit(model, variables, fpc, mrpc)
    return pairs, twists, scores


def greedy_assemble(model, variables, pieces, num_points=1024):
    """Assemble K fragments ([K, N, 3] array or list) into one cloud.

    Per round the moved piece of the best pair is rigidly mapped onto the
    fixed piece's frame, merged, and FPS'd back to ``num_points`` so every
    round keeps static shapes (one jit compilation serves all rounds with
    the same K - r pieces).
    """
    pieces = [jnp.asarray(p, jnp.float32) for p in pieces]
    merge_order, transforms, win_scores = [], [], []

    while len(pieces) > 1:
        pairs, twists, scores = score_pairs(model, variables, pieces)
        best = int(jnp.argmin(scores))
        i, j = pairs[best]
        mat = se3.exp(twists[best])
        moved = se3.transform_points(mat, pieces[j])
        merged = jnp.concatenate([pieces[i], moved], axis=0)
        idx = farthest_point_sample(merged[None], num_points)[0]
        merged = merged[idx]

        merge_order.append((i, j))
        transforms.append(np.asarray(mat))
        win_scores.append(float(scores[best]))
        pieces = [p for t, p in enumerate(pieces) if t not in (i, j)]
        pieces.append(merged)

    return AssemblyResult(np.asarray(pieces[0]), merge_order, transforms,
                          win_scores)
