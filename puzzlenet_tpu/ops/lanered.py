"""Two-level (tournament) lane arg-reductions for Pallas TPU kernels.

A plain ``jnp.argmin(d, axis=1)`` over a wide [rows, n] tile lowers to a
cross-lane reduction over all n lanes with index tracking — log2(n) shuffle
stages over every vreg of the tile. Inside the iterative kernels (FPS's
npoint-step max chain, the fused set-abstraction's k-step min chain) that
reduction runs every iteration and dominates kernel time (~60% measured,
PERFORMANCE.md headroom #2).

The tournament form splits the lane axis into G static chunks of L=n/G
lanes, takes the elementwise min/max across chunks while tracking which
chunk won (pure VPU elementwise ops, no shuffles), and finishes with ONE
narrow cross-lane arg-reduction over L lanes — G× fewer vregs in the
shuffle stages. The winning chunk id is then read out at the winning lane
with a one-hot sum.

Tie-breaking: the fused argmin/argmax picks the lowest *global* index;
the tournament picks the lowest (lane, chunk) pair — i.e. on an exact
cross-chunk value tie a different (equal-valued) element can win. For the
kernels here that is benign: ties on float point-cloud distances occur only
for duplicated points, whose coordinates/features are identical, so the
selected *values* are unchanged (see ops/fps_pallas.py, ops/sg_pallas.py).
"""

import jax.numpy as jnp
from jax import lax


def _tournament(v, largest, g_max=8):
    rows, n = v.shape
    # chunk so the final reduction is one 128-lane tile; fall back to the
    # plain reduction when the lane axis doesn't split cleanly
    g = min(g_max, n // 128)
    if g < 2 or n % g:
        arg = jnp.argmax(v, axis=1) if largest else jnp.argmin(v, axis=1)
        return arg.astype(jnp.int32)[:, None]
    L = n // g
    m = v[:, :L]
    gsel = jnp.zeros((rows, L), jnp.int32)
    for gi in range(1, g):
        chunk = v[:, gi * L:(gi + 1) * L]
        upd = (chunk > m) if largest else (chunk < m)
        m = jnp.where(upd, chunk, m)
        gsel = jnp.where(upd, gi, gsel)
    arg = jnp.argmax(m, axis=1) if largest else jnp.argmin(m, axis=1)
    lidx = arg.astype(jnp.int32)[:, None]                      # [rows, 1]
    lanes = lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    win_g = jnp.sum(jnp.where(lanes == lidx, gsel, 0), axis=1,
                    keepdims=True)                             # [rows, 1]
    return win_g * L + lidx


def tournament_argmin(v, g_max=8):
    """[rows, n] -> [rows, 1] int32 argmin along lanes (tournament)."""
    return _tournament(v, largest=False, g_max=g_max)


def tournament_argmax(v, g_max=8):
    """[rows, n] -> [rows, 1] int32 argmax along lanes (tournament)."""
    return _tournament(v, largest=True, g_max=g_max)


# ---- sorted-column top-k ---------------------------------------------------
#
# The fused set-abstraction kernel needs the SET of each row's k smallest
# distances (neighbor order is irrelevant: the stage ends in a max over
# neighbors, and the backward routes by the indices the forward saved).
# Extracting them with k tournament-argmin rounds pays, per round, the
# cross-chunk min scan AND a full [rows, n] masking pass. This form does the
# cross-chunk work ONCE: bitcast the (non-negative) distances to int32 —
# monotone for f32 >= 0 — pack the chunk id into the low bits, and sort each
# lane's g-chunk column with a fixed sorting network. Extraction then runs on
# the [rows, L] head row only: argmin over lanes, read the packed chunk id at
# the winning lane, and shift that lane's sorted column up by one. Per round
# that is one narrow arg-reduction plus ~g+4 elementwise ops on 1/g of the
# tile, with no full-tile pass at all.
#
# Packing clears low mantissa bits of the distance (see tie_band below):
# distances within that many ulps of each other may swap selection order.
# Like the tournament tie-break (above), this is benign here: kNN membership
# among near-equidistant candidates is arbitrary under ANY implementation
# (the dense top_k breaks exact ties by index), and the band is ~1e-4
# relative, far below the geometric noise of real scans. The packed form is
# strictly MORE deterministic than argmin: ties resolve by (lane, chunk)
# identically on every backend.

_NETWORKS = {
    2: [(0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    # optimal 19-comparator network for 8 inputs (Knuth TAOCP 5.3.4)
    8: [(0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (3, 7),
        (1, 5), (2, 6),
        (1, 4), (3, 6),
        (2, 4), (3, 5),
        (3, 4)],
}

# FLT_MAX: above every packed value (packed values are real squared
# distances with perturbed low bits), and — unlike int32 max, whose bit
# pattern is a NaN — still a valid float for Mosaic's f32-only argmin.
_SENTINEL = 3.4028235e38
SENTINEL = _SENTINEL


def pack_ids(d, ids, n_ids):
    """THE mantissa-packing contract, in one place (interp_pallas and
    chamfer_pallas route selection through this; sorted_topk packs its
    two-level lane+chunk variant inline below).

    Clear the low log2(n_ids) mantissa bits of non-negative finite f32
    ``d``, OR in ``ids`` (int32, same shape, < n_ids), and shift one
    exponent up via an int32 add of 1 << 23 — order-preserving on
    positive-float bit patterns (requires d < ~1.7e38), and REQUIRED:
    the packed bits of a zero distance are a DENORMAL, which the TPU VPU
    flushes to 0.0, silently erasing the id (CPU interpret mode does NOT
    catch this class — validate selection kernels on hardware)."""
    ib = (n_ids - 1).bit_length()
    clear = ~jnp.int32((1 << ib) - 1)
    u = lax.bitcast_convert_type(d, jnp.int32)
    return lax.bitcast_convert_type(((u & clear) | ids)
                                    + jnp.int32(1 << 23), jnp.float32)


def unpack_ids(p, n_ids):
    """Decode the ids packed by :func:`pack_ids` (e.g. after min-reducing
    the packed values)."""
    ib = (n_ids - 1).bit_length()
    return lax.bitcast_convert_type(p, jnp.int32) & ((1 << ib) - 1)


def sorted_topk_supported(n, g_max=8):
    g = min(g_max, n // 128)
    L = n // g if g else 0
    return g in _NETWORKS and n % g == 0 and (L & (L - 1)) == 0


def sorted_topk_tie_band(n, g_max=8):
    """Packed low mantissa bits = the ulp band within which two distinct
    distances may swap selection (chunk bits + lane bits)."""
    assert sorted_topk_supported(n, g_max), \
        f"sorted_topk does not support n={n} (band undefined)"
    g = min(g_max, n // 128)
    L = n // g
    return 1 << ((g - 1).bit_length() + (L - 1).bit_length())


def topk_stream_init(d, g_max=8):
    """Pack identities + column-sort (the one-time half of sorted_topk).

    Returns ``(cols, (g, L, gb))`` — ``cols`` a tuple of g [rows, L] f32
    arrays, each lane's cross-chunk column sorted ascending — ready for
    incremental extraction with :func:`topk_stream_next`. The split API
    exists so the fused set-abstraction kernel can software-pipeline
    extraction of neighbor block r+1 against the MXU compute of block r."""
    rows, n = d.shape
    g = min(g_max, n // 128)
    assert sorted_topk_supported(n, g_max), (n, g_max)
    L = n // g
    gb = (g - 1).bit_length()                 # chunk id bits
    lb = (L - 1).bit_length()                 # lane id bits
    clear = ~jnp.int32((1 << (gb + lb)) - 1)
    lane_bits = lax.broadcasted_iota(jnp.int32, (rows, L), 1) << gb
    u = lax.bitcast_convert_type(d, jnp.int32)
    cols = [lax.bitcast_convert_type(
        ((u[:, gi * L:(gi + 1) * L] & clear) | lane_bits | gi)
        + jnp.int32(1 << 23), jnp.float32)
        for gi in range(g)]
    for a, b in _NETWORKS[g]:
        lo = jnp.minimum(cols[a], cols[b])
        hi = jnp.maximum(cols[a], cols[b])
        cols[a], cols[b] = lo, hi
    return tuple(cols), (g, L, gb)


def _extract_one(cs, lanes, g, L, gb):
    """One extraction round: returns (new column list, [rows, 1] global
    index of the winner). ``lanes``: [rows, L] int32 lane iota."""
    m = jnp.min(cs[0], axis=1, keepdims=True)              # [rows, 1]
    mb = lax.bitcast_convert_type(m, jnp.int32)
    lidx = (mb >> gb) & (L - 1)
    gidx = (mb & (g - 1)) * L + lidx
    win = lanes == lidx
    cs = list(cs)
    for j in range(g - 1):
        cs[j] = jnp.where(win, cs[j + 1], cs[j])
    cs[g - 1] = jnp.where(win, jnp.float32(_SENTINEL), cs[g - 1])
    return cs, gidx


def topk_stream_next(cols, lanes, meta, nsteps):
    """Extract the next ``nsteps`` winners (Python-unrolled). Returns
    ``(new_cols, gidx [rows, nsteps] int32)`` in ascending-distance
    order."""
    g, L, gb = meta
    cs = list(cols)
    winners = []
    for _ in range(nsteps):
        cs, gidx = _extract_one(cs, lanes, g, L, gb)
        winners.append(gidx)
    return tuple(cs), jnp.concatenate(winners, axis=1)


# ---- two-winners-per-reduce extraction (row-major stream) ------------------
#
# _extract_one pays one full lane min-reduce (log2(L) rotate stages) per
# winner — 32 serial reduces for k=32. The pair form extracts TWO winners
# per reduce: initialize each lane's candidate pair from its sorted
# column's first two entries (cs[0], cs[1] — per-lane top-2 by
# construction), then run ONE halving tree over lanes that carries a
# sorted top-2 pair instead of a single min. Global top-2 of all g*L
# values is always inside the union of per-lane top-2s (k-way merge
# argument), and packed values are unique (identity bits in the value),
# so the pair tree returns exactly the winners serial extraction would —
# the output sequence is bit-identical to two _extract_one rounds. Per
# stage the tree costs 2 static lane rotations + 3 min/max (vs 1 rotation
# + 1 min for the plain reduce), so one pair round ~1.5x one plain round
# replacing 2 — a ~25% cut of the serial extraction chain.


def _lroll(x, s):
    """Static lane rotation (roll-left by s) as slice+concat — the form
    Mosaic lowers to vector lane shifts inside Pallas kernels."""
    return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)


def _top2_tree(a1, a2, L):
    """[rows, L] sorted pairs (a1 <= a2 elementwise) -> ([rows, 1],
    [rows, 1]) the two smallest values over (lanes x pair). Halving
    tree: stage s combines lane i with lane i+s for i < s — disjoint
    halves, so no element is ever counted into both slots. Only lane 0
    is valid at the end (other lanes hold window garbage)."""
    s = L // 2
    while s >= 1:
        b1 = _lroll(a1, s)
        b2 = _lroll(a2, s)
        hi = jnp.maximum(a1, b1)
        a1 = jnp.minimum(a1, b1)
        a2 = jnp.minimum(hi, jnp.minimum(a2, b2))
        s //= 2
    return a1[:, :1], a2[:, :1]


def _extract_pair(cs, lanes, g, L, gb):
    """One pair round: -> (new columns, [rows, 1] gidx1, [rows, 1] gidx2)
    with gidx1/gidx2 the next two winners in ascending order."""
    m1, m2 = _top2_tree(cs[0], cs[1], L)
    b1 = lax.bitcast_convert_type(m1, jnp.int32)
    b2 = lax.bitcast_convert_type(m2, jnp.int32)
    l1 = (b1 >> gb) & (L - 1)
    l2 = (b2 >> gb) & (L - 1)
    gidx1 = (b1 & (g - 1)) * L + l1
    gidx2 = (b2 & (g - 1)) * L + l2
    win1 = lanes == l1
    win2 = lanes == l2
    both = win1 & win2                 # same lane supplied both winners
    sh1 = (win1 | win2) & ~both
    sent = jnp.full_like(cs[0], _SENTINEL)
    ncs = []
    for j in range(g):
        nxt1 = cs[j + 1] if j + 1 < g else sent
        nxt2 = cs[j + 2] if j + 2 < g else sent
        ncs.append(jnp.where(both, nxt2, jnp.where(sh1, nxt1, cs[j])))
    return ncs, gidx1, gidx2


def topk_stream_next2(cols, lanes, meta, nsteps):
    """Pair-extraction twin of :func:`topk_stream_next` — same contract,
    bit-identical winners, ~half the serial lane reduces (odd ``nsteps``
    falls back to one plain round for the remainder). Requires g >= 2
    (guaranteed by sorted_topk_supported)."""
    g, L, gb = meta
    cs = list(cols)
    winners = []
    for _ in range(nsteps // 2):
        cs, g1, g2 = _extract_pair(cs, lanes, g, L, gb)
        winners += [g1, g2]
    if nsteps % 2:
        cs, g1 = _extract_one(cs, lanes, g, L, gb)
        winners.append(g1)
    return tuple(cs), jnp.concatenate(winners, axis=1)


# ---- transposed-layout stream (sublane-axis reduction) ---------------------
#
# Same sorted-column contract with the tile TRANSPOSED: dT [n, rows] is
# chunked along SUBLANES into g blocks of L rows, the per-position cross-
# chunk columns are sorted by the same network, and each extraction round
# min-reduces over the SUBLANE axis. On TPU a sublane-axis reduction
# combines whole vregs in a shrinking tree (~L/8 + log ops) where the
# lane-axis reduction of the row-major form pays a full-width rotate chain
# (log2(L) stages over every vreg) — the round cost drops from
# reduce-dominated to shift-dominated. Packing bits, tie rules and the
# selected sets are IDENTICAL to the row-major stream (lane id -> sublane
# id within the chunk); winners come out as [1, rows] lane-major vectors,
# which the fused SG kernel consumes by building TRANSPOSED one-hot rows
# and contracting dim0 x dim0 (the `rows_dot` form Mosaic lowers natively).


def topk_stream_init_T(dT, g_max=8):
    """Transposed twin of :func:`topk_stream_init`: dT [n, rows] ->
    ``(cols, (g, L, gb))`` with ``cols`` a tuple of g [L, rows] arrays,
    each position's cross-chunk column sorted ascending."""
    n, rows = dT.shape
    g = min(g_max, n // 128)
    assert sorted_topk_supported(n, g_max), (n, g_max)
    L = n // g
    gb = (g - 1).bit_length()
    lb = (L - 1).bit_length()
    clear = ~jnp.int32((1 << (gb + lb)) - 1)
    sub_bits = lax.broadcasted_iota(jnp.int32, (L, rows), 0) << gb
    u = lax.bitcast_convert_type(dT, jnp.int32)
    cols = [lax.bitcast_convert_type(
        ((u[gi * L:(gi + 1) * L] & clear) | sub_bits | gi)
        + jnp.int32(1 << 23), jnp.float32)
        for gi in range(g)]
    for a, b in _NETWORKS[g]:
        lo = jnp.minimum(cols[a], cols[b])
        hi = jnp.maximum(cols[a], cols[b])
        cols[a], cols[b] = lo, hi
    return tuple(cols), (g, L, gb)


def _extract_one_T(cs, subs, g, L, gb):
    """One transposed extraction round -> (new columns, [1, rows] int32
    global winner index). ``subs``: [L, rows] sublane iota."""
    m = jnp.min(cs[0], axis=0, keepdims=True)              # [1, rows]
    mb = lax.bitcast_convert_type(m, jnp.int32)
    lidx = (mb >> gb) & (L - 1)
    gidx = (mb & (g - 1)) * L + lidx
    win = subs == lidx
    cs = list(cs)
    for j in range(g - 1):
        cs[j] = jnp.where(win, cs[j + 1], cs[j])
    cs[g - 1] = jnp.where(win, jnp.float32(_SENTINEL), cs[g - 1])
    return cs, gidx


def topk_stream_next_T(cols, subs, meta, nsteps):
    """Extract the next ``nsteps`` winners from a transposed stream.
    Returns ``(new_cols, gidx [nsteps, rows] int32)``."""
    g, L, gb = meta
    cs = list(cols)
    winners = []
    for _ in range(nsteps):
        cs, gidx = _extract_one_T(cs, subs, g, L, gb)
        winners.append(gidx)
    return tuple(cs), jnp.concatenate(winners, axis=0)


def _top2_tree_T(a1, a2):
    """[L, rows] sorted pairs -> ([1, rows], [1, rows]) the two smallest
    over (sublanes x pair). Halving tree on STATIC sublane slices — the
    shapes shrink every stage, so no rotates at all (the transposed
    stream's native advantage)."""
    L = a1.shape[0]
    s = L // 2
    while s >= 1:
        b1, b2 = a1[s:2 * s], a2[s:2 * s]
        hi = jnp.maximum(a1[:s], b1)
        a1 = jnp.minimum(a1[:s], b1)
        a2 = jnp.minimum(hi, jnp.minimum(a2[:s], b2))
        s //= 2
    return a1, a2


def _extract_pair_T(cs, subs, g, L, gb):
    """Transposed twin of :func:`_extract_pair` -> (new columns,
    [1, rows] gidx1, [1, rows] gidx2)."""
    m1, m2 = _top2_tree_T(cs[0], cs[1])
    b1 = lax.bitcast_convert_type(m1, jnp.int32)
    b2 = lax.bitcast_convert_type(m2, jnp.int32)
    l1 = (b1 >> gb) & (L - 1)
    l2 = (b2 >> gb) & (L - 1)
    gidx1 = (b1 & (g - 1)) * L + l1
    gidx2 = (b2 & (g - 1)) * L + l2
    win1 = subs == l1
    win2 = subs == l2
    both = win1 & win2
    sh1 = (win1 | win2) & ~both
    sent = jnp.full_like(cs[0], _SENTINEL)
    ncs = []
    for j in range(g):
        nxt1 = cs[j + 1] if j + 1 < g else sent
        nxt2 = cs[j + 2] if j + 2 < g else sent
        ncs.append(jnp.where(both, nxt2, jnp.where(sh1, nxt1, cs[j])))
    return ncs, gidx1, gidx2


def topk_stream_next2_T(cols, subs, meta, nsteps):
    """Pair-extraction twin of :func:`topk_stream_next_T` — bit-identical
    winners, two per tree (odd remainder falls back to one plain
    round)."""
    g, L, gb = meta
    cs = list(cols)
    winners = []
    for _ in range(nsteps // 2):
        cs, g1, g2 = _extract_pair_T(cs, subs, g, L, gb)
        winners += [g1, g2]
    if nsteps % 2:
        cs, g1 = _extract_one_T(cs, subs, g, L, gb)
        winners.append(g1)
    return tuple(cs), jnp.concatenate(winners, axis=0)


def sorted_topk(d, k, g_max=8, unroll=1):
    """[rows, n] f32 (>= 0, finite) -> [rows, k] int32 indices of the k
    smallest per row, as an unordered set (tie/ulp caveats above). Pure
    jnp: usable inside Pallas kernels and as a plain op.

    Dtype choreography for Mosaic: BOTH the chunk id and the lane id are
    packed into the low mantissa bits in int32 (bits [0, log2 g) = chunk,
    [log2 g, log2 g + log2 L) = lane), and the sorted columns are carried
    bitcast back to f32 — for non-negative floats the bit patterns order
    identically and f32 min/max return operand bits untouched. With the
    full identity inside the value, each extraction round is ONE plain
    lane min-reduce (no Mosaic arg-reduction, no one-hot readback): the
    winning bits decode straight to the global index. Flush-to-zero
    hazard around d == 0 (every centroid is its own nearest neighbor, so
    a zero distance occurs in every row): the packed bits of a zero
    distance are a DENORMAL, which the TPU VPU flushes to 0.0 — erasing
    the packed id — so after packing, every value is shifted up one
    exponent by an int32 add of 1 << 23 (order-preserving on positive-
    float bit patterns; requires d < ~1.7e38)."""
    rows, n = d.shape
    # past n extractions only sentinels remain, whose packed bits decode
    # to garbage indices — make over-asking loud
    assert k <= n, f"sorted_topk asked for k={k} of n={n} values"
    cols, (g, L, gb) = topk_stream_init(d, g_max)
    lanes = lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    kcols = lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def body(i, carry):
        idx_acc = carry[-1]
        cs, gidx = _extract_one(list(carry[:-1]), lanes, g, L, gb)
        idx_acc = jnp.where(kcols == i, gidx, idx_acc)
        return (*cs, idx_acc)

    out = lax.fori_loop(0, k, body,
                        (*cols, jnp.zeros((rows, k), jnp.int32)),
                        unroll=unroll)
    return out[-1]
