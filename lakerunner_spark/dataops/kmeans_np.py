"""Vectorized (numpy) twin of the unrolled-Lloyd k-means trajectory.

The JVM plan in :func:`similarity._kmeans_trajectory` is exact and
declarative, but its per-iteration shape is an exploding broadcast join
(``long x cents on pos`` = m*d*k rows, guide §3.3) repeated per
unrolled iteration — real compute once k follows the SemDeDup k ∝ n
contract (sf10: 3 x ~80M-row joins to train on 1,575 vectors). This
module reproduces the SAME arithmetic as one numpy task (guide §4.2):
Spark does the (bounded) train-sample scan, numpy does the Lloyd loop.

Bit-identity contract (pinned by tests/test_dataprep_ops.py::
test_kmeans_engines_equal): every float op replays the JVM plan's IEEE
evaluation order —

- distances accumulate dim-by-dim in ``pos`` order (the broadcast hash
  join streams ``long``'s posexplode output in pos order, so the
  partial sum is sequential in pos);
- centroid means accumulate member contributions in ascending ``_id``
  order (the sort-merge join on ``_id`` feeds the groupBy sorted);
- every stage result rounds through the same
  ``floor(x * 1e9 + 0.5) / 1e9`` grid (``portable_round``'s finite
  branch; NaN/±Inf pass through untouched, matching the when-guard);
- argmins replay ``min(struct(dist, key))`` under Spark's TOTAL
  ordering: NULL dist sorts first, NaN sorts after +Inf, ties break
  toward the lower cluster/cell id.

NULL semantics (the subtle part): a NULL array element still occupies
its ``pos`` row after posexplode, so it creates *candidacy* (the join
row exists) while contributing nothing to the sum (Sum skips NULL
addends); an all-NULL term set yields a NULL dist (which WINS an
argmin); a missing pos (short vector) creates no row at all. The
matrices below therefore carry separate presence (row exists) and
validity (value non-NULL) masks. Genuine NaN VALUES are not NULLs:
they poison sums exactly as doubles do.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "VecBlock",
    "block_from_arrow",
    "block_from_rows",
    "merge_blocks",
    "lloyd_cents",
    "CentIndex",
    "coarse_map",
    "two_level_assign",
]


def _round9(x: np.ndarray) -> np.ndarray:
    """floor(x*1e9 + 0.5)/1e9 — identical to portable_round on finite
    doubles; np.floor passes NaN/±Inf through, which matches the
    when-guard (Spark's floor-through-LONG never sees them)."""
    return np.floor(x * 1e9 + 0.5) / 1e9


class VecBlock:
    """A batch of id-sorted vectors as dense matrices.

    ids  : (m,) int64, ascending
    V    : (m, dmax) float64 — element values (NaN where the element is
           a genuine NaN; undefined where not valid)
    P    : (m, dmax) bool — pos EXISTS (pos < len(vec)); a NULL element
           is present but not valid
    M    : (m, dmax) bool — element is present AND non-NULL
    """

    __slots__ = ("ids", "V", "P", "M")

    def __init__(self, ids, V, P, M):
        self.ids, self.V, self.P, self.M = ids, V, P, M


def block_from_rows(ids, vecs) -> VecBlock:
    """Exact-path constructor from python lists (None array -> no pos
    rows; None element -> present-but-invalid; floats pass through,
    NaN included). ``vecs`` is a sequence of list|None."""
    m = len(ids)
    lens = [0 if v is None else len(v) for v in vecs]
    dmax = max(lens, default=0)
    V = np.zeros((m, dmax), dtype=np.float64)
    P = np.zeros((m, dmax), dtype=bool)
    M = np.zeros((m, dmax), dtype=bool)
    for i, v in enumerate(vecs):
        if v is None:
            continue
        for j, x in enumerate(v):
            P[i, j] = True
            if x is not None:
                M[i, j] = True
                V[i, j] = float(x)
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    return VecBlock(ids[order], V[order], P[order], M[order])


def block_from_arrow(id_arr, vec_arr) -> VecBlock:
    """Constructor from pyarrow arrays; fast path (zero-copy reshape)
    when the list column is rectangular and null-free — the shape every
    real embedding table has — else the exact python path."""
    import pyarrow.compute as pc  # noqa: PLC0415

    ids = np.asarray(id_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    if vec_arr.null_count == 0:
        flat = vec_arr.flatten()
        if flat.null_count == 0:
            lens = pc.list_value_length(vec_arr).to_numpy(
                zero_copy_only=False
            )
            if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
                d = int(lens[0])
                V = (
                    flat.to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(-1, d)
                )
                order = np.argsort(ids, kind="stable")
                ones = np.ones((len(ids), d), dtype=bool)
                return VecBlock(ids[order], V[order], ones, ones)
    return block_from_rows(ids, vec_arr.to_pylist())


def merge_blocks(blocks: "list[VecBlock]") -> VecBlock:
    """Concatenate per-batch blocks (padding to the widest dmax) and
    re-sort by id — the single-task trainer may receive several Arrow
    batches for its one partition."""
    if len(blocks) == 1:
        return blocks[0]
    dmax = max((b.P.shape[1] for b in blocks), default=0)

    def pad(a, fill):
        if a.shape[1] == dmax:
            return a
        out = np.full((a.shape[0], dmax), fill, dtype=a.dtype)
        out[:, : a.shape[1]] = a
        return out

    ids = np.concatenate([b.ids for b in blocks]) if blocks else np.empty(
        0, dtype=np.int64
    )
    V = np.vstack([pad(b.V, 0.0) for b in blocks]) if blocks else np.zeros(
        (0, 0)
    )
    P = np.vstack([pad(b.P, False) for b in blocks]) if blocks else np.zeros(
        (0, 0), dtype=bool
    )
    M = np.vstack([pad(b.M, False) for b in blocks]) if blocks else np.zeros(
        (0, 0), dtype=bool
    )
    order = np.argsort(ids, kind="stable")
    return VecBlock(ids[order], V[order], P[order], M[order])


class CentIndex:
    """Centroid table as dense matrices over original cluster ids
    0..k-1 (dead clusters keep their slot with all-False row masks).

    C   : (k, dmax) float64 cval (post-round; NaN possible)
    CP  : (k, dmax) bool — the (cluster,pos) ROW exists in cents
    CM  : (k, dmax) bool — row exists AND cval is non-NULL
    """

    __slots__ = ("C", "CP", "CM")

    def __init__(self, C, CP, CM):
        self.C, self.CP, self.CM = C, CP, CM

    @classmethod
    def from_rows(cls, rows, n_clusters: int):
        """From collected (cluster, pos, cval) rows."""
        dmax = max((r[1] for r in rows), default=-1) + 1
        C = np.zeros((n_clusters, dmax), dtype=np.float64)
        CP = np.zeros((n_clusters, dmax), dtype=bool)
        CM = np.zeros((n_clusters, dmax), dtype=bool)
        for c, p, v in rows:
            CP[c, p] = True
            if v is not None:
                CM[c, p] = True
                C[c, p] = v
        return cls(C, CP, CM)

    def rows(self):
        """Back to (cluster, pos, cval|None) rows."""
        out = []
        k, dmax = self.CP.shape
        for c in range(k):
            for p in range(dmax):
                if self.CP[c, p]:
                    out.append(
                        (c, p, float(self.C[c, p]) if self.CM[c, p] else None)
                    )
        return out


def _pairwise_dist(block: VecBlock, cents: CentIndex):
    """Replay of ``long.join(cents, "pos").groupBy(...).agg(round9(
    sum((val-cval)^2)))``: returns (Dr, g) where Dr is the 9-dp rounded
    distance matrix (m,k) and g the ordering group — 0 NULL dist
    (wins), 1 real value, 2 NaN (loses to +Inf), 3 no candidacy
    (absent row). Accumulation is dim-by-dim in pos order."""
    m, dmax = block.P.shape
    k = cents.CP.shape[0]
    D = np.zeros((m, k), dtype=np.float64)
    NV = np.zeros((m, k), dtype=np.int64)
    CAND = np.zeros((m, k), dtype=bool)
    cd = cents.CP.shape[1]
    for j in range(min(dmax, cd)):
        both_row = block.P[:, j : j + 1] & cents.CP[None, :, j]
        if not both_row.any():
            continue
        CAND |= both_row
        both_val = block.M[:, j : j + 1] & cents.CM[None, :, j]
        t = (block.V[:, j : j + 1] - cents.C[None, :, j]) ** 2
        D = np.where(both_val, D + t, D)
        NV += both_val
    Dr = _round9(D)
    g = np.full((m, k), 3, dtype=np.int8)
    g[CAND] = 1
    g[CAND & (NV == 0)] = 0
    g[CAND & (NV > 0) & np.isnan(Dr)] = 2
    return Dr, g


def _argmin_struct(Dr: np.ndarray, g: np.ndarray):
    """min(struct(dist, key)) under Spark total ordering, vectorized:
    group 0 (NULL) < group 1 by value < group 2 (NaN) < absent; ties
    break to the first (lowest-index) column. Returns (idx, has)."""
    gmin = g.min(axis=1, keepdims=True)
    in_g = g == gmin
    # distance key only matters inside winning group 1 (real values,
    # NaN-free there by construction); groups 0/2/3 tie at +inf and
    # resolve purely by first-occurrence (= lowest cluster id)
    dk = np.where(in_g & (g == 1), Dr, np.inf)
    dmin = dk.min(axis=1, keepdims=True)
    cand = in_g & (dk == dmin)
    best = cand.argmax(axis=1)  # first True = lowest cluster id
    has = gmin[:, 0] < 3
    return best, has


def lloyd_cents(block: VecBlock, n_clusters: int, iters: int) -> CentIndex:
    """The full trajectory: seed cents from the k lowest-id vectors
    (cluster = id rank), then ``iters`` rounds of assign + re-center.
    Returns the FINAL per-dim centroid table (the ``cents`` output of
    ``_kmeans_trajectory``; the final assignment is its derivation
    input and is recomputed by callers that need it)."""
    m, dmax = block.P.shape
    k = min(n_clusters, m)
    # iter-0 cents: the seed vectors' own elements, 9-dp rounded
    C = np.zeros((n_clusters, dmax), dtype=np.float64)
    CP = np.zeros((n_clusters, dmax), dtype=bool)
    CM = np.zeros((n_clusters, dmax), dtype=bool)
    C[:k] = _round9(block.V[:k])
    CP[:k] = block.P[:k]
    CM[:k] = block.M[:k]
    cents = CentIndex(C, CP, CM)
    for _ in range(iters):
        Dr, g = _pairwise_dist(block, cents)
        cl, has = _argmin_struct(Dr, g)
        # re-center: avg of member elements per (cluster,pos), member
        # contributions in ascending-id order (rows are id-sorted and
        # np.add.at accumulates sequentially in input order)
        C = np.zeros((n_clusters, dmax), dtype=np.float64)
        CP = np.zeros((n_clusters, dmax), dtype=bool)
        CM = np.zeros((n_clusters, dmax), dtype=bool)
        CNT = np.zeros((n_clusters, dmax), dtype=np.int64)
        hi = np.nonzero(has)[0]
        cls_ = cl[hi]
        for j in range(dmax):
            pj = block.P[hi, j]
            np.add.at(CP[:, j], cls_[pj], True)
            mj = block.M[hi, j]
            rows = hi[mj]
            np.add.at(C[:, j], cl[rows], block.V[rows, j])
            np.add.at(CNT[:, j], cl[rows], 1)
        CM = CNT > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            C = np.where(CM, _round9(C / CNT), 0.0)
        cents = CentIndex(C, CP != 0, CM)
    return cents


def coarse_map(cents: CentIndex, coarse_cells: int) -> np.ndarray:
    """Replay of cseed/cdist/cmap: fine cluster -> coarse cell via
    argmin of the 9-dp rounded centroid-to-seed distance (seeds are
    the centroids with cluster id < coarse_cells), ties to the lower
    cell. Returns (k,) int cell per cluster, -1 when the cluster has
    no common pos with any live seed (absent from cmap)."""
    seeds = CentIndex(
        cents.C[:coarse_cells],
        cents.CP[:coarse_cells],
        cents.CM[:coarse_cells],
    )
    sblock = VecBlock(
        np.arange(cents.CP.shape[0], dtype=np.int64),
        cents.C,
        cents.CP,
        cents.CM,
    )
    Dr, g = _pairwise_dist(sblock, seeds)
    cell, has = _argmin_struct(Dr, g)
    out = np.where(has, cell, -1)
    return out


def two_level_assign(
    block: VecBlock, cents: CentIndex, cmap: np.ndarray, coarse_cells: int
):
    """Replay of the vdist/vcell + fdist/assign passes: coarse argmin
    over the seed cells, then fine argmin over ONLY the winning cell's
    clusters. Returns (cluster_idx, has) aligned with block rows."""
    seeds = CentIndex(
        cents.C[:coarse_cells],
        cents.CP[:coarse_cells],
        cents.CM[:coarse_cells],
    )
    Dr_c, g_c = _pairwise_dist(block, seeds)
    vcell, has_c = _argmin_struct(Dr_c, g_c)
    # fine pass per winning cell: only that cell's clusters join in —
    # n*d*(k/c) work, the two-level contract (computing the full (m,k)
    # matrix and masking would silently reinstate the flat n*d*k term)
    m = block.P.shape[0]
    cl = np.zeros(m, dtype=np.int64)
    has_f = np.zeros(m, dtype=bool)
    for cell in np.unique(vcell[has_c]):
        rows = np.nonzero(has_c & (vcell == cell))[0]
        clusters = np.nonzero(cmap == cell)[0]  # ascending cluster id
        if len(clusters) == 0:
            continue
        sub = VecBlock(
            block.ids[rows], block.V[rows], block.P[rows], block.M[rows]
        )
        subc = CentIndex(
            cents.C[clusters], cents.CP[clusters], cents.CM[clusters]
        )
        Dr_f, g_f = _pairwise_dist(sub, subc)
        idx, h = _argmin_struct(Dr_f, g_f)
        cl[rows] = clusters[idx]
        has_f[rows] = h
    return cl, has_f
