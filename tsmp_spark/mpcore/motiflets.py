"""k-Motiflets: top motif SETS of exactly k non-overlapping occurrences
(Schäfer & Leser, "Motiflets — Simple and Accurate Detection of Motifs in
Time Series", PVLDB 16(4), 2022).

Where the reference's motif stack (tsmp find_motifs, R/motifs.R) ranks
PAIRS by matrix-profile value and attaches radius-bounded neighbors, the
k-motiflet asks for the set of k occurrences minimizing the EXTENT — the
maximal pairwise z-normalized distance inside the set — which removes the
radius parameter entirely.  This module implements the paper's anchored
candidate generation exactly (each anchor plus its k-1 greedily chosen
nearest admissible neighbors; the winner is the anchor whose candidate set
has minimal extent), brute-force over the full pair-distance matrix so the
relational oracle can replay every pick.

Determinism contract: candidate neighbors tie-break to the SMALLER index
(np.nanargmin keeps the first minimum; the SQL oracle orders by
``(dist, j)``), anchors tie-break to the smaller anchor, and all distances
use the engine-wide co-moment formulation with the one low-variance rule
(`lowvar_threshold`) masking degenerate windows on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stats import exclusion_zone_size, fast_avg_sd, lowvar_threshold, movsum


def znorm_dist_matrix(ts: np.ndarray, w: int, ez_n: int) -> np.ndarray:
    """Full m×m z-normalized euclidean distance matrix with the trivial
    band |i−j| ≤ ez_n and degenerate (low-variance) windows masked NaN.

    Same arithmetic shape as the SQL brute oracle: per-diagonal sliding
    dot products qt, then ``sqrt(max(2w(1 − (qt − w·μiμj)/(w·σiσj)), 0))``.
    O(m²) — this is the exact small-series kernel the per-window rollup
    applies inside a task, not a whole-table operator.
    """
    ts = np.asarray(ts, dtype=np.float64)
    n = ts.shape[0]
    m = n - w + 1
    if m <= 0:
        return np.full((0, 0), np.nan)
    mu, sd = fast_avg_sd(ts, w)
    ok = sd >= lowvar_threshold(mu)
    d_mat = np.full((m, m), np.nan)
    for d in range(ez_n + 1, m):
        p = ts[:-d] * ts[d:]
        qt = movsum(p, w)[: m - d]
        i = np.arange(m - d)
        j = i + d
        den = w * sd[i] * sd[j]
        valid = ok[i] & ok[j]
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (qt - w * mu[i] * mu[j]) / den
            dist = np.sqrt(np.maximum(2.0 * w * (1.0 - corr), 0.0))
        dist = np.where(valid, dist, np.nan)
        d_mat[i, j] = dist
        d_mat[j, i] = dist
    return d_mat


@dataclass
class Motiflet:
    anchor: int
    members: list[int]  # k indices, anchor first, in pick order
    extent: float


def k_motiflets(
    ts: np.ndarray, w: int, k: int = 3, ez_frac: float = 0.5
) -> Motiflet | None:
    """Best k-motiflet of ``ts`` by anchored greedy candidate generation
    (Schäfer & Leser 2022 §4.2): for every anchor i, pick its k−1 nearest
    neighbors one at a time, each admissible iff it clears the exclusion
    zone of every already-picked member; candidate extent = max pairwise
    distance in the set; the anchor with minimal extent wins.

    Ties: neighbor picks break to the smaller index, the final winner to
    the smaller anchor. Returns None when no anchor admits k−1 picks.
    """
    ez_n = exclusion_zone_size(w, ez_frac)
    d_mat = znorm_dist_matrix(ts, w, ez_n)
    m = d_mat.shape[0]
    best: Motiflet | None = None
    for i in range(m):
        row = d_mat[i]
        if np.all(np.isnan(row)):
            continue
        sel = [i]
        cand = row.copy()
        failed = False
        for _ in range(k - 1):
            if np.all(np.isnan(cand)):
                failed = True
                break
            jn = int(np.nanargmin(cand))
            sel.append(jn)
            lo = max(0, jn - ez_n)
            cand[lo : jn + ez_n + 1] = np.nan
        if failed:
            continue
        ext = 0.0
        ok = True
        for a in range(len(sel)):
            for b in range(a + 1, len(sel)):
                dab = d_mat[sel[a], sel[b]]
                if np.isnan(dab):
                    ok = False
                    break
                ext = max(ext, float(dab))
            if not ok:
                break
        if not ok:
            continue
        if best is None or ext < best.extent:
            best = Motiflet(anchor=i, members=sel, extent=ext)
    return best
