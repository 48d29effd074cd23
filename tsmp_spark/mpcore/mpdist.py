"""MPdist — matrix-profile-based distance between two series, scalar and
sliding-vector forms, plus snippet extraction built on it.

Re-derives tsmp mpdist.R:100-215 (``mpdist_simple``, ``mpdist_vect``,
``cal_mp_dist``) and find-snippet.R:60-139.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mass import dist_profile
from .mpx import mpx_ab
from .stats import EPS, movmin


def cal_mp_dist(mp: np.ndarray, thr: float, data_size: int) -> float:
    """k-th smallest with k = ceil(thr·data_size) (mpdist.R:194-212)."""
    k = int(np.ceil(thr * data_size))
    if k > mp.shape[0]:
        return float(np.max(mp))
    return float(np.partition(mp, k - 1)[k - 1])


def mpdist(
    data: np.ndarray, query: np.ndarray, window_size: int, thr: float = 0.05
) -> float:
    """Scalar MPdist (mpdist.R:125-131): k-th smallest of the concatenated
    AB and BA profiles.

    Degenerate inputs: windows below the engine-wide low-variance
    threshold (stats.lowvar_threshold) are masked inside mpx_ab, so a
    pair where one series has NO valid window returns the no-neighbor
    sentinel ``2·sqrt(w)`` rather than cancellation noise — callers that
    need "undefined" semantics should pre-check window validity (the
    mpdist driver query does)."""
    data = np.asarray(data, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    res = mpx_ab(data, query, window_size)
    combined = np.concatenate([res.mp, res.mpb])
    return cal_mp_dist(combined, thr, data.shape[0] + query.shape[0])


def mpdist_vect(
    data: np.ndarray, query: np.ndarray, window_size: int, thr: float = 0.05
) -> np.ndarray:
    """Sliding MPdist vector (mpdist.R:144-182): the query slid over data;
    per offset, the AB/BA profile pair is reconstructed from the column-min
    histogram and per-row sliding minima."""
    data = np.asarray(data, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    w = int(window_size)
    query_size = query.shape[0]
    data_size = data.shape[0]
    num_subseqs = query_size - w + 1
    dp_size = data_size - w + 1

    mat = np.empty((num_subseqs, dp_size))
    par = None
    for i in range(num_subseqs):
        res = dist_profile(data, query, index=i, window_size=w, par=par)
        par = res.par
        mat[i] = res.distance_profile  # squared

    all_right_hist = mat.min(axis=0)  # column minima
    slid_min = np.empty((num_subseqs, dp_size - num_subseqs + 1))
    for i in range(num_subseqs):
        slid_min[i] = movmin(mat[i], num_subseqs)

    mp_dist_len = data_size - query_size + 1
    out = np.empty(mp_dist_len)
    for i in range(mp_dist_len):
        right = all_right_hist[i : i + num_subseqs]
        left = slid_min[:, i]
        recreated = np.concatenate([left, right])
        out[i] = cal_mp_dist(recreated, thr, 2 * query_size)
    out[out < EPS] = 0.0
    return np.sqrt(out)


@dataclass
class SnippetResult:
    snippet_idx: np.ndarray
    snippet_frac: np.ndarray
    snippet_size: int
    regime: np.ndarray


def find_snippets(
    data: np.ndarray, s_size: int, n_snippets: int = 2, window_size: int | None = None
) -> SnippetResult:
    """Representative snippets by greedy min-area coverage
    (find-snippet.R:60-139): tumbling candidate windows every ``s_size``;
    iteratively pick the candidate minimizing ``sum(pmin(profile, minis))``;
    fractions by column-argmin share."""
    data = np.asarray(data, dtype=np.float64)
    if window_size is None:
        window_size = s_size // 2
    w = int(window_size)
    if s_size < 4:
        raise ValueError("`s_size` must be at least 4")
    if data.shape[0] < 2 * s_size:
        raise ValueError("series too short relative to snippet length")
    if w >= s_size:
        raise ValueError("`window_size` must be smaller than `s_size`")

    pad = s_size * int(np.ceil(data.shape[0] / s_size)) - data.shape[0]
    padded = np.concatenate([data, np.zeros(pad)])
    n = padded.shape[0]

    indexes = np.arange(0, n - s_size, s_size, dtype=np.int64)
    prof_len = n - s_size + 1
    distances = np.empty((indexes.shape[0], prof_len))
    for jj, i in enumerate(indexes):
        distances[jj] = mpdist_vect(padded, padded[i : i + s_size], w)

    minis = np.full(prof_len, np.inf)
    snippet_idx = []
    dist_snippet = np.empty((n_snippets, prof_len))
    for k in range(n_snippets):
        areas = np.minimum(distances, minis).sum(axis=1)
        best = int(np.argmin(areas))
        minis = np.minimum(distances[best], minis)
        snippet_idx.append(int(indexes[best]))
        dist_snippet[k] = distances[best]

    totalmin = dist_snippet.min(axis=0)
    horizontal = np.zeros(prof_len, dtype=np.int64)
    fraction = np.empty(n_snippets)
    for i in range(n_snippets):
        a = dist_snippet[i] <= totalmin
        fraction[i] = a.sum() / prof_len
        totalmin = np.where(a, totalmin - 1.0, totalmin)
        for j in indexes:
            seg = a[j : j + s_size]
            a[j : j + s_size] = seg.sum() > (s_size / 2)
        horizontal[a] = i + 1
    return SnippetResult(
        snippet_idx=np.asarray(snippet_idx, dtype=np.int64),
        snippet_frac=fraction,
        snippet_size=s_size,
        regime=horizontal,
    )
