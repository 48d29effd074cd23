"""SiMPle-Fast — multidimensional matrix profile with NON-normalized
Euclidean distance summed over dimensions (music-similarity variant).

Re-derives tsmp simple.R:29-232 (precompute 250-265, mass 287-320,
dimension sum 200-202): rolling sum-of-squares per dimension + rolling dot
products, ``dp = sum_d (ss_data + ss_query − 2·QT_d)``, min-merged across
query positions. Self-join applies the exclusion zone; AB-join has none.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stats import exclusion_zone_size, movsum


@dataclass
class SimpleMatrixProfile:
    mp: np.ndarray
    pi: np.ndarray
    w: int
    ez: float
    n_dim: int
    join: bool = False


def _rolling_dots(a: np.ndarray, q: np.ndarray, w: int) -> np.ndarray:
    """QT[j] = sum_k a[j+k]·q[k] per dimension, via FFT correlation.
    Shapes: a (n, d), q (w, d) → (n-w+1, d)."""
    n, d = a.shape
    pad = 1 << int(np.ceil(np.log2(n + w)))
    out = np.empty((n - w + 1, d))
    for j in range(d):
        z = np.fft.irfft(
            np.fft.rfft(a[:, j], pad) * np.fft.rfft(q[::-1, j], pad), pad
        )
        out[:, j] = z[w - 1 : n]
    return out


def simple_fast(
    data: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    exclusion_zone: float = 0.5,
    first_row_quirk: bool = True,
) -> SimpleMatrixProfile:
    """``data``/``query``: (n, n_dim). Returns the SiMPle profile
    (simple.R:221-230): per data position, the non-normalized multidim ED
    to its nearest query subsequence."""
    data = np.atleast_2d(np.asarray(data, dtype=np.float64))
    if data.shape[0] < data.shape[1]:
        data = data.T
    join = query is not None
    q = data if query is None else np.atleast_2d(np.asarray(query, dtype=np.float64))
    if q.shape[0] < q.shape[1]:
        q = q.T
    if q.shape[1] != data.shape[1]:
        raise ValueError("query must have the same dimensions as data")
    w = int(window_size)
    ez = 0.0 if join else exclusion_zone
    ez_n = 0 if join else exclusion_zone_size(w, ez)
    # simple.R:127+168: the FIRST data window's profile masks query
    # positions [1:ez] computed from the ez PARAMETER — applied even for
    # joins (the "no ez if join" comment notwithstanding), and one
    # narrower than the symmetric zone (query ez stays allowed)
    ez_first = exclusion_zone_size(w, exclusion_zone) if first_row_quirk else 0

    n, d = data.shape
    plen = n - w + 1
    nq = q.shape[0] - w + 1

    # rolling sums of squares per dim (simple.R:250-265)
    ss_data = np.stack([movsum(data[:, j] * data[:, j], w) for j in range(d)], axis=1)
    ss_query = np.stack([movsum(q[:, j] * q[:, j], w) for j in range(d)], axis=1)

    mp = np.full(plen, np.inf)
    pi = np.full(plen, -1, dtype=np.int64)

    # first row dots + O(1) updates per query index (simple.R:287-320)
    qt = _rolling_dots(data, q[0:w, :], w)  # (plen, d)
    qt0 = qt[0, :].copy()
    first_dots = _rolling_dots(q, data[0:w, :], w)  # (nq, d): query slid over data win0

    for i in range(nq):
        if i > 0:
            qt[1:plen, :] = (
                qt[0 : plen - 1, :]
                - data[0 : plen - 1, :] * q[i - 1, :][None, :]
                + data[w : n, :] * q[i + w - 1, :][None, :]
            )
            qt[0, :] = first_dots[i, :]
        dp = (ss_data + ss_query[i][None, :] - 2.0 * qt).sum(axis=1)
        np.maximum(dp, 0.0, out=dp)
        if ez_first > 0 and i < ez_first:
            dp[0] = np.inf  # data window 0 rejects queries [0, ez-1]
        if not join and ez_n > 0:
            lo = (max(1, i - ez_n) if first_row_quirk else max(0, i - ez_n))
            dp[lo : min(plen, i + ez_n + 1)] = np.inf
        upd = dp < mp
        mp[upd] = dp[upd]
        pi[upd] = i

    # reference convention (simple.R:198-212): mp is the SQUARED
    # non-normalized multidim ED — never rooted
    return SimpleMatrixProfile(
        mp=mp, pi=pi, w=w, ez=ez, n_dim=d, join=join
    )
