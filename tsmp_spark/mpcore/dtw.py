"""Banded dynamic-time-warping distance (Sakoe & Chiba 1978) with an
integer L1 step cost.

Beyond-reference operator (the reference's UCR ecosystem pairs the
matrix profile with DTW-based similarity; tsmp itself ships none, so
this is a first-class extra, not parity — see SURVEY.md §2 extras).

Engine-portability design: token ids are small non-negative integers
(< vocab_size), the step cost is ``|a_i - b_j|`` and the DP adds
integers only, so the distance is EXACT — both the Spark kernel and
the DuckDB recursive-CTE oracle produce the identical BIGINT with no
rounding convention anywhere (the strongest cross-engine gate the
house has).

The kernel marches ANTI-DIAGONALS, not rows: every cell on diagonal
``e = i + j`` depends only on diagonals ``e-1`` and ``e-2``, so each
update is an elementwise vector min — O(T) numpy work per diagonal,
no Python inner loop — and the identical recurrence transliterates
into the oracle's recursive CTE (one iteration per diagonal carrying
two sentinel-padded lists; formulation validated in a throwaway
numpy/DuckDB model before the SQL was written, per the house rule).
"""

from __future__ import annotations

import numpy as np

#: unreachable-cell sentinel — far above any real path cost
#: (path length <= 2T cells, per-step cost < 2^15 for token ids),
#: far below int64 overflow even after one spurious add.
DTW_SENT = np.int64(1) << np.int64(40)


def dtw_banded(a: np.ndarray, b: np.ndarray, band: int) -> int:
    """Exact banded DTW distance between equal-length integer series.

    ``band`` is the Sakoe-Chiba radius: cells with ``|i - j| > band``
    are excluded. Returns the integer DP value at ``(T-1, T-1)``.
    """
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    T = a.shape[0]
    if b.shape[0] != T:
        raise ValueError("dtw_banded expects equal-length series")
    if T == 0:
        return 0
    idx = np.arange(T)
    prev = np.full(T, DTW_SENT, dtype=np.int64)  # diagonal e-1
    cur = np.full(T, DTW_SENT, dtype=np.int64)   # diagonal e
    cur[0] = abs(int(a[0]) - int(b[0]))
    for e in range(1, 2 * T - 1):
        j = e - idx
        valid = (j >= 0) & (j < T) & (np.abs(idx - j) <= band)
        # predecessor mins: dp(i-1,j)=cur[i-1], dp(i,j-1)=cur[i],
        # dp(i-1,j-1)=prev[i-1]; shifted-in cells are sentinel.
        up = np.empty(T, dtype=np.int64)
        up[0] = DTW_SENT
        up[1:] = cur[:-1]
        diag = np.empty(T, dtype=np.int64)
        diag[0] = DTW_SENT
        diag[1:] = prev[:-1]
        best = np.minimum(np.minimum(up, cur), diag)
        cost = np.abs(a - b[np.clip(j, 0, T - 1)])
        nxt = np.full(T, DTW_SENT, dtype=np.int64)
        nxt[valid] = cost[valid] + best[valid]
        prev, cur = cur, nxt
    return int(cur[T - 1])


def dtw_banded_ref(a, b, band: int) -> int:
    """Row-major scalar DP — the independent cross-check the tests pin
    the vectorized kernel against (never called from the Spark path)."""
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    T, U = len(a), len(b)
    if T == 0:
        return 0
    big = int(DTW_SENT)
    dp = [[big] * U for _ in range(T)]
    for i in range(T):
        for j in range(max(0, i - band), min(U, i + band + 1)):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i][j] = c
                continue
            best = big
            if i > 0:
                best = min(best, dp[i - 1][j])
            if j > 0:
                best = min(best, dp[i][j - 1])
            if i > 0 and j > 0:
                best = min(best, dp[i - 1][j - 1])
            dp[i][j] = c + best
    return dp[T - 1][U - 1]


def lcs_length(a, b) -> int:
    """Exact longest-common-subsequence length between two integer token
    sequences (Wagner & Fischer 1974 DP). All-integer — the strongest
    cross-engine gate (no rounding convention anywhere); the DuckDB
    oracle replays the identical recurrence anti-diagonally (invalid
    cells are 0, which IS the LCS boundary condition, so no sentinel
    is needed — max semantics make 0 neutral)."""
    bl = list(b)
    m = len(bl)
    prev = [0] * (m + 1)
    for x in a:
        cur = [0] * (m + 1)
        cp = cur  # local alias; inner loop is O(T) ints, T is trunc-bounded
        pj = prev
        for j in range(1, m + 1):
            if x == bl[j - 1]:
                c = pj[j - 1] + 1
            else:
                left = cp[j - 1]
                up = pj[j]
                c = left if left >= up else up
            cp[j] = c
        prev = cur
    return int(prev[m])
