"""AAMP — the non-normalized (pure Euclidean) matrix profile
(Akbarinia & Cloez 2019, "Efficient Matrix Profile Computation Using
Different Distance Functions").

The z-normalized profile (mpx.py) answers "which shapes repeat"; AAMP
answers "which VALUES repeat" — the right profile when the series is
already on a common scale (token ids, quantized sensor counts) and
amplitude matters. tsmp itself ships only the z-normalized stack, so
this is a beyond-reference operator (SURVEY.md §2 extras).

Exactness: over integer series the squared window distance
``Σ_k (x[i+k] - x[j+k])²`` is a bounded integer sum, so the whole
profile — distance AND index — is EXACT on both engines with no float
convention and no low-variance guard (nothing is normalized, every
window is defined). Tie rule matches the house SQL argmin: among
equal distances the smallest neighbor index wins (ORDER BY dist, nn).

The kernel marches diagonals like mpx: for offset d the elementwise
squared diffs are one vector op and the window sums one cumsum slice —
O(n²/2) integer adds, no Python inner loop.
"""

from __future__ import annotations

import numpy as np

AAMP_SENT = np.int64(1) << np.int64(62)


def aamp(x: np.ndarray, w: int, ez_n: int) -> tuple[np.ndarray, np.ndarray]:
    """Self-join AAMP over an integer series.

    Returns ``(mp2, pi)`` — squared integer distances (AAMP_SENT where
    no admissible neighbor exists) and neighbor indices (-1 there).
    Admissible pairs follow the house predicate ``j > i + ez_n``.
    """
    x = np.asarray(x, dtype=np.int64)
    big_n = x.shape[0]
    n = big_n - w + 1
    if n <= 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    mp = np.full(n, AAMP_SENT, dtype=np.int64)
    pi = np.full(n, -1, dtype=np.int64)
    for d in range(ez_n + 1, n):
        e = x[d:] - x[:-d]
        e *= e
        c = np.concatenate(([0], np.cumsum(e)))
        sw = c[w:] - c[:-w]  # window sums along the diagonal
        sw = sw[: n - d]
        ja = np.arange(n - d, dtype=np.int64) + d
        cur = mp[: n - d]
        upd = (sw < cur) | ((sw == cur) & (ja < pi[: n - d]))
        cur[upd] = sw[upd]
        pi[: n - d][upd] = ja[upd]
        ib = np.arange(n - d, dtype=np.int64)
        cur = mp[d:]
        upd = (sw < cur) | ((sw == cur) & (ib < pi[d:]))
        cur[upd] = sw[upd]
        pi[d:][upd] = ib[upd]
    return mp, pi


def aamp_ref(x, w: int, ez_n: int) -> tuple[list, list]:
    """Scalar brute force — the independent cross-check for tests."""
    x = [int(v) for v in x]
    n = len(x) - w + 1
    mp = [int(AAMP_SENT)] * n
    pi = [-1] * n
    for i in range(n):
        for j in range(n):
            if abs(i - j) <= ez_n:
                continue
            d2 = sum((x[i + k] - x[j + k]) ** 2 for k in range(w))
            if d2 < mp[i] or (d2 == mp[i] and j < pi[i]):
                mp[i] = d2
                pi[i] = j
    return mp, pi
