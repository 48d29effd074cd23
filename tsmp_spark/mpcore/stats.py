"""Numerically-stable rolling statistics for matrix-profile kernels.

Re-derives the reference's accurate-summation stack (tsmp math.cpp:204-253
``sum2s_rcpp``/``muinvn_rcpp``, Ogita et al. "Accurate Sum and Dot Product")
and the cumsum-based rolling mean/sd (tsmp misc.R:102-133 ``fast_avg_sd``)
as vectorized numpy. Population SD (ddof=0) everywhere — parity-critical
(tsmp math.cpp:4-20).
"""

from __future__ import annotations

import numpy as np

#: tsmp vars()$eps == .Machine$double.eps ^ 0.5 (misc.R:1102-1107)
EPS = float(np.sqrt(np.finfo(np.float64).eps))

#: Engine-wide scale-aware low-variance threshold (SCALE.md §8 round-3
#: unification). A window whose sd is below ~1e-7 of its level has no
#: meaningful z-normalization in fp64 — its distances are pure
#: cancellation noise whose value depends on summation order. The
#: reference applies THREE mutually-inconsistent guards (mpx.cpp:
#: exact-zero only; stomp.R:182-184: sd < sqrt(machine eps) ≈ 1.49e-8;
#: misc.R:288-314 znorm: sd <= 0.01), so its own kernels disagree on the
#: same near-degenerate input. Every kernel, operator wrapper, and
#: DuckDB oracle here shares this ONE rule instead — valmod's
#: ``_EPS_NORM`` mask (mpcore/valmod.py) generalized engine-wide. The
#: SQL spelling is ``sd >= 1e-7 * (abs(mu) + 1.0)``.
EPS_NORM = 1e-7


def lowvar_threshold(mu):
    """sd threshold below which a window is degenerate: ``1e-7·(|mu|+1)``.

    Scale-aware: relative to the window level for large offsets, absolute
    1e-7 near zero. Accepts scalars or arrays (elementwise).
    """
    return EPS_NORM * (np.abs(mu) + 1.0)

#: Kumaraswamy mode used by FLOSS (misc.R:1102-1107)
KMODE = 0.6311142


def sum2s(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling window sum with Kahan-style error compensation.

    Vectorized equivalent of tsmp ``sum2s_rcpp`` (math.cpp:204-232): the
    reference slides a compensated accumulator; we get the same accuracy
    class by summing in extended precision via ``math.fsum``-free numpy:
    pairwise-summed window sums computed from a compensated cumulative sum.
    """
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    if w > n:
        raise ValueError(f"window {w} larger than series {n}")
    # Compensated (Kahan) cumulative sum keeps the error O(1) ulp like the
    # reference's running compensation, instead of O(n) for a plain cumsum.
    c = _kahan_cumsum(a)
    out = np.empty(n - w + 1, dtype=np.float64)
    out[0] = c[w - 1]
    out[1:] = c[w:] - c[: n - w]
    return out


def _kahan_cumsum(a: np.ndarray) -> np.ndarray:
    """Compensated cumsum. numpy's pairwise cumsum is already good; we add
    a float128 pass when available for long series (cheap, vectorized)."""
    if a.shape[0] >= 1 << 15 and hasattr(np, "float128"):
        return np.cumsum(a, dtype=np.float128).astype(np.float64)
    return np.cumsum(a, dtype=np.float64)


def muinvn(a: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling mean and stable inverse centered norm.

    Parity with tsmp ``muinvn_rcpp`` (math.cpp:234-253): returns
    ``(mu, sig)`` where ``mu[i] = mean(a[i:i+w])`` and
    ``sig[i] = 1 / sqrt(sum((a[i:i+w] - mu[i])**2))``.

    Windows with zero centered norm (constant window) get ``sig = inf``;
    callers mask them (tsmp leaves 1/0 = Inf the same way).
    """
    a = np.asarray(a, dtype=np.float64)
    mu = sum2s(a, w) / w
    # sum((x - mu)^2) = sum(x^2) - w*mu^2, but computed the stable way:
    # shift by the global mean first so squared terms stay small
    # (reference zero-mean shift rationale, misc.R:118-130).
    shift = float(a.mean()) if a.shape[0] else 0.0
    b = a - shift
    s2 = sum2s(b * b, w)
    s1 = sum2s(b, w)
    ssq = s2 - (s1 * s1) / w
    np.maximum(ssq, 0.0, out=ssq)
    with np.errstate(divide="ignore"):
        sig = 1.0 / np.sqrt(ssq)
    return mu, sig


def fast_avg_sd(a: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling mean and population SD over window ``w``.

    Parity with tsmp ``fast_avg_sd`` (misc.R:102-133): sd is the population
    SD (÷w). Zero-variance windows return sd = 0.
    """
    a = np.asarray(a, dtype=np.float64)
    mu = sum2s(a, w) / w
    shift = float(a.mean()) if a.shape[0] else 0.0
    b = a - shift
    s2 = sum2s(b * b, w)
    s1 = sum2s(b, w)
    var = (s2 - (s1 * s1) / w) / w
    np.maximum(var, 0.0, out=var)
    return mu, np.sqrt(var)


def movsum(a: np.ndarray, w: int) -> np.ndarray:
    """Plain rolling sum (tsmp misc.R:24-47 ``mov_sum``)."""
    return sum2s(a, w)


def movmean(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling mean (tsmp misc.R:60-66 ``mov_mean`` default method)."""
    return sum2s(a, w) / w


def movmin(a: np.ndarray, w: int) -> np.ndarray:
    """Sliding minimum with the reference's NaN semantics
    (windowfunc.cpp:18-56 + math.h:8 ``MIN``): NaN entries are SKIPPED
    (``(x)<(y) && (x)==(x)`` never selects a NaN), and a window whose
    running min never left the +Inf sentinel — all-NaN or all-+Inf —
    yields NaN (the ``min_res == R_PosInf ? NA`` line)."""
    return _sliding_extreme(a, w, np.minimum, np.inf)


def movmax(a: np.ndarray, w: int) -> np.ndarray:
    """Sliding maximum, NaN-skipping, all-NaN/-Inf window → NaN
    (windowfunc.cpp:59-97, the mirrored sentinel)."""
    return _sliding_extreme(a, w, np.maximum, -np.inf)


def _sliding_extreme(a: np.ndarray, w: int, op, sentinel: float) -> np.ndarray:
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    if w > n:
        raise ValueError(f"window {w} larger than series {n}")
    filled = np.where(np.isnan(a), sentinel, a)
    view = np.lib.stride_tricks.sliding_window_view(filled, w)
    out = op.reduce(view, axis=1)
    out[out == sentinel] = np.nan
    return out


def znorm(a: np.ndarray) -> np.ndarray:
    """Z-normalization with low-variance guard.

    Re-derives tsmp ``znorm_rcpp`` (math.cpp:132-142; misc.R:288-314):
    population SD; a degenerate series is only mean-centered. Deliberate
    deviation from the reference's absolute ``sd <= 0.01`` cutoff: the
    guard is the engine-wide scale-aware rule (:func:`lowvar_threshold`),
    so znorm agrees with every MP kernel on which inputs are degenerate
    (the reference's three guards disagree in the 1e-9..0.01 band).
    """
    a = np.asarray(a, dtype=np.float64)
    mu = a.mean()
    sd = a.std(ddof=0)
    if sd < lowvar_threshold(mu):
        return a - mu
    return (a - mu) / sd


def normalize(a: np.ndarray, lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    """Min-max scaling to [lo, hi] (tsmp misc.R:316-341)."""
    a = np.asarray(a, dtype=np.float64)
    amin, amax = np.nanmin(a), np.nanmax(a)
    if amax == amin:
        return np.full_like(a, lo)
    return (a - amin) / (amax - amin) * (hi - lo) + lo


def zero_one_norm(a: np.ndarray) -> np.ndarray:
    """(x - min) / (max - min) with NA guard (tsmp misc.R:990-1005)."""
    return normalize(a, 0.0, 1.0)


def ed_corr(d: np.ndarray, w: int) -> np.ndarray:
    """Euclidean distance → Pearson correlation (tsmp misc.R:77-84):
    ``corr = (2w - d^2) / (2w)``."""
    d = np.asarray(d, dtype=np.float64)
    return (2.0 * w - d * d) / (2.0 * w)


def corr_ed(c: np.ndarray, w: int) -> np.ndarray:
    """Pearson correlation → Euclidean distance (tsmp misc.R:86-91):
    ``d = sqrt(2w (1 - min(corr, 1)))``."""
    c = np.asarray(c, dtype=np.float64)
    return np.sqrt(2.0 * w * (1.0 - np.minimum(c, 1.0)))


def diff_lag(a: np.ndarray, lag: int = 1) -> np.ndarray:
    """Lagged difference (tsmp math.cpp:51-60)."""
    a = np.asarray(a, dtype=np.float64)
    return a[lag:] - a[:-lag]


def diff2_lag(a: np.ndarray, lag: int, v: float) -> np.ndarray:
    """Lagged difference with seed value prepended (tsmp math.cpp:62-72)."""
    a = np.asarray(a, dtype=np.float64)
    out = np.empty(a.shape[0] - lag + 1, dtype=np.float64)
    out[0] = v
    out[1:] = a[lag:] - a[:-lag]
    return out


def paa(a: np.ndarray, factor: int) -> np.ndarray:
    """Piecewise Aggregate Approximation (tsmp misc.R:463-486): mean of
    consecutive blocks of ``factor`` points; trailing partial block kept
    as the mean of its remainder."""
    a = np.asarray(a, dtype=np.float64)
    if factor <= 1:
        return a.copy()
    n = a.shape[0]
    full = (n // factor) * factor
    out = a[:full].reshape(-1, factor).mean(axis=1)
    if full < n:
        out = np.append(out, a[full:].mean())
    return out


def ipaa(a: np.ndarray, factor: int) -> np.ndarray:
    """Inverse PAA via step interpolation (tsmp misc.R:488-523)."""
    a = np.asarray(a, dtype=np.float64)
    if factor <= 1:
        return a.copy()
    return np.repeat(a, factor)


def zero_crossings(a: np.ndarray) -> int:
    """Count sign changes (tsmp misc.R:950-988)."""
    a = np.asarray(a, dtype=np.float64)
    s = np.signbit(a[a != 0.0])
    return int(np.count_nonzero(s[1:] != s[:-1]))


def complexity(a: np.ndarray) -> float:
    """Complexity-invariant distance estimate ``sqrt(sum(diff(x)^2))``
    (tsmp misc.R:1007-1022)."""
    a = np.asarray(a, dtype=np.float64)
    d = np.diff(a)
    return float(np.sqrt(np.dot(d, d)))


def mode(a: np.ndarray) -> float:
    """Most frequent value (tsmp misc.R:269-286; math.cpp:123-129)."""
    vals, counts = np.unique(np.asarray(a), return_counts=True)
    return float(vals[np.argmax(counts)])


def inner_product(a: np.ndarray, b: np.ndarray) -> float:
    """Dot product (tsmp math.cpp:190-195)."""
    return float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))


def sum_of_squares(a: np.ndarray) -> float:
    """Sum of squares (tsmp math.cpp:197-201)."""
    a = np.asarray(a, dtype=np.float64)
    return float(np.dot(a, a))


def r_round(x: float) -> int:
    """R ``round()`` — IEEE round-half-even (banker's rounding), which is
    what numpy's ``rint`` implements. Needed for exclusion-zone parity
    (stomp.R:86 ``round(window_size * exclusion_zone + eps)``)."""
    return int(np.rint(x))


def exclusion_zone_size(window_size: int, ez_frac: float) -> int:
    """Reference exclusion-zone rounding (stomp.R:86): round(w*ez + eps)."""
    return r_round(window_size * ez_frac + EPS)


def list_to_matrix(rows: list[np.ndarray]) -> np.ndarray:
    """Ragged list → zero-padded matrix (tsmp math.cpp:23-48)."""
    width = max(len(r) for r in rows)
    out = np.zeros((len(rows), width), dtype=np.float64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def binary_split(n: int) -> np.ndarray:
    """Bisection visit order over 1..n, first element first — the anytime
    window schedule of PMP (tsmp misc.R:373-426; math.cpp:145-187).
    Returns 0-based indexes."""
    if n < 2:
        return np.zeros(max(n, 0), dtype=np.int64)
    order = [0]
    # queue of (lo, hi) inclusive 0-based intervals
    from collections import deque

    q = deque([(1, n - 1)])
    while q:
        lo, hi = q.popleft()
        if lo > hi:
            continue
        mid = (lo + hi) // 2
        order.append(mid)
        q.append((lo, mid - 1))
        q.append((mid + 1, hi))
    return np.asarray(order, dtype=np.int64)
