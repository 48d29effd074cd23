"""MASS — Mueen's Algorithm for Similarity Search (z-normalized distance
profiles via FFT convolution).

Re-derives tsmp's mass stack: ``mass_pre`` (mass-pre.R:32-75), ``mass_v2``
(mass_v2.R:45-59), ``mass_v3`` batched variant (mass_v3.R:49-110),
``mass_weighted`` (mass_weighted.R:45-72, mass-pre-w.R:37-91) and the
``dist_profile`` dispatcher (dist_profile.R:69-180) as numpy.

All distance profiles are *squared* z-normalized Euclidean distances until
the caller takes sqrt — matching the reference, which squares/sqrts at the
edges (stomp.R:173-174).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .stats import EPS, fast_avg_sd


@dataclass
class MassPre:
    """Precomputed per-(data, w) state reused across query indexes —
    the reference caches exactly this (mass-pre.R:32-75)."""

    data_fft: np.ndarray
    data_size: int
    data_mean: np.ndarray
    data_sd: np.ndarray
    window_size: int
    pad: int
    # weighted variant extras (mass-pre-w.R:37-91)
    data_pre: np.ndarray | None = None
    weight: np.ndarray | None = None
    sumw: float = 0.0
    # query-side stats filled by dist_profile for recursion reuse
    query_mean: np.ndarray = field(default_factory=lambda: np.empty(0))
    query_sd: np.ndarray = field(default_factory=lambda: np.empty(0))


def _next_pow2(n: int) -> int:
    return 1 << int(np.ceil(np.log2(n)))


def mass_pre(data: np.ndarray, window_size: int) -> MassPre:
    """Precompute rolling stats + padded FFT of data (mass-pre.R:32-75).

    The reference zero-pads to the next power of two before the FFT
    (mass-pre.R:46-48); we keep that — pow2 rfft is fastest in numpy too.
    """
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]
    pad = _next_pow2(n)
    data_fft = np.fft.rfft(data, pad)
    data_mean, data_sd = fast_avg_sd(data, window_size)
    return MassPre(
        data_fft=data_fft,
        data_size=n,
        data_mean=data_mean,
        data_sd=data_sd,
        window_size=window_size,
        pad=pad,
    )


def mass_v2(
    pre: MassPre, query_window: np.ndarray, query_mean: float, query_sd: float
) -> tuple[np.ndarray, np.ndarray]:
    """One z-normalized squared distance profile + last dot products.

    Parity with mass_v2.R:45-59:
    ``z = IFFT(FFT(data) * FFT(rev(query)))``,
    ``dp = 2 (w - (z - w μ_d μ_q) / (σ_d σ_q))``.

    Returns ``(dp_squared, last_product)``.
    """
    w = pre.window_size
    rev = np.zeros(pre.pad, dtype=np.float64)
    rev[:w] = query_window[::-1]
    z = np.fft.irfft(pre.data_fft * np.fft.rfft(rev), pre.pad)
    last_product = z[w - 1 : pre.data_size]
    with np.errstate(divide="ignore", invalid="ignore"):
        dp = 2.0 * (
            w - (last_product - w * pre.data_mean * query_mean) / (pre.data_sd * query_sd)
        )
    return dp, last_product


def mass_v3(
    data: np.ndarray,
    query_window: np.ndarray,
    window_size: int,
    data_mean: np.ndarray,
    data_sd: np.ndarray,
    query_mean: float,
    query_sd: float,
    k: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Piecewise/batched MASS (mass_v3.R:49-110).

    Processes data in chunks of ``k`` (hardware-friendly in the reference;
    kept for algorithmic parity and bounded FFT memory on very long
    series). Must produce the same profile as mass_v2.
    """
    data = np.asarray(data, dtype=np.float64)
    w = window_size
    n = data.shape[0]
    profile_len = n - w + 1
    # auto-shrink rules (mass_v3.R:53-66): k pow2, >= w, <= n
    k = max(_next_pow2(w), min(_next_pow2(k), _next_pow2(n)))
    dp = np.empty(profile_len, dtype=np.float64)
    lp = np.empty(profile_len, dtype=np.float64)
    rev = query_window[::-1]
    qf_cache: dict[int, np.ndarray] = {}

    start = 0
    while start < profile_len:
        seg_end = min(start + k - w + 1, profile_len)  # profiles produced
        data_end = min(start + k, n)
        size = data_end - start
        pad = _next_pow2(size)
        qf = qf_cache.get(pad)
        if qf is None:
            buf = np.zeros(pad, dtype=np.float64)
            buf[:w] = rev
            qf = np.fft.rfft(buf)
            qf_cache[pad] = qf
        z = np.fft.irfft(np.fft.rfft(data[start:data_end], pad) * qf, pad)
        prod = z[w - 1 : size]
        cnt = seg_end - start
        lp[start:seg_end] = prod[:cnt]
        start = seg_end
    with np.errstate(divide="ignore", invalid="ignore"):
        dp = 2.0 * (w - (lp - w * data_mean * query_mean) / (data_sd * query_sd))
    return dp, lp


def mass_pre_weighted(
    data: np.ndarray, window_size: int, weight: np.ndarray
) -> MassPre:
    """Weighted precompute (mass-pre-w.R:37-91): FFTs of weight and of
    weight·x² against data, producing the constant term ``data_pre``."""
    data = np.asarray(data, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    w = window_size
    n = data.shape[0]
    pad = _next_pow2(n)
    data_fft = np.fft.rfft(data, pad)
    data_mean, data_sd = fast_avg_sd(data, w)

    rev_w = np.zeros(pad, dtype=np.float64)
    rev_w[:w] = weight[::-1]
    w_fft = np.fft.rfft(rev_w)

    # sum_k weight[k] * ((data[i+k]-mu_i)/sd_i)^2 expanded into three
    # convolutions: with x^2, with x, and the plain weight sum.
    d2_fft = np.fft.rfft(data * data, pad)
    conv_x2 = np.fft.irfft(d2_fft * w_fft, pad)[w - 1 : n]
    conv_x = np.fft.irfft(data_fft * w_fft, pad)[w - 1 : n]
    sumw = float(weight.sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        data_pre = (
            conv_x2 - 2.0 * data_mean * conv_x + sumw * data_mean * data_mean
        ) / (data_sd * data_sd)
    pre = MassPre(
        data_fft=data_fft,
        data_size=n,
        data_mean=data_mean,
        data_sd=data_sd,
        window_size=w,
        pad=pad,
        data_pre=data_pre,
        weight=weight,
        sumw=sumw,
    )
    return pre


def mass_weighted(
    pre: MassPre, query_window: np.ndarray, query_mean: float, query_sd: float
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted z-normalized squared distance profile (mass_weighted.R:45-72).

    ``dp = data_pre - 2 (last - sumwy μ_d) / σ_d + sumwy2`` with the query
    z-normalized then weighted.
    """
    w = pre.window_size
    weight = pre.weight
    assert weight is not None and pre.data_pre is not None
    q = (np.asarray(query_window, np.float64) - query_mean) / query_sd
    wy = weight * q
    sumwy = float(wy.sum())
    sumwy2 = float(np.dot(wy, q))
    rev = np.zeros(pre.pad, dtype=np.float64)
    rev[:w] = wy[::-1]
    z = np.fft.irfft(pre.data_fft * np.fft.rfft(rev), pre.pad)
    last_product = z[w - 1 : pre.data_size]
    with np.errstate(divide="ignore", invalid="ignore"):
        dp = (
            pre.data_pre
            - 2.0 * (last_product - sumwy * pre.data_mean) / pre.data_sd
            + sumwy2
        )
    return dp, last_product


@dataclass
class DistProfileResult:
    """Return shape of dist_profile (dist_profile.R:69-180): the squared
    distance profile, last dot products, and the reusable parameter cache."""

    distance_profile: np.ndarray  # SQUARED distances (reference convention)
    last_product: np.ndarray
    par: MassPre


def dist_profile(
    data: np.ndarray,
    query: np.ndarray,
    index: int = 0,
    window_size: int | None = None,
    method: str = "v2",
    weight: np.ndarray | None = None,
    paa_factor: int = 1,
    par: MassPre | None = None,
    gap_mode: str = "reference",
) -> DistProfileResult:
    """Unified distance-profile entry point (dist_profile.R:69-180).

    ``query[index : index+w]`` is slid over ``data``. Passing ``par`` from a
    previous call reuses all data-side precomputation (dist_profile.R:153-171
    ``nn$par`` recursion). A query window containing one NA run is split in
    two sub-queries and recombined (dist_profile.R:101-141, "Query with Gap").
    """
    data = np.asarray(data, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    if window_size is None:
        if par is None:
            raise ValueError("window_size required when par not given")
        window_size = par.window_size
    w = window_size

    if par is None:
        if method == "weighted":
            if weight is None:
                raise ValueError("weighted MASS needs a weight vector")
            par = mass_pre_weighted(data, w, weight)
        else:
            par = mass_pre(data, w)
        qm, qs = fast_avg_sd(np.nan_to_num(query), w)
        par.query_mean, par.query_sd = qm, qs

    qwin = query[index : index + w]
    nan_mask = ~np.isfinite(qwin)
    if nan_mask.any() and method != "weighted":
        return _gap_profile(data, qwin, nan_mask, par, mode=gap_mode)

    qm = float(par.query_mean[index])
    qs = float(par.query_sd[index])

    if method == "v3":
        dp, lp = mass_v3(
            data, qwin, w, par.data_mean, par.data_sd, qm, qs
        )
    elif method == "weighted":
        dp, lp = mass_weighted(par, qwin, qm, qs)
    else:
        dp, lp = mass_v2(par, qwin, qm, qs)
    return DistProfileResult(distance_profile=dp, last_product=lp, par=par)


def _gap_profile(
    data: np.ndarray,
    qwin: np.ndarray,
    nan_mask: np.ndarray,
    par: MassPre,
    mode: str = "reference",
) -> DistProfileResult:
    """Query-with-gap (dist_profile.R:101-141): split the query at the NA
    run, MASS per segment, combine ``(sqrt(dp1) + sqrt(dp2))^2``.

    ``mode="reference"`` (default) replicates the R alignment EXACTLY,
    including its quirk: result2 is left-padded with ``max_idx - 1`` Infs
    (dist_profile.R:135-137), which pairs the q2 profile at data position
    ``i - (max_idx-1)`` with q1 at ``i`` — q2 is matched BEHIND q1, not
    ahead where it occurs in the query. Output length is
    ``(n - len(q2) + 1) + max_idx - 1`` with Inf at the unmatched head/
    tail, and the published golden sum(round(dp[21:541],2)) == 38257.03 on
    toy data reproduces bit-for-bit. ``mode="aligned"`` keeps the
    mathematically-aligned variant (each segment matched at its true
    offset inside the query) for engine use."""
    w = par.window_size
    idx = np.flatnonzero(nan_mask)
    lo, hi = int(idx[0]), int(idx[-1])
    n = par.data_size
    seg1 = qwin[:lo] if lo >= 4 else np.empty(0)
    seg2 = qwin[hi + 1 : w] if (hi + 2) <= w - 4 else np.empty(0)

    def seg_dp(seg):
        spre = mass_pre(data, seg.shape[0])
        dp, _ = mass_v2(spre, seg, float(seg.mean()), float(seg.std(ddof=0)))
        return np.sqrt(np.clip(dp, 0.0, None))

    if mode == "reference":
        pad = hi + 1  # R's max_idx - 1
        r1 = seg_dp(seg1) if seg1.shape[0] else np.empty(0)
        r2 = seg_dp(seg2) if seg2.shape[0] else np.empty(0)
        r2 = np.concatenate([np.full(pad, np.inf), r2])
        if r1.shape[0] > r2.shape[0]:
            # R errors here too (rep(Inf, negative) in dist_profile.R:137)
            raise ValueError(
                "gap query: segment after the NA run is too short "
                "(needs >= 4 points and max_idx <= window_size - 4)"
            )
        if r1.shape[0] < r2.shape[0]:
            r1 = np.concatenate([r1, np.full(r2.shape[0] - r1.shape[0], np.inf)])
        out = (r1 + r2) ** 2
        return DistProfileResult(out, np.zeros_like(out), par)

    out = np.full(n - w + 1, np.inf)
    parts = []
    for seg, offset in ((seg1, 0), (seg2, hi + 1)):
        if seg.shape[0] < 2:
            continue
        parts.append((seg_dp(seg) ** 2, offset, seg.shape[0]))
    if not parts:
        return DistProfileResult(out, np.zeros_like(out), par)
    combined = np.zeros(n - w + 1)
    for dp, offset, sw in parts:
        aligned = np.clip(dp[offset : offset + n - w + 1], 0.0, None)
        combined = combined + np.sqrt(aligned[: n - w + 1])
    out = combined * combined
    return DistProfileResult(out, np.zeros_like(out), par)
