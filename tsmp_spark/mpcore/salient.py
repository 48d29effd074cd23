"""Salient subsequences — MDL-based selection of the subsequence set that
best compresses the series.

Re-derives tsmp salient.R:44-356 + the discretization suite
(misc.R:851-1100) at the semantic level: candidates are profile minima in
ascending order with exclusion-zone suppression (get_sorted_idx,
misc.R:816-849); each round keeps the candidate whose dictionary encoding
saves the most bits (get_bit_save MDL, misc.R:1024-1057); stops when the
bit cost no longer improves.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import dist_profile
from .stats import exclusion_zone_size
from .stomp import MatrixProfile


def discrete_norm_pre(data: np.ndarray) -> tuple[float, float]:
    """Robust bounds for quantization (misc.R:866-913): mean ± 3·sd."""
    data = np.asarray(data, dtype=np.float64)
    mu, sd = data.mean(), data.std(ddof=0)
    return mu - 3.0 * sd, mu + 3.0 * sd

def discrete_norm(x: np.ndarray, n_bits: int, lo: float, hi: float) -> np.ndarray:
    """n-bit quantization to integer levels 1..2^n_bits (misc.R:915-948)."""
    x = np.clip(np.asarray(x, dtype=np.float64), lo, hi)
    levels = (1 << n_bits) - 1
    return np.rint((x - lo) / (hi - lo) * levels).astype(np.int64) + 1


def get_bitsize(x: np.ndarray, n_bits: int) -> float:
    """Bits to store the quantized vector raw (misc.R:851-864)."""
    return float(x.shape[0] * n_bits)


def get_bit_save(
    candidate: np.ndarray, hits: list[np.ndarray], n_bits: int
) -> float:
    """MDL bit save of encoding each hit as (pointer + sparse diff from
    the candidate) instead of raw (misc.R:1024-1057): saved bits =
    Σ_hits [raw − (log2(n_levels)·|nonzero diff| + pointer)]."""
    save = 0.0
    for h in hits:
        diff = h - candidate
        nz = int(np.count_nonzero(diff))
        raw = get_bitsize(h, n_bits)
        encoded = nz * (n_bits + np.log2(max(h.shape[0], 2))) + np.log2(
            max(h.shape[0], 2)
        )
        save += raw - encoded
    return save


@dataclass
class SalientResult:
    indexes: np.ndarray
    bit_save: np.ndarray
    n_bits: int


def sorted_candidate_idx(
    mp: np.ndarray, ez_n: int, limit: int | None = None
) -> np.ndarray:
    """Ascending-mp candidate order with exclusion suppression
    (misc.R:816-849)."""
    mp = mp.copy()
    n = mp.shape[0]
    out = []
    while limit is None or len(out) < limit:
        i = int(np.argmin(mp))
        if not np.isfinite(mp[i]):
            break
        out.append(i)
        mp[max(0, i - ez_n) : min(n, i + ez_n + 1)] = np.inf
    return np.asarray(out, dtype=np.int64)


def salient_subsequences(
    profile: MatrixProfile,
    data: np.ndarray | None = None,
    n_bits: int = 8,
    n_cand: int = 10,
    max_picks: int = 10,
) -> SalientResult:
    data = np.asarray(profile.data if data is None else data, dtype=np.float64)
    w = profile.w
    ez_n = exclusion_zone_size(w, profile.ez)
    lo, hi = discrete_norm_pre(data)

    cands = sorted_candidate_idx(profile.mp, ez_n, limit=n_cand * max_picks)
    picked: list[int] = []
    saves: list[float] = []
    par = None
    best_total = 0.0
    for c in cands[: n_cand * max_picks]:
        cand_q = discrete_norm(data[c : c + w], n_bits, lo, hi)
        # neighbors of the candidate = its compressible hits
        res = dist_profile(data, data, index=int(c), window_size=w, par=par)
        par = res.par
        dp = res.distance_profile.copy()
        dp[max(0, c - ez_n) : min(dp.shape[0], c + ez_n + 1)] = np.inf
        order = np.argsort(dp)
        save = 0.0
        for j in order[:5]:
            if not np.isfinite(dp[j]):
                break
            hit_q = discrete_norm(data[j : j + w], n_bits, lo, hi)
            # only compressible neighbors join the dictionary entry — an
            # incompressible window is cheaper stored raw (MDL choice)
            hit_save = get_bit_save(cand_q, [hit_q], n_bits)
            if hit_save > 0:
                save += hit_save
        if save <= 0:
            continue
        picked.append(int(c))
        saves.append(save)
        best_total += save
        if len(picked) >= max_picks:
            break
    return SalientResult(
        indexes=np.asarray(picked, dtype=np.int64),
        bit_save=np.asarray(saves),
        n_bits=n_bits,
    )
