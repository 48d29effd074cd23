"""Annotation vectors — user-guided reweighting of the matrix profile
(the reference's UDAF-like correction surface, SURVEY.md §2.10).

Re-derives tsmp annotations.R: ``av_complexity``, ``av_zerocrossing``,
``av_motion_artifact``, ``av_stop_word``, ``av_hardlimit_artifact`` and
``av_apply`` (``mp' = mp + (1 − av) · max(mp)``, annotations.R:322).
All operate on the z-normalized series like the reference.
"""

from __future__ import annotations

import numpy as np

from .stats import complexity, exclusion_zone_size, zero_crossings, zero_one_norm, znorm
from .stomp import MatrixProfile


def _windows(data: np.ndarray, w: int) -> np.ndarray:
    return np.lib.stride_tricks.sliding_window_view(np.asarray(data, np.float64), w)


def av_complexity(
    profile: MatrixProfile, data: np.ndarray | None = None, dilution_factor: float = 0.0
) -> np.ndarray:
    """Sliding complexity estimate, 0-1 normalized, optionally diluted
    (annotations.R:32-67)."""
    data = znorm(profile.data if data is None else data)
    wins = _windows(data, profile.w)[: profile.mp.shape[0]]
    d = np.diff(wins, axis=1)
    av = np.sqrt((d * d).sum(axis=1))
    av = zero_one_norm(av)
    av = (av + dilution_factor) / (dilution_factor + 1.0)
    return av


def av_zerocrossing(profile: MatrixProfile, data: np.ndarray | None = None) -> np.ndarray:
    """Zero crossings per window, 0-1 normalized (annotations.R:1-30)."""
    data = znorm(profile.data if data is None else data)
    wins = _windows(data, profile.w)[: profile.mp.shape[0]]
    av = np.array([zero_crossings(win) for win in wins], dtype=np.float64)
    return zero_one_norm(av)


def av_motion_artifact(profile: MatrixProfile, data: np.ndarray | None = None) -> np.ndarray:
    """Binary AV: 1 where window SD (sample SD, ÷(n−1) like stats::sd)
    is below the mean SD (annotations.R av_motion_artifact)."""
    data = znorm(profile.data if data is None else data)
    wins = _windows(data, profile.w)[: profile.mp.shape[0]]
    sd = wins.std(axis=1, ddof=1)
    return (sd < sd.mean()).astype(np.float64)


def av_hardlimit_artifact(profile: MatrixProfile, data: np.ndarray | None = None) -> np.ndarray:
    """1 − normalized count of samples pinned at the global min/max
    (clipping detector, annotations.R av_hardlimit_artifact)."""
    data = znorm(profile.data if data is None else data)
    wins = _windows(data, profile.w)[: profile.mp.shape[0]]
    hi, lo = data.max(), data.min()
    av = ((wins == hi) | (wins == lo)).sum(axis=1).astype(np.float64)
    return 1.0 - zero_one_norm(av)


def av_stop_word(
    profile: MatrixProfile,
    stop_word_loc: int,
    data: np.ndarray | None = None,
    exclusion_zone: float | None = None,
    threshold: float = 0.1,
) -> np.ndarray:
    """Suppress regions similar to a designated 'stop word' subsequence
    (annotations.R av_stop_word): ED to the stop window, 0-1 normalized;
    positions within ``threshold`` zero out their exclusion neighborhood."""
    data = znorm(profile.data if data is None else data)
    w = profile.w
    stop = data[stop_word_loc : stop_word_loc + w]
    wins = _windows(data, w)[: profile.mp.shape[0]]
    diff = wins - stop[None, :]
    av = zero_one_norm(np.sqrt((diff * diff).sum(axis=1)))
    # Reference-exact suppression (annotations.R:211-220): R uses the RAW
    # exclusion_zone value (defaulting to the FRACTIONAL .mp$ez, never
    # scaled by w) as an index distance, zeroing [i-ez+1, min(i+ez-1, n)]
    # (or from 1 when i < ez) through its colon operator + truncating
    # indexing. With the 0.5 default the fractional colon bounds descend
    # (i+0.5):(i-0.5) and truncate to exactly {i, i-1} — reproducing the
    # published golden (sum/sd = 1336.86 on mp_test_data,
    # test-annotation.R:41). A user-supplied integer ez widens the zeroed
    # neighborhood exactly as R does.
    ez = float(profile.ez if exclusion_zone is None else exclusion_zone)
    ps = av.shape[0]
    for idx in np.flatnonzero(av <= threshold):
        i = idx + 1.0  # R 1-based
        if i < ez:
            start, end = 1.0, min(i + ez - 1.0, float(ps))
        else:
            start, end = i - ez + 1.0, min(i + ez - 1.0, float(ps))
        # R colon: ±1 steps from start, floor(|end-start|)+1 values
        count = int(np.floor(abs(end - start))) + 1
        sign = 1.0 if start <= end else -1.0
        for k in range(count):
            j = int(start + sign * k)  # R truncating index
            if 1 <= j <= ps:
                av[j - 1] = 0.0
    return av


def av_apply(profile: MatrixProfile, av: np.ndarray) -> MatrixProfile:
    """mp' = mp + (1 − av) · max(mp) (annotations.R:322). Returns a new
    profile; Inf-masked entries stay Inf."""
    mp = profile.mp.copy()
    finite = np.isfinite(mp)
    if finite.any():
        mp[finite] = mp[finite] + (1.0 - av[finite]) * mp[finite].max()
    return MatrixProfile(
        mp=mp, pi=profile.pi.copy(), w=profile.w, ez=profile.ez,
        lmp=profile.lmp, lpi=profile.lpi, rmp=profile.rmp, rpi=profile.rpi,
        data=profile.data, join=profile.join, offset=profile.offset,
        algorithm=profile.algorithm + "+av",
    )
