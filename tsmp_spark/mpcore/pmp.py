"""Pan-Matrix Profile — profiles over a range of windows, with the
upper-bound window search and anytime binary-split schedule.

Re-derives tsmp pmp.R:52-227 (dict keyed by window, binary_split order
173-183) and pmp_upper_bound (pmp.R:262-350: double the window from 8
until max Pearson correlation < threshold, then refine downward in 25%
steps). In Spark the per-window jobs fan out as a (series × window) grid
(plans.compute.pan_matrix_profile); this module is the exact per-series
kernel + the window-selection logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mpx import mpx
from .stats import binary_split, ed_corr, exclusion_zone_size


@dataclass
class PMP:
    pmp: dict[int, np.ndarray] = field(default_factory=dict)
    pmpi: dict[int, np.ndarray] = field(default_factory=dict)
    windows: list[int] = field(default_factory=list)
    upper_window: int | None = None
    ez: float = 0.5


def pmp(
    data: np.ndarray,
    windows: list[int],
    exclusion_zone: float = 0.5,
) -> PMP:
    """Profiles for every requested window, computed in binary-split
    (anytime) order — partial interruption leaves balanced coverage."""
    data = np.asarray(data, dtype=np.float64)
    out = PMP(ez=exclusion_zone)
    ws = sorted(set(int(w) for w in windows))
    order = binary_split(len(ws))
    for k in order:
        w = ws[int(k)]
        ez_n = exclusion_zone_size(w, exclusion_zone)
        if data.shape[0] < w + ez_n + 1:
            continue
        r = mpx(data, w, minlag=ez_n + 1)
        out.pmp[w] = r.mp
        out.pmpi[w] = r.pi
        out.windows.append(w)
    out.windows.sort()
    return out


def pmp_upper_bound(
    data: np.ndarray,
    threshold: float = 0.95,
    refine_stepsize: float = 0.25,
    exclusion_zone: float = 0.5,
) -> int:
    """Upper window bound — exact pmp.R:262-350 trace: double w from 8
    while the max Pearson correlation stays >= threshold; once a doubling
    fails, test refine windows ``2*round((frac+1)*w/4)`` for frac in
    (step, 2*step, ...), each APPENDED before its threshold check (the
    first failing refine window therefore still raises the bound — R's
    ``upper_window = max(windows)`` semantics, reproduced golden:
    toy data @ 0.98 -> 20)."""
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]

    def max_corr(w: int) -> float:
        ez_n = exclusion_zone_size(w, exclusion_zone)
        if n < w + ez_n + 1:
            return -1.0
        r = mpx(data, w, minlag=ez_n + 1)
        finite = r.mp[np.isfinite(r.mp)]
        if finite.shape[0] == 0:
            return -1.0
        return float(min(ed_corr(finite.min(), w), 1.0))

    windows: list[int] = []
    w = 8
    max_window = n // 2
    while w <= max_window:
        if max_corr(w) < threshold:
            break
        windows.append(w)
        w *= 2

    if w <= max_window:
        fracs = np.arange(refine_stepsize, 1.0 - 1e-5, refine_stepsize)
        for frac in fracs:
            tw = int(2.0 * np.round((frac + 1.0) * w / 4.0))
            windows.append(tw)
            if max_corr(tw) < threshold:
                break
    return max(windows) if windows else 8
