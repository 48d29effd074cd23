"""SDTS — Scalable Dictionary learning for Time Series (weakly-labeled
pattern detection).

Re-derives tsmp sdts-train.R:48-355 / sdts-predict.R:39-187 /
misc.R:616-814 at the semantic level: candidate subsequences are drawn
from positively-labeled intervals; each candidate's detection threshold is
tuned by golden-section search maximizing F_beta against the weak labels
(misc.R:616-717 ``golden_section``); patterns are added greedily while the
combined F_beta improves (compute_f_meas, misc.R:719-814). Prediction
votes ``dist_profile(data, pattern) < threshold``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import dist_profile

_INVPHI = (np.sqrt(5.0) - 1.0) / 2.0


@dataclass
class SdtsModel:
    window_size: int
    patterns: list[np.ndarray] = field(default_factory=list)
    thresholds: list[float] = field(default_factory=list)
    score: float = 0.0


def f_beta(tp: int, fp: int, fn: int, beta: float = 1.0) -> float:
    denom = (1 + beta * beta) * tp + beta * beta * fn + fp
    return (1 + beta * beta) * tp / denom if denom > 0 else 0.0


def _label_intervals(labels: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous True runs in the weak-label vector."""
    lab = np.asarray(labels, dtype=bool)
    edges = np.flatnonzero(np.diff(np.concatenate(([0], lab.view(np.int8), [0]))))
    return [(int(edges[i]), int(edges[i + 1])) for i in range(0, len(edges), 2)]


def _score_hits(
    hits: np.ndarray, intervals: list[tuple[int, int]], w: int, n: int, beta: float
) -> float:
    """F_beta of detection positions vs labeled intervals: an interval is a
    TP if any hit starts inside it (±w slack); hits outside every interval
    are FPs; unmatched intervals are FNs (compute_f_meas semantics)."""
    tp = fn = 0
    used = np.zeros(hits.shape[0], dtype=bool)
    for lo, hi in intervals:
        inside = (hits >= lo - w) & (hits <= hi)
        if inside.any():
            tp += 1
            used |= inside
        else:
            fn += 1
    fp = int((~used).sum())
    return f_beta(tp, fp, fn, beta)


def _hits_below(dp: np.ndarray, thr: float, w: int) -> np.ndarray:
    """Detection starts: positions under threshold, de-bounced to one hit
    per w-neighborhood (greedy left-to-right)."""
    idx = np.flatnonzero(dp < thr)
    out = []
    last = -(10 * w)
    for i in idx:
        if i - last >= w:
            out.append(i)
            last = i
    return np.asarray(out, dtype=np.int64)


def golden_section_threshold(
    dp: np.ndarray,
    intervals: list[tuple[int, int]],
    w: int,
    n: int,
    beta: float = 1.0,
    iters: int = 30,
) -> tuple[float, float]:
    """Golden-section search over the threshold maximizing F_beta
    (misc.R:616-717). Returns (best_threshold, best_score)."""
    finite = dp[np.isfinite(dp)]
    if finite.shape[0] == 0:
        return 0.0, 0.0
    a, b = float(finite.min()), float(finite.max())
    c = b - _INVPHI * (b - a)
    d = a + _INVPHI * (b - a)

    def sc(t):
        return _score_hits(_hits_below(dp, t, w), intervals, w, n, beta)

    fc, fd = sc(c), sc(d)
    for _ in range(iters):
        if fc >= fd:
            b, d, fd = d, c, fc
            c = b - _INVPHI * (b - a)
            fc = sc(c)
        else:
            a, c, fc = c, d, fd
            d = a + _INVPHI * (b - a)
            fd = sc(d)
    t = (a + b) / 2.0
    best = sc(t)
    # widen to the upper edge of the optimal plateau: a threshold at the low
    # edge generalizes poorly (held-out occurrences sit just above it)
    grid = np.unique(np.quantile(finite, np.linspace(0.0, 1.0, 101)))
    for g in grid[grid > t]:
        if sc(g) >= best:
            t = float(g)
        else:
            break
    return t, best


def sdts_train(
    data: np.ndarray,
    labels: np.ndarray,
    window_size: int,
    n_candidates: int = 10,
    max_patterns: int = 3,
    beta: float = 1.0,
    seed: int = 42,
) -> SdtsModel:
    data = np.asarray(data, dtype=np.float64)
    labels = np.asarray(labels, dtype=bool)
    w = int(window_size)
    n = data.shape[0]
    intervals = _label_intervals(labels)
    if not intervals:
        raise ValueError("no positive intervals in labels")

    rng = np.random.default_rng(seed)
    cands: list[int] = []
    for lo, hi in intervals:
        if hi - lo >= w:
            k = max(1, n_candidates // len(intervals))
            starts = rng.integers(lo, max(hi - w, lo + 1), size=k)
            cands.extend(int(s) for s in starts)

    # per-candidate threshold + score
    scored = []
    par = None
    for c in cands:
        res = dist_profile(data, data, index=c, window_size=w, par=par)
        par = res.par
        dp = np.sqrt(np.maximum(res.distance_profile, 0.0))
        thr, sc = golden_section_threshold(dp, intervals, w, n, beta)
        scored.append((sc, thr, c, dp))
    scored.sort(key=lambda t: -t[0])

    # greedy pattern addition while combined score improves
    model = SdtsModel(window_size=w)
    best_hits: np.ndarray | None = None
    for sc, thr, c, dp in scored[:max_patterns * 3]:
        hits = _hits_below(dp, thr, w)
        combined = hits if best_hits is None else np.unique(np.concatenate([best_hits, hits]))
        comb_score = _score_hits(combined, intervals, w, n, beta)
        if comb_score > model.score:
            model.patterns.append(data[c : c + w].copy())
            model.thresholds.append(thr)
            model.score = comb_score
            best_hits = combined
        if len(model.patterns) >= max_patterns:
            break
    return model


def sdts_predict(model: SdtsModel, data: np.ndarray) -> np.ndarray:
    """Boolean detection vector: any pattern's distance profile under its
    threshold (sdts-predict.R:39-187)."""
    data = np.asarray(data, dtype=np.float64)
    w = model.window_size
    n = data.shape[0]
    out = np.zeros(n - w + 1, dtype=bool)
    for pat, thr in zip(model.patterns, model.thresholds):
        padded = np.concatenate([pat, np.zeros(max(0, n - pat.shape[0]))])
        res = dist_profile(data, padded, index=0, window_size=w)
        dp = np.sqrt(np.maximum(res.distance_profile, 0.0))
        out |= dp < thr
    return out


def sdts_score(
    predicted: np.ndarray, labels: np.ndarray, window_size: int, beta: float = 1.0
) -> float:
    """F_beta of predicted start positions vs labeled intervals."""
    hits = np.flatnonzero(predicted)
    # de-bounce
    hits = _hits_below(np.where(predicted, 0.0, np.inf), 0.5, window_size)
    intervals = _label_intervals(labels)
    return _score_hits(hits, intervals, window_size, len(labels), beta)
