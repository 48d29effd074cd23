"""SDTS — Scalable Dictionary learning for Time Series (weak labels).

Faithful re-derivation of sdts-train.R:48-355, sdts-predict.R:39-187 and
the search helpers misc.R:616-814 (``golden_section``,
``golden_section_2``, ``compute_f_meas``): candidate subsequences come
from the matrix profile of the Inf-separated concatenation of positive
segments; each candidate gets a golden-section-optimal distance
threshold; patterns are then added greedily, re-optimizing all selected
thresholds (coordinate descent in reverse order) until the combined
F-beta score stops improving. Golden-tested against the reference's
published values on mp_test_data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import dist_profile
from .stomp import stomp

_GOLDEN = (1.0 + np.sqrt(5.0)) / 2.0


@dataclass
class SdtsModel:
    patterns: list = field(default_factory=list)
    thold: np.ndarray = None
    score: float = 0.0
    score_hist: np.ndarray = None


def _label_runs(label: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ld = np.diff(np.concatenate([[0], label.astype(np.int64), [0]]))
    st = np.flatnonzero(ld == 1)
    ed = np.flatnonzero(ld == -1) - 1
    return st, ed


def _anno_starts(bin_: np.ndarray) -> np.ndarray:
    return np.flatnonzero(np.diff(np.concatenate([[0], bin_, [0]])) == 1)


def _dedup_starts(anno_st: np.ndarray, window_size: int) -> np.ndarray:
    """The iterative min-separation walk of compute_f_meas / sdts_predict."""
    anno_st = list(np.sort(anno_st))
    i = 0
    while i < len(anno_st) - 1:
        head = anno_st[: i + 1]
        tail = [s for s in anno_st[i + 1 :] if abs(s - anno_st[i]) >= window_size]
        anno_st = head + tail
        i += 1
    return np.asarray(anno_st, dtype=np.int64)


def compute_f_meas(label, pos_st, pos_ed, dist_pro, thold, window_size, beta):
    """misc.R:719-814 — F-beta of the thresholded annotation curve(s)."""
    n = label.shape[0]
    if isinstance(dist_pro, list):
        starts = [
            _anno_starts((dp - th < 0).astype(np.int64))
            for dp, th in zip(dist_pro, thold)
        ]
        anno_st = _dedup_starts(
            np.concatenate(starts) if starts else np.empty(0, np.int64), window_size
        )
    else:
        anno_st = _anno_starts((dist_pro - thold < 0).astype(np.int64))
    anno_ed = anno_st + window_size - 1

    anno = np.zeros(n, dtype=bool)
    for s, e in zip(anno_st, np.minimum(anno_ed, n - 1)):
        anno[s : e + 1] = True

    tp_pre = sum(
        1
        for s, e in zip(anno_st, np.minimum(anno_ed, n - 1))
        if label[s : e + 1].sum() > 0.8 * window_size
    )
    tp_rec = sum(
        1
        for s, e in zip(pos_st, pos_ed)
        if anno[s : e + 1].sum() > 0.8 * window_size
    )
    pre = tp_pre / anno_st.shape[0] if anno_st.shape[0] else np.nan
    rec = tp_rec / pos_st.shape[0] if pos_st.shape[0] else np.nan
    denom = (beta**2) * pre + rec
    f = (1 + beta**2) * (pre * rec) / denom if denom else np.nan
    if not np.isfinite(f):
        f = 0.0
    return float(f), pre, rec


def golden_section(dist_pro, label, pos_st, pos_ed, beta, window_size):
    """misc.R:616-645 — golden-section search of the single threshold."""
    a = float(np.min(dist_pro))
    finite = dist_pro[np.isfinite(dist_pro)]
    b = float(np.max(finite)) if finite.shape[0] else np.nan
    c = b - (b - a) / _GOLDEN
    d = a + (b - a) / _GOLDEN
    tol = max((b - a) * 0.001, 0.0001)
    if np.isnan(c) or np.isnan(d) or np.isnan(tol):
        return np.nan, 0.0
    while abs(c - d) > tol:
        cs, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, c, window_size, beta)
        ds, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, d, window_size, beta)
        if cs > ds:
            b = d
        else:
            a = c
        c = b - (b - a) / _GOLDEN
        d = a + (b - a) / _GOLDEN
    th = (a + b) * 0.5
    sc, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, th, window_size, beta)
    return th, sc


def golden_section_2(dist_pro, thold, label, pos_st, pos_ed, beta, window_size, k):
    """misc.R:666-717 — re-optimize threshold ``k`` of the combined set."""
    dp = dist_pro[k]
    a = float(np.min(dp))
    finite = dp[np.isfinite(dp)]
    b = float(np.max(finite)) if finite.shape[0] else np.nan
    c = b - (b - a) / _GOLDEN
    d = a + (b - a) / _GOLDEN
    tol = max((b - a) * 0.001, 0.0001)
    thold = np.array(thold, dtype=np.float64, copy=True)
    if np.isnan(c) or np.isnan(d) or np.isnan(tol):
        return thold, 0.0
    while abs(c - d) > tol:
        tc = thold.copy()
        tc[k] = c
        td = thold.copy()
        td[k] = d
        cs, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, tc, window_size, beta)
        ds, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, td, window_size, beta)
        if cs > ds:
            b = d
        else:
            a = c
        c = b - (b - a) / _GOLDEN
        d = a + (b - a) / _GOLDEN
    thold[k] = (a + b) * 0.5
    sc, _, _ = compute_f_meas(label, pos_st, pos_ed, dist_pro, thold, window_size, beta)
    return thold, sc


def _signif(x: np.ndarray, digits: int) -> np.ndarray:
    out = np.array(x, dtype=np.float64, copy=True)
    nz = (out != 0) & np.isfinite(out)
    mag = np.floor(np.log10(np.abs(out[nz])))
    factor = 10.0 ** (digits - 1 - mag)
    out[nz] = np.rint(out[nz] * factor) / factor
    return out


def sdts_train(
    data: np.ndarray,
    label: np.ndarray,
    window_size,
    beta: float = 1.0,
    pat_max: float = np.inf,
) -> SdtsModel:
    """sdts-train.R:48-355, exact trace (see module docstring)."""
    data = np.asarray(data, dtype=np.float64).ravel()
    label = np.asarray(label).astype(bool)
    windows = [int(window_size)] if np.isscalar(window_size) else [int(w) for w in window_size]
    n_w = len(windows)
    for w in windows:
        if w > data.shape[0] / 2:
            raise ValueError("Time series is too short relative to desired window size.")
        if w < 4:
            raise ValueError("`window_size` must be at least 4.")

    pos_st, pos_ed = _label_runs(label)
    n_pos = pos_st.shape[0]

    # Inf-separated concatenation of the positive segments
    parts = []
    for s, e in zip(pos_st, pos_ed):
        parts.append(np.array([np.inf]))
        parts.append(data[s : e + 1])
    pos = np.concatenate(parts)
    inf_at = np.flatnonzero(~np.isfinite(pos))
    seg_st = inf_at + 1  # 0-based start of each segment in pos
    seg_ed = np.concatenate([inf_at[1:] - 1, [pos.shape[0] - 1]])

    # stage 1: matrix profile per window on the concatenation
    mats = [stomp(pos, w).mp for w in windows]

    # stage 2a: best candidate per (window, segment)
    candi, candi_idx = [], []
    for i, w in enumerate(windows):
        st_cl = np.minimum(seg_st, pos.shape[0] - w)  # pos_alt_st clamp
        cw, ci, cd = [], [], []
        for j in range(n_pos):
            lo = st_cl[j]
            hi = max(lo, seg_ed[j] - w + 1)
            temp = mats[i][lo : hi + 1]
            rlt = int(np.argmin(temp))
            cd.append(float(temp[rlt]))
            alt = lo + rlt
            cw.append(pos[alt : alt + w])
            ci.append(int(pos_st[j] + rlt))
        order = np.argsort(cd, kind="stable")
        candi.extend([cw[o] for o in order])
        candi_idx.extend([ci[o] for o in order])
    candi_ws = np.concatenate([[w] * n_pos for w in windows]).astype(np.int64)

    # stage 2b: per-candidate threshold + score
    candi_pro, candi_thold, candi_score = [], [], []
    for k in range(n_pos * n_w):
        w = int(candi_ws[k])
        dp = np.sqrt(
            np.clip(
                dist_profile(data, candi[k], window_size=w).distance_profile, 0.0, None
            )
        )
        st = max(0, candi_idx[k] - w)
        ed = min(dp.shape[0] - 1, candi_idx[k] + w)
        dp[st : ed + 1] = np.inf
        candi_pro.append(dp)
        th, sc = golden_section(dp, label, pos_st, pos_ed, beta, w)
        candi_thold.append(th)
        candi_score.append(sc)
    candi_thold = np.asarray(candi_thold, dtype=np.float64)
    candi_score = np.asarray(candi_score, dtype=np.float64)

    order = np.argsort(-_signif(candi_score, 6), kind="stable")
    candi_score = candi_score[order]
    candi_thold = candi_thold[order]
    candi_idx = np.asarray(candi_idx, dtype=np.int64)[order]
    candi_ws = candi_ws[order]
    candi_pro = [candi_pro[o] for o in order]
    candi = [candi[o] for o in order]

    pat_max = int(min(pat_max, n_pos // 2))
    if pat_max < 2:
        return SdtsModel(
            patterns=[candi[0]],
            thold=np.array([candi_thold[0]]),
            score=float(candi_score[0]),
            score_hist=np.array([candi_score[0]]),
        )

    # stage 3: greedy combination with coordinate-descent re-optimization
    n_c = n_pos * n_w
    max_w = max(windows)
    max_pro_len = data.shape[0] - min(windows) + 1
    best_pat = np.zeros(n_c, dtype=bool)
    best_score = -np.inf
    exc_mask = np.zeros(max_pro_len, dtype=bool)
    score_hist = np.full(n_c, np.inf)

    for it in range(pat_max):
        pat_score = np.full(n_c, -np.inf)
        thold_cur: dict[int, np.ndarray] = {}
        exc_st = np.zeros(n_c, dtype=np.int64)
        exc_ed = np.zeros(n_c, dtype=np.int64)
        # sdts-train.R:253 copies exc_mask into exc_mask_cur once per outer
        # iteration; candidate zones are set/unset on the COPY only (R:268,316)
        # so accepted zones on exc_mask stay pristine.  R's within-iteration
        # quirk — an unset that overlaps an accepted zone erases those bits in
        # the copy for later candidates of the same iteration — is preserved.
        exc_cur = exc_mask.copy()
        for j in range(n_c):
            if best_pat[j]:
                continue
            sel = best_pat.copy()
            sel[j] = True
            exc_st[j] = max(0, candi_idx[j] - max_w)
            exc_ed[j] = min(max_pro_len - 1, candi_idx[j] + max_w)
            exc_cur[exc_st[j] : exc_ed[j] + 1] = True

            pro_cur = [candi_pro[k].copy() for k in np.flatnonzero(sel)]
            pro_max, pro_min = -np.inf, np.inf
            for p in pro_cur:
                fin = p[np.isfinite(p)]
                if fin.shape[0]:
                    pro_max = max(pro_max, float(fin.max()))
                pro_min = min(pro_min, float(p.min()))
                m = exc_cur[: p.shape[0]]
                p[m] = np.inf

            th = candi_thold[sel].astype(np.float64)
            ws_sel = candi_ws[sel]
            score = 0.0
            for _ in range(200):
                th_old = th.copy()
                for k in range(len(th) - 1, -1, -1):
                    th, score = golden_section_2(
                        pro_cur, th, label, pos_st, pos_ed, beta, int(ws_sel[k]), k
                    )
                if not np.isnan(th).any() and np.isfinite(pro_max) and np.isfinite(pro_min):
                    if float(np.mean(th - th_old)) < (pro_max - pro_min) * 0.001:
                        break
            thold_cur[j] = th
            pat_score[j] = score
            exc_cur[exc_st[j] : exc_ed[j] + 1] = False

        best_j = int(np.argmax(pat_score))
        if pat_score[best_j] - best_score > 0:
            score_hist[it] = pat_score[best_j]
            best_score = float(pat_score[best_j])
            best_pat[best_j] = True
            candi_thold[best_pat] = thold_cur[best_j]
            exc_mask[exc_st[best_j] : exc_ed[best_j] + 1] = True
        else:
            break

    score_hist = score_hist[np.isfinite(score_hist)]
    return SdtsModel(
        patterns=[candi[k] for k in np.flatnonzero(best_pat)],
        thold=candi_thold[best_pat],
        score=best_score,
        score_hist=score_hist,
    )


def sdts_predict(
    model: SdtsModel, data: np.ndarray, window_size: int | None = None
) -> np.ndarray:
    """sdts-predict.R:39-86: threshold each pattern's distance profile
    (strict <, unlike training's golden search), merge starts with the
    min-separation walk, emit a boolean prediction of length n - w + 1."""
    data = np.asarray(data, dtype=np.float64).ravel()
    if window_size is None:
        window_size = int(np.rint(np.mean([p.shape[0] for p in model.patterns])))
    starts = []
    for p, th in zip(model.patterns, model.thold):
        dp = np.sqrt(
            np.clip(
                dist_profile(data, p, window_size=p.shape[0]).distance_profile,
                0.0,
                None,
            )
        )
        starts.append(_anno_starts((dp - th < 0).astype(np.int64)))
    anno_st = _dedup_starts(
        np.concatenate(starts) if starts else np.empty(0, np.int64), window_size
    )
    out_len = data.shape[0] - window_size + 1
    pred = np.zeros(max(out_len, 0), dtype=bool)
    for s in anno_st:
        pred[s : s + window_size] = True
    return pred[:out_len]


def sdts_score(pred: np.ndarray, gtruth: np.ndarray, beta: float = 1.0) -> dict:
    """sdts-predict.R:124-187: segment-level F-beta with the modal
    predicted-segment length as the 80% overlap yardstick."""
    from .stats import mode

    pred = np.asarray(pred).astype(bool)
    gtruth = np.asarray(gtruth).astype(bool)
    if pred.shape[0] > gtruth.shape[0]:
        pred = pred[: gtruth.shape[0]]
    elif pred.shape[0] < gtruth.shape[0]:
        tmp = np.zeros(gtruth.shape[0], dtype=bool)
        tmp[: pred.shape[0]] = pred
        pred = tmp

    p_st, p_ed = _label_runs(pred)
    k = min(p_st.shape[0], p_ed.shape[0])
    p_st, p_ed = p_st[:k], p_ed[:k]
    sub_len = mode((p_ed - p_st + 1).astype(np.float64)) if k else 0.0

    tp_pre = sum(
        1
        for s, e in zip(p_st, np.minimum(p_ed, gtruth.shape[0] - 1))
        if gtruth[s : e + 1].sum() > 0.8 * sub_len
    )
    g_st, g_ed = _label_runs(gtruth)
    tp_rec = sum(
        1
        for s, e in zip(g_st, g_ed)
        if pred[s : min(e, pred.shape[0] - 1) + 1].sum() > 0.8 * sub_len
    )
    pre = tp_pre / k if k else np.nan
    rec = tp_rec / g_st.shape[0] if g_st.shape[0] else np.nan
    denom = (beta**2) * pre + rec
    f = (1 + beta**2) * (pre * rec) / denom if denom else np.nan
    return {
        "f_score": float(f) if np.isfinite(f) else 0.0,
        "precision": float(pre) if np.isfinite(pre) else 0.0,
        "recall": float(rec) if np.isfinite(rec) else 0.0,
    }
