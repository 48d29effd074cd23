"""Salient subsequences — MDL-based selection of the subsequence set that
best compresses the series.

Faithful re-derivation of salient.R:44-356 and its discretization suite:
``discrete_norm_pre`` (misc.R:866-900: sliding-znorm global max/min),
``discrete_norm`` (misc.R:915-932: znorm → [min,max] scale → n-bit
levels 1..2^n), ``get_bitsize`` (misc.R:851-855: nonzero count ×
mismatch bits), ``get_sorted_idx`` (misc.R:816-849: ascending-mp order
with exclusion dedup on the first n candidates). The main loop keeps a
hypothesis dictionary and a compressible set: each round every candidate
is scored both as a new hypothesis (vs its profile pair) and as
compressible against the existing dictionary; the better role wins, the
pick's exclusion zone is masked, and the running description length
(compress + hypothesis + raw-other cost) is recorded. Golden-tested
against the reference's published values on its own data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stats import EPS, exclusion_zone_size, lowvar_threshold
from .stomp import MatrixProfile


@dataclass
class SalientResult:
    indexes: np.ndarray  # (k,) for one n_bits, (k, len(n_bits)) for several
    bit_save: np.ndarray  # running description length per pick (idx_bit_size)
    n_bits: int | list[int]


def discrete_norm_pre(
    data: np.ndarray, window_size: int = 1
) -> tuple[float, float]:
    """Global (max, min) over all sliding znormed windows (misc.R:866-900)."""
    data = np.asarray(data, dtype=np.float64).ravel()
    n = data.shape[0]
    mx, mn = -np.inf, np.inf
    for i in range(n - window_size + 1):
        win = data[i : i + window_size]
        mu = win.mean()
        sd = float(np.std(win))  # population SD (tsmp std, math.cpp:4-20)
        # engine-wide lowvar rule (stats.lowvar_threshold): below the
        # scale-aware threshold the quotient is cancellation noise —
        # use the centered residual, as znorm does (misc.R:288-314's
        # absolute 0.01 guard strengthened; real .rda data never enters
        # the band, goldens unchanged)
        win = (win - mu) / sd if sd >= lowvar_threshold(mu) else (win - mu)
        mx = max(mx, float(win.max()))
        mn = min(mn, float(win.min()))
    return mx, mn


def discrete_norm(
    data: np.ndarray, n_bits: int, mx: float, mn: float
) -> np.ndarray:
    """znorm → scale to [mn, mx] → n-bit integer levels (misc.R:915-932)."""
    x = np.asarray(data, dtype=np.float64)
    mu = x.mean()
    sd = float(np.std(x))
    # engine-wide lowvar rule — see discrete_norm_pre
    x = (x - mu) / sd if sd >= lowvar_threshold(mu) else (x - mu)
    x = (x - mn) / (mx - mn)
    return (np.rint(x * (2.0**n_bits - 1.0) + EPS) + 1.0).astype(np.int64)


def get_bitsize(x: np.ndarray, mismatch_bit: float) -> float:
    """Reduced description length (misc.R:851-855)."""
    return float(np.count_nonzero(np.asarray(x)) * mismatch_bit)


def get_sorted_idx(
    mp: np.ndarray, n_cand: int, exclusion_zone: int = 0
) -> np.ndarray:
    """Ascending-mp candidate order, exclusion-dedup applied to the first
    ``n_cand`` entries, infinite entries dropped (misc.R:816-849)."""
    mp = np.asarray(mp, dtype=np.float64)
    idx = np.argsort(mp, kind="stable")
    if exclusion_zone > 0:
        i = 0
        idx = list(idx)
        while i < min(n_cand, len(idx)):
            head = idx[: i + 1]
            tail = [j for j in idx[i + 1 :] if abs(j - idx[i]) >= exclusion_zone]
            idx = head + tail
            i += 1
        idx = np.asarray(idx, dtype=np.int64)
    idx = idx[np.isfinite(mp[idx])]
    return idx[: min(n_cand, idx.shape[0])]


#: back-compat alias for the pre-faithful name
def sorted_candidate_idx(
    mp: np.ndarray, ez_n: int, limit: int | None = None
) -> np.ndarray:
    return get_sorted_idx(mp, limit or mp.shape[0], ez_n)


def _salient_one(
    profile: MatrixProfile,
    data: np.ndarray,
    n_bits: int,
    n_cand: int,
    ez_n: int,
    max_index_num: int,
    mx: float,
    mn: float,
) -> tuple[list[int], list[float]]:
    """One n_bits pass of salient.R:122-317 (1-dim branch)."""
    w = profile.w
    mp = np.array(profile.mp, dtype=np.float64, copy=True)
    mp_size = mp.shape[0]
    uncompressed_bit = n_bits * w
    mismatch_bit = n_bits + np.log2(w)

    indexes: list[int] = []
    idx_bit_size: list[float] = []
    hypothesis: list[np.ndarray] = []
    compressible_n = 0
    compress_cost = 0.0
    pending: tuple[str, int] | None = None  # role, idx of the newest pick
    init_bit = uncompressed_bit * mp_size

    while True:
        # process the newest pick (salient.R:165-230)
        if pending is not None:
            role, p = pending
            win = discrete_norm(data[p : p + w], n_bits, mx, mn)
            mp[max(0, p - ez_n) : min(mp_size, p + ez_n + 1)] = np.inf
            if role == "hypothesis":
                hypothesis.append(win)
                if len(indexes) > 1:
                    idx_bit_size.append(idx_bit_size[-1])
                else:
                    idx_bit_size.append(init_bit)
            else:
                compressible_n += 1
                new_len = np.inf
                for h in hypothesis:
                    new_len = min(new_len, get_bitsize(win - h, mismatch_bit))
                compress_cost += new_len
                hyp_cost = uncompressed_bit * len(hypothesis) + (
                    compressible_n * np.log2(len(hypothesis))
                    if hypothesis
                    else 0.0
                )
                other = uncompressed_bit * (
                    mp_size - len(hypothesis) - compressible_n
                )
                idx_bit_size.append(compress_cost + hyp_cost + other)
            pending = None

        if len(indexes) >= max_index_num:
            break

        cands = get_sorted_idx(mp, n_cand, ez_n)
        if cands.shape[0] == 0:
            break

        best_save, best_i, best_role = -np.inf, -1, "hypothesis"
        for c in cands:
            can = discrete_norm(data[c : c + w], n_bits, mx, mn)
            pair = int(profile.pi[c])
            save_h = -np.inf
            if 0 <= pair <= data.shape[0] - w:
                motif = discrete_norm(data[pair : pair + w], n_bits, mx, mn)
                save_h = uncompressed_bit - get_bitsize(motif - can, mismatch_bit)
            save_c = -np.inf
            if hypothesis:
                new_len = min(
                    get_bitsize(can - h, mismatch_bit) for h in hypothesis
                )
                save_c = uncompressed_bit - new_len
            if save_h > save_c:
                save, role = save_h, "hypothesis"
            else:
                save, role = save_c, "compressible"
            if save > best_save:
                best_save, best_i, best_role = save, int(c), role

        indexes.append(best_i)
        pending = (best_role, best_i)

    return indexes, idx_bit_size


def salient_subsequences(
    profile: MatrixProfile,
    data: np.ndarray | None = None,
    n_bits: int | list[int] = 8,
    n_cand: int = 10,
    exclusion_zone: float | None = None,
    max_picks: int | None = None,
) -> SalientResult:
    """salient.R:44-356 (1-dim branch): MDL hypothesis/compressible
    selection per requested bit width. ``max_picks`` caps the index count
    below the reference's ``round(n/w)`` default."""
    data = np.asarray(profile.data if data is None else data, dtype=np.float64).ravel()
    w = profile.w
    ez = profile.ez if exclusion_zone is None else exclusion_zone
    ez_n = int(np.rint(w * ez + EPS))
    max_index_num = int(np.rint(data.shape[0] / w + EPS))
    if max_picks is not None:
        max_index_num = min(max_index_num, max_picks)
    mx, mn = discrete_norm_pre(data, w)

    bits_list = [n_bits] if isinstance(n_bits, int) else list(n_bits)
    all_idx, all_bits = [], []
    for b in bits_list:
        idxs, sizes = _salient_one(
            profile, data, int(b), n_cand, ez_n, max_index_num, mx, mn
        )
        all_idx.append(np.asarray(idxs, dtype=np.int64))
        all_bits.append(np.asarray(sizes, dtype=np.float64))

    if isinstance(n_bits, int):
        return SalientResult(indexes=all_idx[0], bit_save=all_bits[0], n_bits=n_bits)
    k = min(a.shape[0] for a in all_idx)
    return SalientResult(
        indexes=np.stack([a[:k] for a in all_idx], axis=1),
        bit_save=np.stack([a[:k] for a in all_bits], axis=1),
        n_bits=bits_list,
    )
