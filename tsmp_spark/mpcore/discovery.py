"""Motif / discord / chain discovery on a computed matrix profile.

Re-derives tsmp find-motifs.R:30-168, find-discord.R:87-127,
find-chains.R:20-80 and the argmin validity walk ``min_mp_idx``
(misc.R:539-597). All indexes 0-based; neighbor queries re-run MASS against
the raw series exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import dist_profile
from .stats import EPS, exclusion_zone_size, lowvar_threshold
from .stomp import MatrixProfile


def _mask_degenerate(d: np.ndarray, par) -> None:
    """Engine-wide low-variance guard on a neighbor re-query profile:
    degenerate data windows have no defined z-norm distance — the raw
    MASS division yields junk that can be arbitrarily SMALL, stealing
    bounded neighbor slots from real positions (found by the
    const_prefix adversarial probe). The reference re-queries unguarded
    (find-motifs.R:120-147); this is the documented strengthening
    (stats.lowvar_threshold) applied to every kernel."""
    d[par.data_sd < lowvar_threshold(par.data_mean)] = np.inf


@dataclass
class MotifSet:
    motif_idx: list[np.ndarray] = field(default_factory=list)  # sorted pairs
    motif_neighbor: list[np.ndarray] = field(default_factory=list)
    motif_window: list[int] = field(default_factory=list)


@dataclass
class DiscordSet:
    discord_idx: list[int] = field(default_factory=list)
    discord_neighbor: list[np.ndarray] = field(default_factory=list)


def min_mp_idx(mp: np.ndarray, pi: np.ndarray) -> tuple[int, int] | None:
    """Global argmin with pair-validity walk (misc.R:539-597): skip minima
    whose recorded neighbor is itself masked/invalid."""
    mp = mp.copy()
    n = mp.shape[0]
    while True:
        i = int(np.argmin(mp))
        if not np.isfinite(mp[i]):
            return None
        j = int(pi[i])
        if 0 <= j < n and np.isfinite(mp[j]):
            return i, j
        mp[i] = np.inf


def find_motifs(
    profile: MatrixProfile,
    data: np.ndarray | None = None,
    n_motifs: int = 3,
    n_neighbors: int = 10,
    radius: float = 3.0,
    exclusion_zone: float | None = None,
) -> MotifSet:
    """Top-k motif pairs + neighbors (find-motifs.R:30-168):
    k × {argmin of mp, pair via pi, MASS re-query for neighbors within
    ``(dist·radius)²``, exclusion-zone suppression}."""
    data = np.asarray(profile.data if data is None else data, dtype=np.float64)
    mp = profile.mp.copy()
    pi = profile.pi
    w = profile.w
    n = mp.shape[0]
    ez = profile.ez if exclusion_zone is None else exclusion_zone
    ez_n = exclusion_zone_size(w, ez)

    out = MotifSet()
    par = None
    for _ in range(n_motifs):
        found = min_mp_idx(mp, pi)
        if found is None:
            break
        min_idx, nn_idx = found
        motif_distance = float(mp[min_idx])
        pair = np.sort(np.array([min_idx, nn_idx], dtype=np.int64))

        res = dist_profile(data, data, index=int(pair[0]), window_size=w, par=par)
        par = res.par
        d = res.distance_profile.copy()  # squared
        _mask_degenerate(d, par)
        d[d > (motif_distance * radius) ** 2] = np.inf
        for m in pair:
            d[max(0, m - ez_n) : min(n, m + ez_n + 1)] = np.inf

        order = np.argsort(d, kind="stable")
        neighbors: list[int] = []
        dead = np.zeros(n, dtype=bool)
        for cand in order:
            if len(neighbors) >= n_neighbors or not np.isfinite(d[cand]):
                break
            if dead[cand]:
                continue
            neighbors.append(int(cand))
            lo = max(0, cand - ez_n + 1)
            hi = min(n, cand + ez_n)
            dead[lo:hi] = True  # |x - cand| < ez suppression (find-motifs.R:141-143)

        out.motif_idx.append(pair)
        out.motif_neighbor.append(np.asarray(neighbors, dtype=np.int64))
        out.motif_window.append(w)

        for m in np.concatenate([pair, np.asarray(neighbors, dtype=np.int64)]):
            mp[max(0, m - ez_n) : min(n, m + ez_n + 1)] = np.inf
    return out


def find_motifs_valmod(
    result,
    data: np.ndarray,
    n_motifs: int = 3,
    n_neighbors: int = 10,
    radius: float = 3.0,
    exclusion_zone: float | None = None,
) -> MotifSet:
    """Variable-length motif pairs on a VALMOD profile
    (find-motifs.R:35-160, the ``valmod`` branches).

    Differences from the fixed-window walk, all reference-faithful:
    the exclusion zone is a PER-POSITION vector ``round(w[i]·ez + eps)``
    (w varies by winning window); the neighbor re-query slides the window
    of the picked position's winning length from ``min_idx`` (not the
    sorted pair head); and the squared distance profile is scaled by
    ``sqrt(1/w)`` BEFORE the ``(dist·radius)²`` threshold — mixing
    squared/linear scales exactly as find-motifs.R:108-113 does, which
    usually empties the neighbor set (reproduced: the shipped
    motif_valmod-print golden has ``neighbors = [] [] []``)."""
    from .stats import EPS

    data = np.asarray(data, dtype=np.float64).ravel()
    mp = np.array(result.mp, dtype=np.float64, copy=True)
    pi = result.pi
    w_vec = np.asarray(result.w, dtype=np.int64)
    n = mp.shape[0]
    ez = result.ez if exclusion_zone is None else exclusion_zone
    ez_vec = np.rint(w_vec * ez + EPS).astype(np.int64)

    out = MotifSet()
    for _ in range(n_motifs):
        found = min_mp_idx(mp, pi)
        if found is None:
            break
        min_idx, nn_idx = found
        motif_distance = float(mp[min_idx])
        pair = np.sort(np.array([min_idx, nn_idx], dtype=np.int64))
        window = int(w_vec[min_idx])
        e_zone = int(ez_vec[min_idx])

        res = dist_profile(data, data, index=min_idx, window_size=window)
        d = res.distance_profile * np.sqrt(1.0 / window)
        d = d.copy()
        _mask_degenerate(d, res.par)
        d[d > (motif_distance * radius) ** 2] = np.inf
        dn = d.shape[0]
        for m in pair:
            d[max(0, m - e_zone) : min(dn, m + e_zone + 1)] = np.inf

        order = np.argsort(d, kind="stable")
        neighbors: list[int] = []
        dead = np.zeros(dn, dtype=bool)
        for cand in order:
            if len(neighbors) >= n_neighbors or not np.isfinite(d[cand]):
                break
            if dead[cand]:
                continue
            neighbors.append(int(cand))
            lo = max(0, cand - e_zone + 1)
            hi = min(dn, cand + e_zone)
            dead[lo:hi] = True

        out.motif_idx.append(pair)
        out.motif_neighbor.append(np.asarray(neighbors, dtype=np.int64))
        out.motif_window.append(window)

        for m in np.concatenate([pair, np.asarray(neighbors, dtype=np.int64)]):
            mp[max(0, m - e_zone) : min(n, m + e_zone + 1)] = np.inf
    return out


def find_discords(
    profile: MatrixProfile,
    data: np.ndarray | None = None,
    n_discords: int = 1,
    n_neighbors: int = 3,
    radius: float = 3.0,
    exclusion_zone: float | None = None,
) -> DiscordSet:
    """Top-k discords (find-discord.R:60-127): k × global argmax +
    neighbor scan + suppression with -inf."""
    data = np.asarray(profile.data if data is None else data, dtype=np.float64)
    mp = profile.mp.copy()
    mp[~np.isfinite(mp)] = -np.inf  # masked positions can't be discords
    w = profile.w
    n = mp.shape[0]
    ez = profile.ez if exclusion_zone is None else exclusion_zone
    ez_n = exclusion_zone_size(w, ez)

    out = DiscordSet()
    par = None
    for _ in range(n_discords):
        idx = int(np.argmax(mp))
        if not np.isfinite(mp[idx]):
            break
        discord_distance = float(mp[idx])
        res = dist_profile(data, data, index=idx, window_size=w, par=par)
        par = res.par
        d = res.distance_profile.copy()
        _mask_degenerate(d, par)
        d[d > (discord_distance * radius) ** 2] = np.inf
        d[max(0, idx - ez_n) : min(n, idx + ez_n + 1)] = np.inf

        order = np.argsort(d, kind="stable")
        neighbors: list[int] = []
        dead = np.zeros(n, dtype=bool)
        for cand in order:
            if len(neighbors) >= n_neighbors or not np.isfinite(d[cand]):
                break
            if dead[cand]:
                continue
            neighbors.append(int(cand))
            lo = max(0, cand - ez_n + 1)
            hi = min(n, cand + ez_n)
            dead[lo:hi] = True

        out.discord_idx.append(idx)
        out.discord_neighbor.append(np.asarray(neighbors, dtype=np.int64))
        for m in [idx, *neighbors]:
            mp[max(0, m - ez_n) : min(n, m + ez_n + 1)] = -np.inf
    return out


def find_chains(profile: MatrixProfile) -> tuple[list[np.ndarray], np.ndarray | None]:
    """Time-series chains (find-chains.R:20-80): follow ``rpi`` while the
    backward link agrees (``lpi[rpi[j]] == j``); keep chains longer than 2;
    best = longest with smallest mean rmp."""
    rpi, lpi, rmp = profile.rpi, profile.lpi, profile.rmp
    assert rpi is not None and lpi is not None and rmp is not None
    n = rpi.shape[0]
    chain_length = np.ones(n, dtype=np.int64)
    chains: list[np.ndarray] = []
    for i in range(n):
        if chain_length[i] != 1:
            continue
        chain = [i]
        j = i
        while 0 <= rpi[j] < n and lpi[rpi[j]] == j:
            j = int(rpi[j])
            chain_length[j] = -1
            chain_length[i] += 1
            chain.append(j)
        if len(chain) > 2:
            chains.append(np.asarray(chain, dtype=np.int64))
    if not chains:
        return [], None
    l = max(len(c) for c in chains)
    best, best_mean = None, np.inf
    for c in chains:
        if len(c) == l:
            vals = rmp[c]
            vals = vals[np.isfinite(vals)]
            m = float(vals.mean()) if vals.shape[0] else np.inf
            if m < best_mean:
                best_mean = m
                best = c
    return chains, best


def min_mp_idx_multi(
    mp2d: np.ndarray, pi2d: np.ndarray, n_dim: int | None = None
) -> np.ndarray | None:
    """Multidimensional argmin-with-validity-walk (misc.R:539-597): per
    k-dim-profile column, the global minimum and its recorded neighbor;
    minima whose neighbor is masked/invalid are poisoned and re-searched.
    ``n_dim`` selects a single column (1-based like the reference).
    Returns an (n_cols, 2) array of 0-based (idx, neighbor) or None."""
    mp = mp2d[:, [n_dim - 1]] if n_dim else mp2d
    pi = pi2d[:, [n_dim - 1]] if n_dim else pi2d
    mp = np.array(mp, dtype=np.float64, copy=True)
    m, d = mp.shape
    while True:
        mins = np.nanargmin(np.where(np.isfinite(mp), mp, np.inf), axis=0)
        if any(mins[c] == 0 and not np.isfinite(mp[0, c]) for c in range(d)):
            return None
        if not np.isfinite(mp[mins, np.arange(d)]).all():
            return None
        nn = np.array([pi[mins[c], c] for c in range(d)], dtype=np.int64)
        if ((nn >= 0) & (nn < m)).all() and np.isfinite(
            mp[nn, np.arange(d)]
        ).all():
            return np.stack([mins.astype(np.int64), nn], axis=1)
        mp[mins, np.arange(d)] = np.inf


def _mdl_discretize(motif: np.ndarray, n_bit: int) -> np.ndarray:
    """misc.R:1059-1087 discretization by normal-quantile split points."""
    from statistics import NormalDist

    m = np.array(motif, dtype=np.float64, copy=True)
    for c in range(m.shape[1]):
        mu = m[:, c].mean()
        sd = float(np.std(m[:, c]))  # population SD (tsmp std, math.cpp:4-20)
        m[:, c] = (m[:, c] - mu) / (sd if sd > 0 else 1.0)
    splits = np.array(
        [NormalDist().inv_cdf(q / 2.0**n_bit) for q in range(1, 2**n_bit)]
    )
    disc = np.zeros(m.shape, dtype=np.int64)
    for i, sp in enumerate(splits, start=1):
        disc[(m < sp) & (disc == 0)] = i
    disc[disc == 0] = splits.shape[0] + 1
    return disc


def _bit_save_multi(
    motif_1: np.ndarray, motif_2: np.ndarray, n_dim: int, n_bit: int
) -> tuple[float, np.ndarray]:
    """misc.R:1024-1048: MDL bit size of encoding the pair over its best
    ``n_dim`` dimensions; returns (bit_sz, 0-based dim ids)."""
    tot_dim = motif_1.shape[1]
    w = motif_1.shape[0]
    d1 = _mdl_discretize(motif_1, n_bit)
    d2 = _mdl_discretize(motif_2, n_bit)
    order = np.argsort(np.abs(d1 - d2).sum(axis=0), kind="stable")
    dim_id = order[:n_dim]
    diff = d1[:, dim_id] - d2[:, dim_id]
    n_val = np.unique(diff).shape[0]
    bit_sz = n_bit * (tot_dim * w * 2 - n_dim * w)
    bit_sz += n_dim * w * np.log2(n_val) + n_val * n_bit
    return float(bit_sz), dim_id


def find_motifs_multi(
    profile,
    data: np.ndarray | None = None,
    n_motifs: int = 3,
    mode: str = "guided",
    n_bit: int = 4,
    n_dim: int | None = None,
    exclusion_zone: float | None = None,
) -> MotifSet:
    """Multidimensional motif discovery (find-motifs.R:186-352).

    ``guided``: the pair at the minimum of the ``n_dim``-dim profile
    column; dimensions ranked by the pair's per-dimension discrepancy.
    ``unconstrained`` (R mode "u"): iterative MDL search — per candidate
    pair the bit cost of encoding it over its best j dimensions, stop when
    the best cost exceeds the raw encoding (n_bit·dims·w·2)."""
    data = np.asarray(profile.data if data is None else data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    if data.shape[0] < data.shape[1]:
        data = data.T
    w = profile.w
    out = MotifSet()

    if mode.startswith("g"):
        k = n_dim or profile.n_dim
        found = min_mp_idx_multi(profile.mp, profile.pi, n_dim=k)
        if found is None:
            return out
        pair = np.sort(found[0])
        m1 = data[pair[0] : pair[0] + w, :]
        m2 = data[pair[1] : pair[1] + w, :]
        order = np.argsort(np.abs(m1 - m2).sum(axis=0), kind="stable")
        out.motif_idx.append(pair)
        out.motif_window.append(np.sort(order[:k]))  # motif_dim (0-based)
        return out

    # unconstrained
    ez = profile.ez if exclusion_zone is None else exclusion_zone
    ez_n = exclusion_zone_size(w, ez)
    tot_dim = profile.n_dim
    mp = np.array(profile.mp, dtype=np.float64, copy=True)
    base_bit = n_bit * tot_dim * w * 2
    n = mp.shape[0]
    for _ in range(n_motifs):
        found = min_mp_idx_multi(mp, profile.pi)
        if found is None:
            break
        vals = mp[found[:, 0], np.arange(found.shape[0])]
        if not np.isfinite(vals).all():
            break
        best_bit, best_j, best_dims = np.inf, -1, None
        for j in range(tot_dim):
            i1, i2 = int(found[j, 0]), int(found[j, 1])
            bits, dims = _bit_save_multi(
                data[i1 : i1 + w, :], data[i2 : i2 + w, :], j + 1, n_bit
            )
            if bits < best_bit:
                best_bit, best_j, best_dims = bits, j, dims
        if best_bit > base_bit:
            break
        pair = np.sort(found[best_j])
        out.motif_idx.append(pair)
        out.motif_window.append(np.sort(best_dims))
        for p in pair:
            mp[max(0, p - ez_n) : min(n, p + ez_n + 1), :] = np.inf
    return out
