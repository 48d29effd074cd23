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
from .stats import EPS, exclusion_zone_size
from .stomp import MatrixProfile


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
