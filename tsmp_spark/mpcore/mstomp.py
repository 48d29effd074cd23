"""mSTOMP — multidimensional matrix profile.

Re-derives tsmp mstomp.R:59-320: per-dimension STOMP recurrences, per-row
sort of squared distances across dimensions, cumulative mean → the k-dim
profile for every k, with must/exclude dimension masks and left/right
profiles. Distances stay squared until the final sqrt (mstomp.R:262-264).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mass import dist_profile
from .stats import exclusion_zone_size, lowvar_threshold


@dataclass
class MultiMatrixProfile:
    mp: np.ndarray  # (plen, n_dim) — column k-1 = best k-dim profile
    pi: np.ndarray
    lmp: np.ndarray
    lpi: np.ndarray
    rmp: np.ndarray
    rpi: np.ndarray
    w: int
    ez: float
    n_dim: int
    must: list[int]
    exc: list[int]


def mstomp(
    data: np.ndarray,
    window_size: int,
    exclusion_zone: float = 0.5,
    must_dim: list[int] | None = None,
    exc_dim: list[int] | None = None,
) -> MultiMatrixProfile:
    """``data``: (n, n_dim) matrix, one column per dimension. 0-based
    must/exc dimension indexes."""
    data = np.atleast_2d(np.asarray(data, dtype=np.float64))
    if data.shape[0] < data.shape[1]:
        data = data.T  # wide → tall (mstomp.R:66-96)
    n, n_dim = data.shape
    w = int(window_size)
    ez_n = exclusion_zone_size(w, exclusion_zone)
    plen = n - w + 1

    must = sorted(must_dim or [])
    exc = sorted(exc_dim or [])
    n_must, n_exc = len(must), len(exc)
    if set(must) & set(exc):
        raise ValueError("must_dim and exc_dim overlap")

    # skip locations across any dimension (mstomp.R:124-136)
    bad = ~np.isfinite(data).all(axis=1)
    csum = np.concatenate(([0], np.cumsum(bad)))
    skip = (csum[w:] - csum[:plen]) > 0
    a = np.nan_to_num(data)

    # per-dim precompute
    first_product = np.empty((plen, n_dim))
    data_mean = np.empty((plen, n_dim))
    data_sd = np.empty((plen, n_dim))
    nn0 = []
    for j in range(n_dim):
        nn = dist_profile(a[:, j], a[:, j], index=0, window_size=w)
        nn0.append(nn)
        first_product[:, j] = nn.last_product
        data_mean[:, j] = nn.par.data_mean
        data_sd[:, j] = nn.par.data_sd
    data_thr = lowvar_threshold(data_mean)

    mp = np.full((plen, n_dim), np.inf)
    pi = np.full((plen, n_dim), -1, dtype=np.int64)
    lmp = np.full((plen, n_dim), np.inf)
    lpi = np.full((plen, n_dim), -1, dtype=np.int64)
    rmp = np.full((plen, n_dim), np.inf)
    rpi = np.full((plen, n_dim), -1, dtype=np.int64)

    dp = np.empty((plen, n_dim))
    last_product = np.empty((plen, n_dim))
    drop = np.zeros(n_dim)

    mask_exc = np.zeros(n_dim, dtype=bool)
    mask_exc[exc] = True

    for i in range(plen):
        qwin_last = a[i + w - 1, :]
        if i == 0:
            for j in range(n_dim):
                dp[:, j] = nn0[j].distance_profile
                last_product[:, j] = nn0[j].last_product
        else:
            last_product[1:plen, :] = (
                last_product[0 : plen - 1, :]
                - a[0 : plen - 1, :] * drop[None, :]
                + a[w:n, :] * qwin_last[None, :]
            )
            last_product[0, :] = first_product[i, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                dp[:, :] = 2.0 * (
                    w
                    - (last_product - w * data_mean * data_mean[i][None, :])
                    / (data_sd * data_sd[i][None, :])
                )
        drop = a[i, :].copy()

        d = dp.copy()
        d[max(0, i - ez_n) : min(plen, i + ez_n + 1), :] = np.inf
        d[data_sd < data_thr] = np.inf
        if skip[i] or np.any(data_sd[i, ~mask_exc] < data_thr[i, ~mask_exc]):
            d[:, :] = np.inf
        d[skip, :] = np.inf
        d[:, exc] = np.inf

        if n_must > 0:
            dist_must = d[:, must].copy()
            d[:, must] = -np.inf

        d_sort = np.sort(d, axis=1) if n_dim > 1 else d
        if n_must > 0:
            d_sort[:, :n_must] = dist_must

        cum = np.zeros(plen)
        for k in range(max(1, n_must), n_dim - n_exc + 1):
            cum = cum + d_sort[:, k - 1]
            merged = cum / k
            col = k - 1
            # left (mstomp.R:238-244): best among positions <= i - ez
            if i > ez_n:
                m_idx = int(np.argmin(merged[: i - ez_n]))
                lmp[i, col] = merged[m_idx]
                lpi[i, col] = m_idx
            # right: best among positions >= i + ez
            if i < plen - ez_n - 1:
                seg = merged[i + ez_n :]
                m_idx = int(np.argmin(seg)) + i + ez_n
                rmp[i, col] = merged[m_idx]
                rpi[i, col] = m_idx
            m_idx = int(np.argmin(merged))
            mp[i, col] = merged[m_idx]
            pi[i, col] = m_idx if np.isfinite(merged[m_idx]) else -1

    with np.errstate(invalid="ignore"):
        mp = np.sqrt(mp)
        lmp = np.sqrt(lmp)
        rmp = np.sqrt(rmp)

    # invalid k columns → NaN (mstomp.R:267-287)
    if n_must > 1:
        mp[:, : n_must - 1] = np.nan
        lmp[:, : n_must - 1] = np.nan
        rmp[:, : n_must - 1] = np.nan
        pi[:, : n_must - 1] = -1
    if n_exc > 0:
        mp[:, n_dim - n_exc :] = np.nan
        lmp[:, n_dim - n_exc :] = np.nan
        rmp[:, n_dim - n_exc :] = np.nan
        pi[:, n_dim - n_exc :] = -1

    return MultiMatrixProfile(
        mp=mp, pi=pi, lmp=lmp, lpi=lpi, rmp=rmp, rpi=rpi,
        w=w, ez=exclusion_zone, n_dim=n_dim, must=must, exc=exc,
    )
