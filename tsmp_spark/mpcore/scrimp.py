"""SCRIMP++ — anytime matrix profile via randomly-ordered diagonal sweeps,
optionally seeded by the PRE-SCRIMP sampled-anchor refinement pass.

Re-derives tsmp scrimp.R:49-341 (PRE-SCRIMP anchors 178-259, SCRIMP random
diagonals 277-331) in 0-based vectorized numpy. Exclusion semantics match
STOMP: diagonals with offset difference <= ez_n are never visited
(scrimp.R:134 ``order > exclusion_zone + 1``).
"""

from __future__ import annotations

import numpy as np

from .mass import dist_profile
from .stats import EPS, exclusion_zone_size, lowvar_threshold
from .stomp import MatrixProfile, _skip_locations


def scrimp(
    data: np.ndarray,
    window_size: int,
    exclusion_zone: float = 0.5,
    s_size: float = 1.0,
    pre_scrimp: float = 0.25,
    seed: int | None = None,
) -> MatrixProfile:
    """SCRIMP++ self-join. ``s_size`` = fraction of diagonals visited
    (anytime budget, scrimp.R:137-140); ``pre_scrimp`` = anchor step as a
    fraction of ``w`` (0 disables the PRE pass)."""
    data = np.asarray(data, dtype=np.float64)
    w = int(window_size)
    if w < 4:
        raise ValueError("`window_size` must be at least 4")
    ez_n = exclusion_zone_size(w, exclusion_zone)
    n = data.shape[0]
    plen = n - w + 1

    skip = _skip_locations(data, w)
    a = np.nan_to_num(data)

    nn = dist_profile(a, a, index=0, window_size=w)
    mu, sd = nn.par.data_mean, nn.par.data_sd
    sd_thr = lowvar_threshold(mu)

    mp = np.full(plen, np.inf)
    pi = np.full(plen, -1, dtype=np.int64)
    lmp = np.full(plen, np.inf)
    lpi = np.full(plen, -1, dtype=np.int64)
    rmp = np.full(plen, np.inf)
    rpi = np.full(plen, -1, dtype=np.int64)

    rng = np.random.default_rng(seed)

    # ---- PRE-SCRIMP (scrimp.R:178-259): sampled anchors, MASS profile,
    # then cumsum dot-product refinement around (anchor, nn) both ways.
    if pre_scrimp > 0:
        step = int(np.floor(w * pre_scrimp + EPS))
        step = max(step, 1)
        anchors = np.arange(1, plen, step, dtype=np.int64)
        for i in anchors:
            res = dist_profile(a, a, index=int(i), window_size=w, par=nn.par)
            d = np.sqrt(np.maximum(res.distance_profile, 0.0))
            d[max(0, i - ez_n) : min(plen, i + ez_n + 1)] = np.inf
            d[sd < sd_thr] = np.inf
            if skip[i] or sd[i] < sd_thr[i]:
                d[:] = np.inf
            d[skip] = np.inf

            upd = d < mp
            mp[upd] = d[upd]
            pi[upd] = i
            j = int(np.argmin(d))
            if not np.isfinite(d[j]):
                continue
            mp[i] = d[j]
            pi[i] = j

            # refine along the diagonal through (i, j): dotproduct at the
            # anchor recovered from the distance (scrimp.R:216-218)
            diff = j - i
            dot_i = (w - mp[i] ** 2 / 2.0) * sd[i] * sd[j] + w * mu[i] * mu[j]

            # forward: dot[k+1] = dot[k] + a[k+w]·a[k+diff+w] − a[k]·a[k+diff]
            endidx = min(plen - 1, i + step - 1, plen - 1 - diff)
            if endidx > i:
                ks = np.arange(i + 1, endidx + 1)
                inc = a[ks + w - 1] * a[ks + diff + w - 1] - a[ks - 1] * a[ks + diff - 1]
                dots = dot_i + np.cumsum(inc)
                _refine_merge(mp, pi, _diag_dist(dots, ks, diff, w, mu, sd), ks, diff)

            # backward: dot[k] = dot[k+1] + a[k]·a[k+diff] − a[k+w]·a[k+diff+w]
            beginidx = max(0, i - step + 1, -diff)
            if beginidx < i:
                ks = np.arange(beginidx, i)  # ascending
                t = a[ks] * a[ks + diff] - a[ks + w] * a[ks + diff + w]
                dots = dot_i + np.cumsum(t[::-1])  # k = i-1, i-2, ...
                dots = dots[::-1]  # back to ascending k
                _refine_merge(mp, pi, _diag_dist(dots, ks, diff, w, mu, sd), ks, diff)

    # ---- SCRIMP diagonals (scrimp.R:277-331)
    diags = np.arange(ez_n + 1, plen, dtype=np.int64)
    ssize = max(1, int(np.ceil(diags.shape[0] * s_size))) if diags.shape[0] else 0
    if s_size < 1.0:
        diags = rng.permutation(diags)[:ssize]

    for d in diags:
        L = plen - d
        z0 = float(np.dot(a[0:w], a[d : d + w]))
        if L > 1:
            inc = a[w : w + L - 1] * a[d + w : d + w + L - 1] - a[0 : L - 1] * a[d : d + L - 1]
            z = np.concatenate(([z0], z0 + np.cumsum(inc)))
        else:
            z = np.array([z0])
        ks = np.arange(L)
        with np.errstate(divide="ignore", invalid="ignore"):
            dist = np.sqrt(
                np.abs(2.0 * (w - (z - w * mu[ks + d] * mu[ks]) / (sd[ks + d] * sd[ks])))
            )
        dist[~np.isfinite(dist)] = np.inf
        bad = (sd[ks] < sd_thr[ks]) | (sd[ks + d] < sd_thr[ks + d]) | skip[ks] | skip[ks + d]
        dist[bad] = np.inf

        # position k+d sees neighbor k (left), position k sees k+d (right)
        hi_pos = ks + d
        upd = dist < mp[hi_pos]
        mp[hi_pos[upd]] = dist[upd]
        pi[hi_pos[upd]] = ks[upd]
        upd = dist < lmp[hi_pos]
        lmp[hi_pos[upd]] = dist[upd]
        lpi[hi_pos[upd]] = ks[upd]

        upd = dist < mp[ks]
        mp[ks[upd]] = dist[upd]
        pi[ks[upd]] = hi_pos[upd]
        upd = dist < rmp[ks]
        rmp[ks[upd]] = dist[upd]
        rpi[ks[upd]] = hi_pos[upd]

    return MatrixProfile(
        mp=mp, pi=pi, w=w, ez=exclusion_zone, lmp=lmp, lpi=lpi, rmp=rmp,
        rpi=rpi, data=data, join=False, algorithm="scrimp",
    )


def _diag_dist(
    dots: np.ndarray, ks: np.ndarray, diff: int, w: int,
    mu: np.ndarray, sd: np.ndarray,
) -> np.ndarray:
    """z-norm ED of pairs (k, k+diff) from raw dot products
    (scrimp.R:231-236 refine_distance formula)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.sqrt(
            np.abs(
                2.0 * (w - (dots - w * mu[ks] * mu[ks + diff]) / (sd[ks] * sd[ks + diff]))
            )
        )
    out[~np.isfinite(out)] = np.inf
    return out


def _refine_merge(
    mp: np.ndarray, pi: np.ndarray, refine: np.ndarray, ks: np.ndarray, diff: int
) -> None:
    """PRE-SCRIMP dual update (scrimp.R:247-254): the refined diagonal
    distance improves both endpoints of each pair."""
    plen = mp.shape[0]
    upd = refine < mp[ks]
    mp[ks[upd]] = refine[upd]
    pi[ks[upd]] = ks[upd] + diff
    other = ks + diff
    ok = (other >= 0) & (other < plen)
    upd = np.zeros_like(ok)
    upd[ok] = refine[ok] < mp[other[ok]]
    mp[other[upd]] = refine[upd]
    pi[other[upd]] = ks[upd]
