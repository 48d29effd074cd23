"""STOMP / STAMP — matrix profile via MASS + O(1) rolling dot-product
recurrence, plus the incremental STOMPi update.

Re-derives tsmp stomp.R:49-230 (recurrence 128-168, masking 176-186,
left/right profiles 196-210), stamp.R:49-230 (anytime random order
141-169), and stompi.R:18-134 (incremental append + history trim).

Output conventions: 0-based indexes, ``pi = -1`` for "none",
``mp = inf`` for masked positions (matching stomp.R:140-141 init of Inf /
-Inf translated to -1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import dist_profile, mass_pre, mass_v2
from .stats import exclusion_zone_size, fast_avg_sd, lowvar_threshold


@dataclass
class MatrixProfile:
    """The core result object (stomp.R:218-229) — plus everything the
    incremental/streaming path needs as state (stompi.R:18-134)."""

    mp: np.ndarray
    pi: np.ndarray
    w: int
    ez: float
    lmp: np.ndarray | None = None
    lpi: np.ndarray | None = None
    rmp: np.ndarray | None = None
    rpi: np.ndarray | None = None
    data: np.ndarray | None = None  # embedded series (tsmp misc.R:1123-1171)
    join: bool = False
    offset: int = 0  # index rebase after history trimming (stompi.R:110-114)
    algorithm: str = "stomp"
    # FLUSS/FLOSS decorations (fluss.R)
    cac: np.ndarray | None = None
    cac_final: np.ndarray = field(default_factory=lambda: np.empty(0))
    new_data: int = 0


def _skip_locations(data: np.ndarray, w: int) -> np.ndarray:
    """Windows containing any non-finite value are skipped entirely
    (stomp.R:102-115): rolling-any over ``~isfinite``."""
    bad = ~np.isfinite(data)
    if not bad.any():
        return np.zeros(data.shape[0] - w + 1, dtype=bool)
    csum = np.concatenate(([0], np.cumsum(bad)))
    return (csum[w:] - csum[: data.shape[0] - w + 1]) > 0


def stomp(
    data: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    exclusion_zone: float = 0.5,
) -> MatrixProfile:
    """STOMP matrix profile (stomp.R:49-230).

    Self-join when ``query is None`` (with exclusion zone + left/right
    profiles); AB-join otherwise (ez = 0, no lmp/rmp, stomp.R:92-94,
    142-145).
    """
    data = np.asarray(data, dtype=np.float64)
    join = query is not None
    q = data if query is None else np.asarray(query, dtype=np.float64)
    w = int(window_size)
    ez = 0.0 if join else exclusion_zone
    ez_n = exclusion_zone_size(w, ez) if not join else 0

    data_size = data.shape[0]
    query_size = q.shape[0]
    mp_size = data_size - w + 1
    num_queries = query_size - w + 1
    if query_size > data_size:
        raise ValueError("Query must be smaller or the same size as data")
    if w < 4:
        raise ValueError("`window_size` must be at least 4")

    skip_data = _skip_locations(data, w)
    skip_query = _skip_locations(q, w) if join else skip_data
    data_f = np.nan_to_num(data, nan=0.0, posinf=0.0, neginf=0.0)
    query_f = np.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)

    # forward: query windows over data; reverse: data windows over query
    # (reverse last_product seeds each row's first column, stomp.R:131-136)
    nn = dist_profile(data_f, query_f, index=0, window_size=w)
    rnn = dist_profile(query_f, data_f, index=0, window_size=w)
    first_product = rnn.last_product  # length num_queries? -> data slid over query

    data_mean, data_sd = nn.par.data_mean, nn.par.data_sd
    query_mean, query_sd = nn.par.query_mean, nn.par.query_sd
    data_thr = lowvar_threshold(data_mean)
    query_thr = lowvar_threshold(query_mean)

    mp = np.full(mp_size, np.inf)
    pi = np.full(mp_size, -1, dtype=np.int64)
    if join:
        lmp = lpi = rmp = rpi = None
    else:
        lmp = np.full(mp_size, np.inf)
        lpi = np.full(mp_size, -1, dtype=np.int64)
        rmp = np.full(mp_size, np.inf)
        rpi = np.full(mp_size, -1, dtype=np.int64)

    last_product = np.empty(mp_size)
    dp = np.empty(mp_size)

    for i in range(num_queries):
        qwin_last = query_f[i + w - 1]
        if i == 0:
            dp[:] = nn.distance_profile
            last_product[:] = nn.last_product
        else:
            drop = query_f[i - 1]
            last_product[1:] = (
                last_product[: mp_size - 1]
                - data_f[: mp_size - 1] * drop
                + data_f[w : data_size] * qwin_last
            )
            last_product[0] = first_product[i]
            with np.errstate(divide="ignore", invalid="ignore"):
                dp[:] = 2.0 * (
                    w
                    - (last_product - w * data_mean * query_mean[i])
                    / (data_sd * query_sd[i])
                )
        np.maximum(dp, 0.0, out=dp)
        d = np.sqrt(dp)

        # masks (stomp.R:176-186; low-variance guard = engine-wide
        # scale-aware rule instead of stomp.R:182-184's absolute sqrt-eps)
        if not join and ez_n > 0:
            d[max(0, i - ez_n) : min(mp_size, i + ez_n + 1)] = np.inf
        d[data_sd < data_thr] = np.inf
        if skip_query[i] or query_sd[i] < query_thr[i]:
            d[:] = np.inf
        d[skip_data] = np.inf

        if not join:
            # left profile: positions >= i see query i on their left
            ind = d[i:] < lmp[i:]
            lmp[i:][ind] = d[i:][ind]
            lpi[i:][ind] = i
            # right profile: positions <= i
            ind = d[: i + 1] < rmp[: i + 1]
            rmp[: i + 1][ind] = d[: i + 1][ind]
            rpi[: i + 1][ind] = i

        ind = d < mp
        mp[ind] = d[ind]
        pi[ind] = i

    return MatrixProfile(
        mp=mp, pi=pi, w=w, ez=ez, lmp=lmp, lpi=lpi, rmp=rmp, rpi=rpi,
        data=data, join=join, algorithm="stomp",
    )


def stamp(
    data: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    exclusion_zone: float = 0.5,
    s_size: float = 1.0,
    seed: int | None = None,
) -> MatrixProfile:
    """STAMP (stamp.R:49-230): one MASS distance profile per query index, in
    random order, min-merged — the anytime algorithm. ``s_size < 1`` stops
    after that fraction of queries (stamp.R:141-143), leaving a valid
    partial profile."""
    data = np.asarray(data, dtype=np.float64)
    join = query is not None
    q = data if query is None else np.asarray(query, dtype=np.float64)
    w = int(window_size)
    ez = 0.0 if join else exclusion_zone
    ez_n = exclusion_zone_size(w, ez) if not join else 0

    data_size = data.shape[0]
    mp_size = data_size - w + 1
    num_queries = q.shape[0] - w + 1

    skip_data = _skip_locations(data, w)
    skip_query = _skip_locations(q, w) if join else skip_data
    data_f = np.nan_to_num(data)
    query_f = np.nan_to_num(q)

    order = np.arange(num_queries)
    if s_size < 1.0:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)
        order = order[: max(1, int(np.ceil(num_queries * s_size)))]

    mp = np.full(mp_size, np.inf)
    pi = np.full(mp_size, -1, dtype=np.int64)
    lmp = np.full(mp_size, np.inf) if not join else None
    lpi = np.full(mp_size, -1, dtype=np.int64) if not join else None
    rmp = np.full(mp_size, np.inf) if not join else None
    rpi = np.full(mp_size, -1, dtype=np.int64) if not join else None

    par = None
    data_thr = query_thr = None
    for i in order:
        res = dist_profile(data_f, query_f, index=int(i), window_size=w, par=par)
        par = res.par
        if data_thr is None:
            data_thr = lowvar_threshold(par.data_mean)
            query_thr = lowvar_threshold(par.query_mean)
        d = np.sqrt(np.maximum(res.distance_profile, 0.0))
        if not join and ez_n > 0:
            d[max(0, i - ez_n) : min(mp_size, i + ez_n + 1)] = np.inf
        d[par.data_sd < data_thr] = np.inf
        if skip_query[i] or par.query_sd[i] < query_thr[i]:
            d[:] = np.inf
        d[skip_data] = np.inf

        if not join:
            ind = d[i:] < lmp[i:]
            lmp[i:][ind] = d[i:][ind]
            lpi[i:][ind] = i
            ind = d[: i + 1] < rmp[: i + 1]
            rmp[: i + 1][ind] = d[: i + 1][ind]
            rpi[: i + 1][ind] = i

        ind = d < mp
        mp[ind] = d[ind]
        pi[ind] = i

    return MatrixProfile(
        mp=mp, pi=pi, w=w, ez=ez, lmp=lmp, lpi=lpi, rmp=rmp, rpi=rpi,
        data=data, join=join, algorithm="stamp",
    )


def stompi_update(
    profile: MatrixProfile,
    new_data: np.ndarray,
    history_size: int = 0,
) -> MatrixProfile:
    """Incremental STOMP (stompi.R:18-134): append ``new_data`` points and
    extend all six profile vectors by recomputing only the new rows with the
    rolling recurrence; each new query window is also min-merged back into
    the old positions. ``history_size > 0`` trims data to a sliding buffer
    and rebases indexes by ``offset`` (stompi.R:98-117).

    Known reference quirk kept on purpose: after trimming, left profiles of
    retained positions are *not* recomputed (stompi.R:6-8 documents the
    lmp/lpi inconsistency) — we replicate the documented behavior.
    """
    assert profile.data is not None, "stompi needs the embedded data"
    w = profile.w
    old = np.asarray(profile.data, dtype=np.float64)
    new_data = np.asarray(new_data, dtype=np.float64)
    data = np.concatenate([old, new_data])
    n = data.shape[0]
    mp_size = n - w + 1
    old_mp_size = profile.mp.shape[0]
    ez_n = exclusion_zone_size(w, profile.ez)

    data_mean, data_sd = fast_avg_sd(data, w)
    data_thr = lowvar_threshold(data_mean)
    pre = mass_pre(data, w)

    grow = mp_size - old_mp_size
    mp = np.concatenate([profile.mp, np.full(grow, np.inf)])
    pi = np.concatenate([profile.pi, np.full(grow, -1, dtype=np.int64)])
    lmp = np.concatenate([profile.lmp, np.full(grow, np.inf)])
    lpi = np.concatenate([profile.lpi, np.full(grow, -1, dtype=np.int64)])
    rmp = np.concatenate([profile.rmp, np.full(grow, np.inf)])
    rpi = np.concatenate([profile.rpi, np.full(grow, -1, dtype=np.int64)])

    # each new query index i in [old_mp_size, mp_size): full distance profile
    # via MASS (the reference uses the recurrence from the previous row; one
    # MASS per new point is the same O(n log n) class and exact)
    for i in range(old_mp_size, mp_size):
        qwin = data[i : i + w]
        qm = float(data_mean[i])
        qs = float(data_sd[i])
        d, _ = mass_v2(pre, qwin, qm, qs)
        d = np.sqrt(np.maximum(d, 0.0))
        d[data_sd < data_thr] = np.inf
        if qs < data_thr[i]:
            d[:] = np.inf

        # mask from (i - ez) to the END (stompi.R:78-79): later positions
        # get their distances when *their* query runs — symmetric pairs.
        d[max(0, i - ez_n) :] = np.inf

        # merge into earlier positions, then set the new position's own
        # NN from the full masked profile (stompi.R:81-86)
        ind = d < mp
        mp[ind] = d[ind]
        pi[ind] = i
        j = int(np.argmin(d))
        mp[i] = d[j]
        pi[i] = j if np.isfinite(d[j]) else -1

        # left profile (stompi.R:88-94): own NN is everything to the left
        lmp[i] = d[j]
        lpi[i] = j if np.isfinite(d[j]) else -1
        # right profile: earlier positions see query i on their right
        ind = d[:i] < rmp[:i]
        rmp[:i][ind] = d[:i][ind]
        rpi[:i][ind] = i

    offset = profile.offset
    if history_size > 0 and n > history_size:
        trim = n - history_size
        data = data[trim:]
        keep = mp_size - (history_size - w + 1)
        mp, pi = mp[keep:], pi[keep:] - keep
        lmp, lpi = lmp[keep:], lpi[keep:] - keep
        rmp, rpi = rmp[keep:], rpi[keep:] - keep
        # Indexes pointing before the buffer stay RAW negatives — exactly
        # stompi.R:103-108 (plain subtraction, no clamping). floss_cac's
        # reference-exact arc histogram depends on the distinction between
        # "one position before the buffer" (half-arc) and further away
        # (skipped); clamping to -1 destroyed it (measured: FLOSS golden
        # cac off by 6e-4 until this was kept raw). The -1 no-neighbor
        # sentinel of a degenerate row is rebased like any index, so a
        # neighborless row drops out of the arc histogram at its first
        # trim — the floss oracle models no-pair rows the same way
        # (no arc contribution).
        offset += trim

    return MatrixProfile(
        mp=mp, pi=pi, w=w, ez=profile.ez, lmp=lmp, lpi=lpi, rmp=rmp, rpi=rpi,
        data=data, join=False, offset=offset, algorithm="stompi",
        cac=profile.cac, cac_final=profile.cac_final, new_data=new_data.shape[0],
    )
