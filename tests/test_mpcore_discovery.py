"""FLUSS segmentation, motif/discord/chain discovery, MPdist, snippets —
semantics tests on property-faithful synthetic fixtures (FIXTURES.md §2)."""

from __future__ import annotations

import numpy as np
import pytest

from tsmp_spark.mpcore import (
    arc_counts,
    cal_mp_dist,
    find_chains,
    find_discords,
    find_motifs,
    find_snippets,
    floss,
    fluss,
    fluss_cac,
    fluss_extract,
    fluss_score,
    mpdist,
    mpdist_vect,
    mpx_ab,
    stomp,
)
from brute import planted_series, random_walk


def regime_series(n_per: int = 500, seed: int = 11) -> tuple[np.ndarray, list[int]]:
    """Two regime changes: sine → noisy walk → faster sine."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_per, dtype=np.float64)
    seg1 = np.sin(2 * np.pi * t / 25.0) + rng.standard_normal(n_per) * 0.05
    seg2 = np.cumsum(rng.standard_normal(n_per)) * 0.3
    seg2 = seg2 - seg2[0] + seg1[-1]
    seg3 = np.sin(2 * np.pi * t / 8.0) * 1.5 + rng.standard_normal(n_per) * 0.05
    seg3 = seg3 - seg3[0] + seg2[-1]
    return np.concatenate([seg1, seg2, seg3]), [n_per, 2 * n_per]


def test_arc_counts_simple():
    pi = np.array([2, 3, 0, 1, -1], dtype=np.int64)
    ac = arc_counts(pi, 5)
    # arcs: (0,2),(1,3),(0,2),(1,3) -> crossing pos counts
    assert ac[0] == 2  # two arcs start at 0
    assert ac[-1] == 0  # all closed


def test_fluss_finds_regimes():
    data, truth = regime_series()
    w = 25
    r = stomp(data, w)
    segs = fluss(r, num_segments=2)
    assert len(segs) == 2
    for t in truth:
        assert min(abs(int(s) - t) for s in segs) < 60, (segs, truth)
    score = fluss_score(np.array(truth), segs, data.shape[0])
    assert score < 0.05


def test_fluss_cac_bounds():
    data, _ = regime_series()
    r = stomp(data, 25)
    cac = fluss_cac(r)
    assert np.all(cac <= 1.0 + 1e-12)
    assert np.all(cac >= 0.0)
    # edges forced to 1
    assert cac[0] == 1.0 and cac[-1] == 1.0


def test_floss_streaming_finds_regime():
    data, truth = regime_series(400, seed=3)
    w = 25
    init = data[:500]
    r = stomp(init, w)
    segments: list[int] = []
    seg_vals: list[float] = []
    profile = r
    for chunk_start in range(500, len(data), 100):
        chunk = data[chunk_start : chunk_start + 100]
        profile, segments, seg_vals = floss(
            profile, chunk, data_window=500, threshold=0.7,
            segments=segments, seg_vals=seg_vals,
        )
    assert len(segments) >= 1
    # at least one detected split near a true regime change
    assert any(min(abs(s - t) for t in truth) < 150 for s in segments), (segments, truth)


def test_motifs_planted():
    x = planted_series()
    r = stomp(x, 30)
    m = find_motifs(r, n_motifs=3, n_neighbors=5)
    assert len(m.motif_idx) >= 1
    np.testing.assert_array_equal(m.motif_idx[0], [33, 102])


def test_discords_planted():
    rng = np.random.default_rng(8)
    x = np.sin(2 * np.pi * np.arange(600) / 30.0) + rng.standard_normal(600) * 0.02
    x[300:315] += np.linspace(0, 4, 15)  # anomaly
    r = stomp(x, 30)
    d = find_discords(r, n_discords=1, n_neighbors=3)
    assert len(d.discord_idx) == 1
    assert abs(d.discord_idx[0] - 300) < 30


def test_chains_on_drifting_pattern():
    # evolving pattern: sine with slowly increasing amplitude → a chain
    rng = np.random.default_rng(5)
    n = 800
    t = np.arange(n, dtype=np.float64)
    x = np.sin(2 * np.pi * t / 40.0) * (1 + t / n * 3.0) + rng.standard_normal(n) * 0.05
    r = stomp(x, 50)
    chains, best = find_chains(r)
    assert best is not None
    assert len(best) >= 3
    # chain indexes strictly increasing (follows rpi forward in time)
    assert np.all(np.diff(best) > 0)


def test_mpdist_properties():
    a = random_walk(300, seed=1)
    b = random_walk(200, seed=2)
    d_ab = mpdist(a, b, 30)
    assert d_ab > 0
    # self-distance ~ 0
    assert mpdist(a, a.copy(), 30) == pytest.approx(0.0, abs=1e-6)


def test_mpdist_vect_matches_scalar():
    """Each sliding offset of mpdist_vect ~= scalar mpdist of that slice
    (reference reconstructs the same histogram)."""
    a = random_walk(240, seed=4)
    q = random_walk(60, seed=9)
    w = 20
    vec = mpdist_vect(a, q, w)
    assert vec.shape[0] == a.shape[0] - q.shape[0] + 1
    for off in [0, 50, vec.shape[0] - 1]:
        direct = mpdist(a[off : off + q.shape[0]], q, w)
        assert vec[off] == pytest.approx(direct, abs=0.35)


def test_cal_mp_dist_kth():
    mp = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    assert cal_mp_dist(mp, 0.4, 5) == 2.0  # k = ceil(0.4*5) = 2 → 2nd smallest
    assert cal_mp_dist(mp, 10.0, 5) == 5.0  # k > len → max


def test_snippets_two_regimes():
    data, _ = regime_series(400, seed=21)
    s = find_snippets(data[:800], s_size=100, n_snippets=2)
    assert s.snippet_idx.shape[0] == 2
    assert abs(s.snippet_frac.sum() - 1.0) < 1e-6
    # one snippet from each regime
    assert (s.snippet_idx < 400).any() and (s.snippet_idx >= 400).any()


# --- k-motiflets --------------------------------------------------------------


def _brute_znorm_dist(ts, w, i, j):
    a, b = ts[i : i + w], ts[j : j + w]
    za = (a - a.mean()) / a.std()
    zb = (b - b.mean()) / b.std()
    return float(np.sqrt(max(((za - zb) ** 2).sum(), 0.0)))


def test_k_motiflets_matches_exhaustive():
    """Anchored-greedy winner equals an independent reimplementation:
    brute per-pair z-norm distances, greedy replay per anchor in plain
    Python, global argmin."""
    from tsmp_spark.mpcore.motiflets import k_motiflets
    from tsmp_spark.mpcore import exclusion_zone_size

    rng = np.random.default_rng(5)
    w, k = 8, 3
    ez = exclusion_zone_size(w, 0.5)
    # i.i.d. noise with an identical planted motif at 3 spots: noise
    # windows are mutually far in z-space, the plants nearly identical
    ts = rng.normal(size=120)
    pat = np.sin(np.linspace(0, 3.0, w)) * 4
    for at in (10, 55, 100):
        ts[at : at + w] = pat + rng.normal(size=w) * 0.01

    m = ts.shape[0] - w + 1
    d = np.full((m, m), np.nan)
    for i in range(m):
        for j in range(m):
            if abs(i - j) > ez:
                d[i, j] = _brute_znorm_dist(ts, w, i, j)

    best = None
    for i in range(m):
        sel, cand = [i], d[i].copy()
        ok = True
        for _ in range(k - 1):
            if np.all(np.isnan(cand)):
                ok = False
                break
            jn = int(np.nanargmin(cand))
            sel.append(jn)
            cand[max(0, jn - ez) : jn + ez + 1] = np.nan
        if not ok:
            continue
        ext = max(
            d[a, b] for x, a in enumerate(sel) for b in sel[x + 1 :]
        )
        if best is None or ext < best[0]:
            best = (ext, i, sel)

    got = k_motiflets(ts, w, k)
    assert got is not None
    assert got.anchor == best[1]
    assert got.members == best[2]
    assert got.extent == pytest.approx(best[0], abs=1e-6)
    # the planted occurrences should be what wins
    assert all(min(abs(mm - at) for at in (10, 55, 100)) <= 2 for mm in got.members)


def test_k_motiflets_degenerate_and_short():
    from tsmp_spark.mpcore.motiflets import k_motiflets

    # constant series: every window degenerate -> no motiflet
    assert k_motiflets(np.zeros(64), 8, 3) is None
    # too short for 3 non-overlapping windows
    assert k_motiflets(np.arange(10, dtype=float), 8, 3) is None


def test_topk_nn_rank1_equals_classic_profile():
    """The k-NN matrix profile's rank-1 neighbor must reproduce the
    classic 1-NN profile (mpx kernel) exactly on every non-degenerate
    position — cross-kernel consistency between the O(m^2) matrix path
    and the diagonal-march path."""
    from tsmp_spark.mpcore import exclusion_zone_size, mpx
    from tsmp_spark.mpcore.motiflets import znorm_dist_matrix

    rng = np.random.default_rng(9)
    ts = np.cumsum(rng.normal(size=200))
    w = 8
    ez = exclusion_zone_size(w, 0.5)
    r = mpx(ts, w, minlag=ez + 1)
    d = znorm_dist_matrix(ts, w, ez)
    for i in range(d.shape[0]):
        row = d[i]
        j = np.flatnonzero(~np.isnan(row))
        if not j.size or r.pi[i] < 0 or not np.isfinite(r.mp[i]):
            continue
        order = np.lexsort((j, row[j]))
        assert j[order[0]] == r.pi[i], i
        assert row[j[order[0]]] == pytest.approx(r.mp[i], abs=1e-8)
