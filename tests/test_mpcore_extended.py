"""Long-tail kernels: mSTOMP, SiMPle, VALMOD, PMP, annotation vectors,
SDTS, salient, serialization/subsetting."""

from __future__ import annotations

import numpy as np
import pytest

from tsmp_spark.mpcore import (
    av_apply,
    av_complexity,
    av_hardlimit_artifact,
    av_motion_artifact,
    av_stop_word,
    av_zerocrossing,
    exclusion_zone_size,
    head_profile,
    mpx,
    mstomp,
    pmp,
    pmp_upper_bound,
    read_profile,
    salient_subsequences,
    sdts_predict,
    sdts_score,
    sdts_train,
    simple_fast,
    stomp,
    subset_profile,
    tail_profile,
    valmod,
    write_profile,
)
from brute import brute_mp_self, random_walk

W = 30
EZ_N = exclusion_zone_size(W, 0.5)


@pytest.fixture(scope="module")
def series():
    return random_walk(400, seed=2018)


# ---------- mSTOMP ----------


def test_mstomp_1dim_equals_stomp(series):
    """mstomp on a single dimension == stomp (tsmp consistency class)."""
    r1 = mstomp(series.reshape(-1, 1), W)
    r0 = stomp(series, W)
    np.testing.assert_allclose(r1.mp[:, 0], r0.mp, atol=1e-6)


def test_mstomp_kdim_ordering(series):
    """k-dim profile is non-decreasing in k (mean of sorted distances)."""
    rng = np.random.default_rng(3)
    data = np.stack(
        [series, series + rng.standard_normal(400) * 5, rng.standard_normal(400)],
        axis=1,
    )
    r = mstomp(data, W)
    finite = np.isfinite(r.mp).all(axis=1)
    assert finite.any()
    diffs = np.diff(r.mp[finite], axis=1)
    assert (diffs >= -1e-9).all()


def test_mstomp_must_exc(series):
    rng = np.random.default_rng(4)
    data = np.stack([series, rng.standard_normal(400)], axis=1)
    r_exc = mstomp(data, W, exc_dim=[1])
    r0 = stomp(series, W)
    # excluding dim 1 → 1-dim profile on dim 0 only
    np.testing.assert_allclose(r_exc.mp[:, 0], r0.mp, atol=1e-6)
    assert np.isnan(r_exc.mp[:, 1]).all()

    r_must = mstomp(data, W, must_dim=[1])
    # with dim 1 forced, column 0 is the dim-1-only profile
    r1 = stomp(rng.standard_normal(0) if False else data[:, 1], W)
    np.testing.assert_allclose(r_must.mp[:, 0], r1.mp, atol=1e-6)


# ---------- SiMPle ----------


def test_simple_fast_brute(series):
    """Non-normalized multidim ED vs brute force."""
    rng = np.random.default_rng(5)
    data = np.stack([series[:200], rng.standard_normal(200)], axis=1)
    r = simple_fast(data, 20, first_row_quirk=False)
    # brute (mp is SQUARED per the reference convention, simple.R:198-212)
    n, d = data.shape
    plen = n - 20 + 1
    ez_n = exclusion_zone_size(20, 0.5)
    wins = np.stack([data[i : i + 20, :] for i in range(plen)])
    for i in [0, 50, plen - 1]:
        dd = ((wins - wins[i]) ** 2).sum(axis=(1, 2))
        dd[max(0, i - ez_n) : min(plen, i + ez_n + 1)] = np.inf
        assert r.mp[i] == pytest.approx(dd.min(), rel=1e-9)


def test_simple_fast_ab(series):
    rng = np.random.default_rng(6)
    a = np.stack([series[:150], rng.standard_normal(150)], axis=1)
    b = np.stack([series[100:250], rng.standard_normal(150)], axis=1)
    r = simple_fast(a, 20, query=b)
    assert r.join
    assert np.isfinite(r.mp).all()
    assert r.mp.min() >= 0


# ---------- VALMOD / PMP ----------


def test_valmod_matches_per_window_min(series):
    r = valmod(series, 20, 24)
    for w in range(20, 25):
        ez_n = exclusion_zone_size(w, 0.5)
        rw = mpx(series, w, minlag=ez_n + 1)
        norm = rw.mp * np.sqrt(1.0 / w)
        plen = norm.shape[0]
        assert (r.mp[:plen] <= norm + 1e-12).all()
    # winning window recorded consistently
    for i in [0, 100, 300]:
        w = int(r.w[i])
        ez_n = exclusion_zone_size(w, 0.5)
        rw = mpx(series, w, minlag=ez_n + 1)
        assert r.mp[i] == pytest.approx(rw.mp[i] * np.sqrt(1.0 / w), rel=1e-9)


def test_pmp_and_upper_bound(series):
    r = pmp(series, [20, 30, 40])
    assert sorted(r.pmp) == [20, 30, 40]
    for w in r.windows:
        rw = mpx(series, w, minlag=exclusion_zone_size(w, 0.5) + 1)
        np.testing.assert_allclose(r.pmp[w], rw.mp, atol=0)
    ub = pmp_upper_bound(series, threshold=0.95)
    assert 8 <= ub <= len(series) // 2


# ---------- annotation vectors ----------


def test_av_shapes_and_apply(series):
    r = stomp(series, W)
    n = r.mp.shape[0]
    for fn in (av_complexity, av_zerocrossing, av_motion_artifact, av_hardlimit_artifact):
        av = fn(r)
        assert av.shape[0] == n
        assert np.nanmin(av) >= 0.0 and np.nanmax(av) <= 1.0
    av = av_stop_word(r, stop_word_loc=10)
    assert av.shape[0] == n
    applied = av_apply(r, av_complexity(r))
    # av=1 regions unchanged, av<1 regions penalized
    assert (applied.mp >= r.mp - 1e-12).all()


# ---------- SDTS ----------


def test_sdts_train_predict_score():
    rng = np.random.default_rng(7)
    n = 3000
    w = 40
    data = rng.standard_normal(n) * 0.3
    labels = np.zeros(n, dtype=bool)
    pattern = np.sin(np.linspace(0, 4 * np.pi, w)) * 3
    for start in (200, 900, 1600, 2300):
        data[start : start + w] += pattern
        labels[start : start + w] = True
    model = sdts_train(data[:2000], labels[:2000], w)
    assert len(model.patterns) >= 1
    assert model.score > 0.5
    pred = sdts_predict(model, data[2000:], w)
    score = sdts_score(pred, labels[2000 : n - w + 1])
    assert score["f_score"] > 0.5  # finds the held-out occurrences


# ---------- salient ----------


def test_salient_picks_planted_motif():
    from brute import planted_series

    x = planted_series()
    r = stomp(x, 30)
    s = salient_subsequences(r, n_bits=6)
    assert s.indexes.shape[0] >= 1
    # best candidate is the planted motif pair location
    assert min(abs(s.indexes[0] - 33), abs(s.indexes[0] - 102)) <= 2
    assert (s.bit_save > 0).all()


# ---------- serialize / subset ----------


def test_serialize_roundtrip(tmp_path, series):
    r = stomp(series, W)
    p = str(tmp_path / "mp.json")
    write_profile(r, p)
    back = read_profile(p)
    np.testing.assert_allclose(back.mp, r.mp)
    np.testing.assert_array_equal(back.pi, r.pi)
    np.testing.assert_allclose(back.lmp, r.lmp)
    assert back.w == r.w and back.ez == r.ez


def test_subset_head_tail(series):
    r = stomp(series, W)
    sub = subset_profile(r, 50, 150)
    assert sub.mp.shape[0] == 100
    np.testing.assert_allclose(sub.mp, r.mp[50:150])
    # indexes rebased; escapees clamped to -1
    inside = (r.pi[50:150] >= 50) & (r.pi[50:150] < 150)
    np.testing.assert_array_equal(sub.pi[inside], r.pi[50:150][inside] - 50)
    assert (sub.pi[~inside] == -1).all()
    assert sub.offset == 50

    h = head_profile(r)
    assert h.mp.shape[0] == 2 * W
    t = tail_profile(r, 40)
    assert t.mp.shape[0] == 40
    np.testing.assert_allclose(t.mp, r.mp[-40:])


def test_valmod_pruned_equals_exact_grid(series):
    """lb=True (heap pruning + exact re-verify) must reproduce the exact
    per-window grid bit-for-bit in picks and to float tolerance in values
    — pruning is a cost optimization, never an approximation here."""
    ex = valmod(series, 20, 30, lb=False)
    pr = valmod(series, 20, 30, lb=True, heap_size=24)
    assert np.array_equal(ex.w, pr.w)
    fin = np.isfinite(ex.mp)
    assert np.array_equal(fin, np.isfinite(pr.mp))
    np.testing.assert_allclose(ex.mp[fin], pr.mp[fin], atol=1e-9)
    np.testing.assert_allclose(
        ex.mpnn[np.isfinite(ex.mpnn)], pr.mpnn[np.isfinite(pr.mpnn)], atol=1e-9
    )
    # picks may differ ONLY where two candidates tie to float noise
    # (different float paths — recurrence vs diagonal march — break exact
    # ties differently; both picks are equally-correct argmins)
    flip = np.flatnonzero(ex.pi != pr.pi)
    for i in flip:
        w = int(ex.w[i])
        ez_n = exclusion_zone_size(w, 0.5)
        rw = mpx(series, w, minlag=ez_n + 1)
        d_ex = rw.mp[i] * np.sqrt(1.0 / w)
        assert ex.mp[i] == pytest.approx(pr.mp[i], abs=1e-9)
        assert d_ex == pytest.approx(pr.mp[i], abs=1e-9)
    assert flip.shape[0] <= 2
    assert pr.total_rows > 0


def test_valmod_pruned_equals_grid_on_revived_windows():
    """Candidates DEGENERATE at the heap's base window (constant run,
    masked, never stored) can become valid at a larger w when the window
    absorbs a varying point — the heap proof is unsound for rows based
    there and must fall back to the exact pass. Found by the
    const_prefix adversarial probe: the pruned path picked pi 43 where
    the grid finds pi 34 (dist 0.8244 vs 0.7941) until the base-validity
    revival check landed."""
    rng = np.random.default_rng(99)
    # same shape as make_adversarial_testdata's const_prefix series
    vals = rng.standard_normal(80).cumsum()
    vals[:40] = 42.5
    pr = valmod(vals, 6, 8, lb=True)
    ex = valmod(vals, 6, 8, lb=False)
    assert np.array_equal(ex.w, pr.w) and np.array_equal(ex.pi, pr.pi)
    fin = np.isfinite(ex.mp)
    assert np.array_equal(fin, np.isfinite(pr.mp))
    np.testing.assert_allclose(ex.mp[fin], pr.mp[fin], atol=1e-12)
    # and pruning stays LIVE on a well-behaved series of the same length
    smooth = np.sin(np.arange(200) / 7.0)
    pr2 = valmod(smooth, 6, 8, lb=True)
    assert pr2.pruned_rows > 0


def test_valmod_lb_pruning_skips_rows():
    """The reference's algorithmic economy (valmod.R:233-410): on
    structured data most rows per window are PROVEN from the O(heap_size)
    candidate heap and never pay the O(n) distance profile."""
    rng = np.random.default_rng(7)
    n = 1000
    t = np.arange(n)
    data = np.sin(2 * np.pi * t / 50) + 0.1 * rng.standard_normal(n)
    pr = valmod(data, 20, 40, lb=True, heap_size=20)
    ex = valmod(data, 20, 40, lb=False)
    assert np.array_equal(ex.w, pr.w) and np.array_equal(ex.pi, pr.pi)
    assert pr.pruned_rows / pr.total_rows >= 0.5  # measured 0.885


def test_valmod_heap_covers_all_candidates():
    """Series shorter than heap_size: every candidate is in the heap, the
    cutoff is +inf, and every row proves without recompute."""
    rng = np.random.default_rng(3)
    data = rng.standard_normal(60)
    ex = valmod(data, 6, 10, lb=False)
    pr = valmod(data, 6, 10, lb=True, heap_size=200)
    assert np.array_equal(ex.w, pr.w) and np.array_equal(ex.pi, pr.pi)
    fin = np.isfinite(ex.mp)
    np.testing.assert_allclose(ex.mp[fin], pr.mp[fin], atol=1e-9)


def test_valmod_pruned_equals_grid_on_flat_runs():
    """Constant runs (sensor clipping / zero-fill) — the cancellation
    regime: pruned and grid modes must agree exactly (scale-aware
    low-variance mask + suspect-row recompute gating)."""
    import numpy as np

    from tsmp_spark.mpcore.valmod import valmod

    rng = np.random.default_rng(0)
    d = rng.standard_normal(400).cumsum()
    d[150:210] = d[150]  # large-offset constant run
    a = valmod(d, 16, 32, lb=True)
    b = valmod(d, 16, 32, lb=False)
    fa, fb = np.isfinite(a.mp), np.isfinite(b.mp)
    assert np.array_equal(fa, fb)
    assert np.abs(a.mp[fa] - b.mp[fb]).max() < 1e-9
    assert np.array_equal(a.pi, b.pi)
    assert np.array_equal(a.w, b.w)
    # positions whose windows lie entirely inside the run (p+32 <= 210)
    # are masked for EVERY window (no meaningful z-norm), not noise
    assert not np.isfinite(a.mp[160:178]).any()
    assert a.pruned_rows > 0.5 * a.total_rows  # pruning still effective
