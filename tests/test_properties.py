"""Randomized property tests (hypothesis) — the engine's analogue of
tsmp's stress sweeps (test-mass-agressive.R, test-stress-stamps.R):
random series/windows, invariants that must hold for any input."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tsmp_spark.codecs import (
    delta_of_delta_decode,
    delta_of_delta_encode,
    gorilla_decode,
    gorilla_encode,
)
from tsmp_spark.mpcore import (
    corr_ed,
    ed_corr,
    exclusion_zone_size,
    ipaa,
    mode,
    movmax,
    movmin,
    mpx,
    normalize,
    paa,
    stomp,
    sum2s,
    zero_one_norm,
)

series_strategy = st.builds(
    lambda n, seed: np.cumsum(
        np.random.default_rng(seed).choice([-1.0, 1.0], size=n)
    )
    + np.random.default_rng(seed + 1).standard_normal(n) * 0.05,
    n=st.integers(60, 400),
    seed=st.integers(0, 10_000),
)


@settings(max_examples=25, deadline=None)
@given(series_strategy, st.integers(4, 20))
def test_stomp_mpx_consistency_random(a, w):
    """stomp == mpx on any series/window (cross-algorithm invariant)."""
    if a.shape[0] < w * 3:
        return
    ez_n = exclusion_zone_size(w, 0.5)
    r1 = stomp(a, w)
    r2 = mpx(a, w, minlag=ez_n + 1)
    fin = np.isfinite(r1.mp)
    np.testing.assert_allclose(r2.mp[fin], r1.mp[fin], atol=1e-5)
    # exclusion zone honored
    valid = r1.pi >= 0
    assert np.all(np.abs(np.flatnonzero(valid) - r1.pi[valid]) > ez_n)
    # symmetry upper bound: mp[i] <= dist(i, j) for the recorded pair both ways
    assert np.all(r1.mp[fin] >= 0)


@settings(max_examples=25, deadline=None)
@given(series_strategy, st.integers(2, 30))
def test_sum2s_movminmax_random(a, w):
    if a.shape[0] < w:
        return
    # Compare against the exactly-rounded per-window sum (math.fsum). A pure
    # rtol bound is unattainable when the window nearly cancels (|sum| ~ 1e-4
    # from |values| ~ 24), so allow absolute error scaled to input magnitude.
    import math

    exact = np.array([math.fsum(a[i : i + w]) for i in range(a.shape[0] - w + 1)])
    scale = max(1.0, float(np.abs(a).max()) * w)
    np.testing.assert_allclose(sum2s(a, w), exact, rtol=1e-9, atol=1e-13 * scale)
    np.testing.assert_array_equal(
        movmin(a, w), [a[i : i + w].min() for i in range(a.shape[0] - w + 1)]
    )
    np.testing.assert_array_equal(
        movmax(a, w), [a[i : i + w].max() for i in range(a.shape[0] - w + 1)]
    )


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e12, max_value=1e12, allow_nan=False), min_size=0, max_size=200
    )
)
def test_gorilla_roundtrip_random(vals):
    v = np.asarray(vals, dtype=np.float64)
    np.testing.assert_array_equal(gorilla_decode(gorilla_encode(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=200))
def test_dod_roundtrip_random(vals):
    t = np.asarray(vals, dtype=np.int64)
    np.testing.assert_array_equal(delta_of_delta_decode(delta_of_delta_encode(t)), t)


@settings(max_examples=30, deadline=None)
@given(series_strategy, st.integers(1, 10))
def test_paa_ipaa_shapes(a, factor):
    p = paa(a, factor)
    expected = int(np.ceil(a.shape[0] / factor)) if factor > 1 else a.shape[0]
    assert p.shape[0] == expected
    back = ipaa(p, factor)
    assert back.shape[0] >= a.shape[0] - factor
    # PAA preserves the global mean of full blocks
    if factor > 1 and a.shape[0] % factor == 0:
        assert p.mean() == pytest.approx(a.mean(), rel=1e-9)


@settings(max_examples=30, deadline=None)
@given(st.floats(0.0, 10.0), st.integers(4, 64))
def test_ed_corr_inverse(d, w):
    dmax = np.sqrt(2.0 * w)  # corr >= 0 region
    d = min(d, dmax)
    c = ed_corr(np.array([d]), w)
    back = corr_ed(c, w)
    # Round-tripping through corr = 1 - d^2/(2w) squares d, so for tiny d the
    # recovered value only agrees in squared space (abs error ~ 2w * eps).
    assert back[0] ** 2 == pytest.approx(d * d, rel=1e-9, abs=4 * w * 2.3e-16)


def test_stats_utilities():
    a = np.array([3.0, 1.0, 2.0, 1.0, 1.0])
    assert mode(a) == 1.0
    n = normalize(a, 0, 1)
    assert n.min() == 0.0 and n.max() == 1.0
    np.testing.assert_array_equal(zero_one_norm(a), (a - 1.0) / 2.0)
    flat = normalize(np.ones(5))
    assert (flat == 0).all()


def test_binary_split_covers_all():
    from tsmp_spark.mpcore import binary_split

    for n in (1, 2, 5, 16, 33):
        order = binary_split(n)
        assert sorted(order.tolist()) == list(range(n))
        if n > 1:
            assert order[0] == 0  # first element first (anytime anchor)


@given(
    lengths=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    base=st.integers(0, 1_000_000),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=30, deadline=None)
def test_token_shard_roundtrip_random(lengths, base, seed):
    """Shard codec is lossless for any sequence-length multiset,
    including empty sequences and int32 extremes."""
    from tsmp_spark.codecs import decode_shard, encode_shard

    rng = np.random.default_rng(seed)
    total = sum(lengths)
    tokens = rng.integers(-(2**31), 2**31, size=total, dtype=np.int64)
    blob = encode_shard(np.array(lengths), tokens, base_seq_idx=base)
    b, ls, ts = decode_shard(blob)
    assert b == base
    assert ls.tolist() == lengths
    assert ts.tolist() == tokens.astype(np.int32).tolist()


def test_python_pack_model():
    """Reference model of the packing cut rule (concatenate in key
    order, cut every seq_len) — the obviously-correct greedy the Spark
    operator must agree with."""

    def pack_model(docs, seq_len):
        stream = [t for _, toks in sorted(docs) for t in toks]
        return [stream[i : i + seq_len] for i in range(0, len(stream), seq_len)]

    docs = [("a", [1, 2, 3]), ("b", [4]), ("c", [5, 6, 7, 8, 9])]
    assert pack_model(docs, 4) == [[1, 2, 3, 4], [5, 6, 7, 8], [9]]


@pytest.mark.skipif(
    __import__("os").environ.get("STRESS_TEST") != "true",
    reason="env-gated stress sweep (test-stress-stamps.R analogue): STRESS_TEST=true",
)
def test_stress_cross_algorithm_sweep():
    """Random series × windows × all kernels: stomp == mpx == scrimp(full)
    == stamp profiles; valmod pruned == grid; movmin/movmax vs brute."""
    from tsmp_spark.mpcore import stamp
    from tsmp_spark.mpcore.scrimp import scrimp
    from tsmp_spark.mpcore.valmod import valmod

    rng = np.random.default_rng(2024)
    for trial in range(15):
        n = int(rng.integers(120, 1500))
        w = int(rng.integers(6, max(8, n // 6)))
        kind = trial % 3
        d = rng.standard_normal(n).cumsum()
        if kind == 1:
            i0 = int(rng.integers(0, n - 30))
            d[i0 : i0 + 30] = d[i0]  # planted flat run
        if kind == 2:
            d = np.round(d)  # quantized
        r_stomp = stomp(d, w)
        # align exclusion conventions: mpx's default minlag=floor(w/2) is
        # the reference's own off-by-one vs stomp's round(w*ez+eps) mask
        r_mpx = mpx(d, w, minlag=exclusion_zone_size(w, 0.5) + 1)
        r_scrimp = scrimp(d, w, s_size=1.0)
        # near-flat windows are cancellation-limited and the kernels use
        # DIFFERENT low-variance guards (stomp.R eps-mask vs mpx.cpp sig
        # poisoning — true of the reference too): the cross-algorithm
        # invariant holds on well-conditioned positions, i.e. where the
        # position AND both picked neighbors have sd >> noise floor
        from tsmp_spark.mpcore import fast_avg_sd

        _, sd = fast_avg_sd(d, w)
        mu_abs = np.abs(fast_avg_sd(d, w)[0]) + 1.0
        good = sd > 1e-4 * mu_abs

        def ok(r1, r2):
            m = (
                np.isfinite(r1.mp) & np.isfinite(r2.mp) & good
                & (r1.pi >= 0) & (r2.pi >= 0)
            )
            m &= good[np.clip(r1.pi, 0, len(good) - 1)]
            m &= good[np.clip(r2.pi, 0, len(good) - 1)]
            return np.allclose(r1.mp[m], r2.mp[m], atol=1e-4)  # r4-gate precision; sqrt amplifies ~1e-11 dist² rounding near exact-dup windows

        assert ok(r_stomp, r_mpx), (trial, n, w)
        assert ok(r_stomp, r_scrimp), (trial, n, w)
        if n < 700:
            r_stamp = stamp(d, w)
            assert ok(r_stomp, r_stamp), (trial, n, w)
        if n < 600 and w >= 8:
            wmax = min(w + 8, n // 4)
            if wmax > w:
                va = valmod(d, w, wmax, lb=True)
                vb = valmod(d, w, wmax, lb=False)
                fa, fb = np.isfinite(va.mp), np.isfinite(vb.mp)
                assert np.array_equal(fa, fb), (trial, n, w)
                assert np.allclose(va.mp[fa], vb.mp[fb], atol=1e-9)
                assert np.array_equal(va.pi, vb.pi)
        k = int(rng.integers(2, 20))
        assert np.allclose(
            movmin(d, k),
            np.array([d[i : i + k].min() for i in range(n - k + 1)]),
        )
