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
