"""Error paths (tsmp test-stamps.R:12-49, test-compute.R:13-18 analogue)
and weighted-MASS correctness vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from brute import random_walk
from tsmp_spark.mpcore import (
    fast_avg_sd,
    mass_pre_weighted,
    mass_weighted,
    mpx,
    mstomp,
    stomp,
)
from tsmp_spark.mpcore.mass import dist_profile


def test_window_too_small():
    with pytest.raises(ValueError, match="at least 4"):
        stomp(random_walk(100), 3)


def test_window_larger_than_series():
    with pytest.raises(ValueError):
        mpx(random_walk(20), 30)


def test_query_longer_than_data():
    with pytest.raises(ValueError, match="smaller or the same size"):
        stomp(random_walk(50), 10, query=random_walk(100))


def test_mstomp_must_exc_conflict():
    data = np.stack([random_walk(100, 1), random_walk(100, 2)], axis=1)
    with pytest.raises(ValueError, match="overlap"):
        mstomp(data, 10, must_dim=[0], exc_dim=[0])


def test_valmod_bad_range():
    from tsmp_spark.mpcore import valmod

    with pytest.raises(ValueError):
        valmod(random_walk(100), 20, 10)


def test_snippet_guards():
    from tsmp_spark.mpcore import find_snippets

    with pytest.raises(ValueError, match="at least 4"):
        find_snippets(random_walk(100), s_size=3)
    with pytest.raises(ValueError, match="too short"):
        find_snippets(random_walk(30), s_size=20)
    with pytest.raises(ValueError, match="smaller"):
        find_snippets(random_walk(100), s_size=10, window_size=10)


def test_mass_weighted_vs_brute():
    """Weighted z-norm distance (mass_weighted.R:45-72):
    dp = sum_k weight_k · (zn(data_win)_k − zn(query_win)_k)²."""
    data = random_walk(300, seed=3)
    w = 25
    rng = np.random.default_rng(5)
    weight = rng.uniform(0.1, 2.0, size=w)
    pre = mass_pre_weighted(data, w, weight)
    mu, sd = fast_avg_sd(data, w)
    i = 40
    q = data[i : i + w]
    dp, _ = mass_weighted(pre, q, float(mu[i]), float(sd[i]))

    def znw(x):
        return (x - x.mean()) / x.std(ddof=0)

    zq = znw(q)
    for j in [0, 17, 100, len(dp) - 1]:
        zd = znw(data[j : j + w])
        expected = float((weight * (zd - zq) ** 2).sum())
        assert dp[j] == pytest.approx(expected, rel=1e-6, abs=1e-8)


def test_dist_profile_gap_query():
    """Query-with-gap path (dist_profile.R:101-141): NA run inside the
    query window splits it into two aligned sub-queries."""
    data = random_walk(200, seed=6)
    query = data.copy()
    w = 30
    query[50:55] = np.nan  # gap inside window starting at 45
    res = dist_profile(data, query, index=45, window_size=w, gap_mode="aligned")
    dp = res.distance_profile
    assert np.isfinite(dp[45])
    # perfect self-match outside the gap → near-zero distance at 45
    # (aligned mode; the default "reference" mode replicates the R
    # padding quirk and is golden-tested in test_reference_goldens)
    assert dp[45] == pytest.approx(0.0, abs=1e-6)
