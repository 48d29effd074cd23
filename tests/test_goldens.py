"""Pinned golden values on the deterministic fixtures — the engine's
analogue of tsmp's golden-value suite (test-compute.R:28-31,
test-stomp-search.R:11-16, expect_known_hash in test-basics.R:50).

Values were produced by the kernel layer after it passed brute-force
parity; any future change that shifts them is a regression, not a
recalibration.
"""

from __future__ import annotations

import numpy as np
import pytest

from brute import planted_series, random_walk
from tsmp_spark.mpcore import (
    find_discords,
    find_motifs,
    fluss_cac,
    mpdist,
    stomp,
)


def test_stomp_goldens_random_walk_2018():
    """seed-2018 random walk (the reference's own benchmark generator)."""
    x = random_walk(400, seed=2018)
    r = stomp(x, 30)
    fin = np.isfinite(r.mp)
    assert round(float(r.mp[fin].mean()), 6) == 3.36715
    assert round(float(r.mp[fin].std(ddof=0)), 6) == 1.033238
    assert int(np.argmin(np.where(fin, r.mp, np.inf))) == 257
    assert round(float(r.mp[fin].min()), 6) == 1.680923


def test_motif_discord_goldens_planted():
    p = planted_series()
    r = stomp(p, 30)
    m = find_motifs(r, n_motifs=3, n_neighbors=5)
    assert [list(map(int, pair)) for pair in m.motif_idx] == [
        [33, 102],
        [298, 467],
        [356, 435],
    ]
    d = find_discords(r, n_discords=2)
    assert d.discord_idx == [151, 54]


def test_mpdist_golden():
    a = random_walk(300, seed=1)
    b = random_walk(200, seed=2)
    assert round(mpdist(a, b, 30), 6) == 1.870302


def test_cac_golden():
    p = planted_series()
    r = stomp(p, 30)
    cac = fluss_cac(r)
    assert round(float(cac.mean()), 6) == 0.992364
