"""API-surface parity: every verb the reference exports (NAMESPACE:61-130)
exists in tsmp_spark.api with working call shapes (plot verbs return data;
pipes/print are language features, excluded)."""

from __future__ import annotations

import numpy as np
import pytest

from brute import random_walk
from tsmp_spark import api

REFERENCE_EXPORTS = [
    # NAMESPACE exports minus R-language artifacts (%>% pipes, plot/print S3)
    "analyze", "as_arccount", "as_chain", "as_discord", "as_fluss",
    "as_matrixprofile", "as_motif", "as_multimatrixprofile", "as_multimotif",
    "as_pmp", "as_salient", "as_valmod",
    "av_apply", "av_complexity", "av_hardlimit_artifact",
    "av_motion_artifact", "av_stop_word", "av_zerocrossing",
    "compute", "discords", "dist_profile", "fast_avg_sd", "fast_movavg",
    "fast_movsd", "find_chains", "find_discord", "find_motif",
    "find_snippet", "floss", "floss_cac", "floss_extract", "fluss",
    "fluss_cac", "fluss_extract", "fluss_score", "get_data", "mass",
    "mass_pre", "mass_v3", "min_mp_idx", "motifs", "mpdist", "mpx",
    "mstomp", "mstomp_par", "plot_arcs", "pmp", "pmp_upper_bound", "read",
    "remove_class", "salient_mds", "salient_score", "salient_subsequences",
    "scrimp", "sdts_predict", "sdts_score", "sdts_train", "set_data",
    "simple_fast", "stamp", "stamp_par", "stomp", "stomp_par",
    "stompi_update", "tsmp", "valmod", "visualize", "write",
]


def test_every_reference_export_exists():
    missing = [name for name in REFERENCE_EXPORTS if not hasattr(api, name)]
    assert not missing, f"missing API verbs: {missing}"


def test_tsmp_dispatcher_modes():
    x = random_walk(300, seed=4)
    for mode in ("stomp", "stamp", "scrimp", "mpx"):
        r = api.tsmp(x, 25, mode=mode)
        assert r.mp.shape[0] == 300 - 25 + 1
    r = api.tsmp(np.stack([x, x[::-1]], axis=1), 25, mode="mstomp")
    assert r.mp.shape == (276, 2)
    r = api.tsmp(x, 20, mode="pmp", windows=[20, 30])
    assert sorted(r.pmp) == [20, 30]


def test_compute_rule_table():
    x = random_walk(260, seed=5)
    exact = api.compute(x, 25)
    assert exact.mp.shape[0] == 236
    sampled = api.compute(x, 25, sample_pct=0.4)
    assert np.isfinite(sampled.mp).any()
    ab = api.compute(x, 25, query=random_walk(100, seed=6))
    assert ab.join
    multi = api.compute(x, [20, 30])
    assert sorted(multi.pmp) == [20, 30]


def test_analyze_and_wrappers():
    x = random_walk(300, seed=7)
    profile, m, d = api.analyze(x, 25)
    assert len(m.motif_idx) >= 1 and len(d.discord_idx) >= 1
    assert api.motifs(profile, 2).motif_idx
    assert api.discords(profile, 2).discord_idx
    assert api.get_data(profile) is not None
    av = api.av_complexity(profile)
    assert api.av_apply(profile, av).mp.shape == profile.mp.shape
    arcs = api.plot_arcs(profile)
    assert arcs.shape[0] == profile.mp.shape[0]
    assert set(api.visualize(profile)) == {"mp", "pi", "w"}


def test_salient_mds_and_score():
    from brute import planted_series

    x = planted_series()
    profile = api.stomp(x, 30)
    emb = api.salient_mds(profile)
    assert emb.shape[1] == 2 or emb.shape[0] == 0
    res = api.salient_subsequences(profile, n_bits=[4, 6])
    scr = api.salient_score(res, np.array([35, 400]), 30)
    assert set(scr) == {"fscore", "precision", "recall"}
    assert 0.0 <= scr["precision"] <= 1.0


def test_print_format_parity_with_reference_goldens():
    """Our format_* output must reproduce the reference's print.* layout
    byte-for-byte. The reference golden tests/prints/mp-print was produced
    from a 1000-point series at w=10 — any profile with that shape prints
    the identical header block, so we can compare against the shipped
    golden file directly."""
    from pathlib import Path

    import numpy as np

    from tsmp_spark.mpcore import stomp
    from tsmp_spark.mpcore.printing import format_matrix_profile

    rng = np.random.default_rng(7)
    a = np.cumsum(rng.choice([-1.0, 1.0], size=1000))
    prof = stomp(a, 10)
    prof.data = a
    got = format_matrix_profile(prof)

    golden = Path("/root/reference/tests/prints/mp-print")
    expected = (
        "Matrix Profile\n--------------\n"
        "Profile size = 991 \nWindow size = 10 \nExclusion zone = 5 \n"
        "Contains 1 set of data with 1000 observations and 1 dimension \n"
    )
    assert got == expected
    if golden.exists():  # byte-level check vs the reference's own golden
        assert got == golden.read_text()


def test_plotting_layer_gated():
    """tsmp_spark.plotting imports cleanly without matplotlib and raises
    a clear, actionable error only when a figure is actually requested."""
    import numpy as np
    import pytest

    from tsmp_spark import plotting
    from tsmp_spark.mpcore import stomp

    prof = stomp(np.sin(np.arange(200) / 7.0), 16)
    try:
        import matplotlib  # noqa: F401
        has_mpl = True
    except ImportError:
        has_mpl = False

    if not has_mpl:
        with pytest.raises(ImportError, match="matplotlib is required"):
            plotting.plot_matrix_profile(prof)
        # visualize degrades to plot data, never crashes headless
        from tsmp_spark.api import visualize

        out = visualize(prof)
        assert set(out) == {"mp", "pi", "w"}
        return

    # smoke every builder headlessly when matplotlib IS present
    from tsmp_spark.mpcore import (
        find_discords,
        find_motifs,
        find_snippets,
        fluss_cac,
        fluss_extract,
        valmod,
    )

    d = np.sin(np.arange(400) / 9.0) + 0.01 * np.cos(np.arange(400))
    prof = stomp(d, 16)
    prof.data = d
    fluss_cac(prof)
    segs = fluss_extract(prof, 2)
    figs = [
        plotting.plot_arcs([[5, 10], [1, 10]]),
        plotting.plot_matrix_profile(prof),
        plotting.plot_arc_count(prof),
        plotting.plot_fluss(prof, segs),
        plotting.plot_motif(prof, find_motifs(prof)),
        plotting.plot_discord(prof, find_discords(prof)),
        plotting.plot_valmod(valmod(d, 12, 20)),
        plotting.plot_snippet(find_snippets(d, 40), data=d),
    ]
    assert all(f.axes for f in figs)


def test_query_registry_consistency():
    """Every oracle belongs to a registered query; every query is
    callable; EVERY query is hash-gated (since round 3, sdts/salient
    gate their deterministic prefixes — no rows-only exceptions left)."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) == set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())
