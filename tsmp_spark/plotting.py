"""Optional matplotlib plot layer — the analogue of the reference's
plot.R:1-1316 S3 ``plot.*`` surface (its largest single file) and
visualize.R:1-20.

matplotlib is an OPTIONAL extra: every function here is import-gated and
raises a clear error when it is absent (this engine is headless-first —
the byte-exact text surface lives in ``mpcore.printing``). Figures are
built with ``matplotlib.figure.Figure`` directly (no pyplot, no global
state), so they render under any backend including Agg in CI.

Each builder mirrors the layout of its plot.R counterpart: data pane on
top, profile/metric pane(s) below, picks marked with vertical lines or
overlaid windows. The aim is a faithful *shape* of the reference's
graphics, not pixel parity (vdiffr SVGs are renderer-specific).
"""

from __future__ import annotations

import numpy as np


def _figure(nrows: int = 1, height: float | None = None):
    try:
        from matplotlib.figure import Figure
    except ImportError as e:  # pragma: no cover - matplotlib not shipped here
        raise ImportError(
            "matplotlib is required for tsmp_spark.plotting — install the "
            "'plot' extra; the text surface (tsmp_spark.mpcore.printing / "
            "api.describe) works without it"
        ) from e
    fig = Figure(figsize=(10, height or (2.5 * nrows)))
    axes = fig.subplots(nrows, 1, squeeze=False)[:, 0]
    return fig, axes


def plot_arcs(pairs, ymax: float | None = None):
    """plot_arcs (plot.R:24-76): semicircular arcs between index pairs."""
    fig, (ax,) = _figure(1, 3.0)
    pairs = np.atleast_2d(np.asarray(pairs, dtype=np.float64))
    for lo, hi in pairs:
        lo, hi = min(lo, hi), max(lo, hi)
        mid, r = (lo + hi) / 2.0, (hi - lo) / 2.0
        t = np.linspace(0.0, np.pi, 64)
        ax.plot(mid + r * np.cos(t), r * np.sin(t))
    ax.set_xlabel("Profile Index")
    ax.set_yticks([])
    ax.set_title("Arc Plot")
    if ymax is not None:
        ax.set_ylim(0, ymax)
    return fig


def plot_matrix_profile(profile, data=None):
    """plot.MatrixProfile (plot.R:188-256): data + mp (+ pi) panes."""
    data = profile.data if data is None else data
    nrows = 2 if data is not None else 1
    fig, axes = _figure(nrows)
    k = 0
    if data is not None:
        axes[k].plot(np.asarray(data, dtype=np.float64))
        axes[k].set_title("Data")
        k += 1
    axes[k].plot(profile.mp)
    axes[k].set_title(f"Matrix Profile (w = {profile.w}; ez = {profile.ez})")
    axes[k].set_xlabel("Index")
    return fig


def plot_arc_count(profile, data=None):
    """plot.ArcCount (plot.R:258-324): data, CAC, and profile panes."""
    data = profile.data if data is None else data
    fig, axes = _figure(3 if data is not None else 2)
    k = 0
    if data is not None:
        axes[k].plot(np.asarray(data, dtype=np.float64))
        axes[k].set_title("Data")
        k += 1
    axes[k].plot(profile.cac)
    axes[k].set_title("Arc count (normalized)")
    axes[k + 1].plot(profile.mp)
    axes[k + 1].set_title("Matrix Profile")
    axes[k + 1].set_xlabel("Index")
    return fig


def plot_fluss(profile, segments, data=None):
    """plot.Fluss (plot.R:326-402): arc-count panes + segment vlines."""
    fig = plot_arc_count(profile, data=data)
    for ax in fig.axes:
        for s in np.atleast_1d(np.asarray(segments)):
            ax.axvline(int(s), linestyle="--")
    fig.axes[0].set_title("Fluss")
    return fig


def plot_floss(profile, segments, data=None):
    """plot.Floss (plot.R:404-480): online CAC variant of plot.Fluss."""
    fig = plot_fluss(profile, segments, data=data)
    fig.axes[0].set_title("Floss")
    return fig


def plot_chain(profile, chains, best, data=None):
    """plot.Chain (plot.R:482-590): profile pane + the best chain's
    windows overlaid, offset like the reference's stacked motif pane."""
    data = profile.data if data is None else data
    fig, axes = _figure(2)
    if data is not None:
        axes[0].plot(np.asarray(data, dtype=np.float64))
    axes[0].set_title(f"Chain ({len(chains)} found)")
    if best is not None and data is not None:
        d = np.asarray(data, dtype=np.float64)
        for off, i in enumerate(np.atleast_1d(np.asarray(best, dtype=np.int64))):
            seg = d[i : i + profile.w]
            axes[1].plot(np.arange(seg.shape[0]) + off * profile.w // 2, seg)
    axes[1].set_title("Best chain subsequences")
    axes[1].set_xlabel("Index")
    return fig


def plot_motif(profile, motifs, data=None):
    """plot.Motif (plot.R:592-720): data pane with motif windows marked,
    one pane per motif pair with the two windows overlaid."""
    data = profile.data if data is None else data
    n = len(motifs.motif_idx)
    fig, axes = _figure(1 + n)
    d = np.asarray(data, dtype=np.float64) if data is not None else None
    if d is not None:
        axes[0].plot(d)
    axes[0].set_title(f"Motifs (w = {profile.w})")
    for k, pair in enumerate(motifs.motif_idx):
        w = (
            motifs.motif_window[k]
            if k < len(motifs.motif_window) and np.ndim(motifs.motif_window[k]) == 0
            else profile.w
        )
        for i in np.atleast_1d(np.asarray(pair, dtype=np.int64)):
            if d is not None:
                axes[0].axvline(int(i), linestyle=":")
                seg = d[i : i + int(w)]
                sd = float(np.std(seg)) or 1.0
                axes[1 + k].plot((seg - seg.mean()) / sd)
        axes[1 + k].set_title(f"Motif {k + 1}")
    axes[-1].set_xlabel("Index")
    return fig


def plot_discord(profile, discords, data=None):
    """plot.Discord (plot.R:722-838): like plot.Motif with single picks."""
    data = profile.data if data is None else data
    n = len(discords.discord_idx)
    fig, axes = _figure(1 + n)
    d = np.asarray(data, dtype=np.float64) if data is not None else None
    if d is not None:
        axes[0].plot(d)
    axes[0].set_title(f"Discords (w = {profile.w})")
    for k, i in enumerate(discords.discord_idx):
        if d is not None:
            axes[0].axvline(int(i), linestyle=":")
            seg = d[int(i) : int(i) + profile.w]
            sd = float(np.std(seg)) or 1.0
            axes[1 + k].plot((seg - seg.mean()) / sd)
        axes[1 + k].set_title(f"Discord {k + 1}")
    axes[-1].set_xlabel("Index")
    return fig


def plot_salient(profile, result, data=None):
    """plot.Salient (plot.R:840-906): data pane with salient picks."""
    data = profile.data if data is None else data
    fig, (ax,) = _figure(1, 3.0)
    if data is not None:
        ax.plot(np.asarray(data, dtype=np.float64))
    idxs = np.atleast_2d(np.asarray(result.indexes).T)[0]
    for i in idxs:
        ax.axvline(int(i), linestyle=":")
    ax.set_title(f"Salient subsequences ({idxs.shape[0]} picks)")
    ax.set_xlabel("Index")
    return fig


def plot_valmod(result, data=None):
    """plot.Valmod (plot.R:908-1004): normalized profile + winning-window
    panes."""
    fig, axes = _figure(3 if data is not None else 2)
    k = 0
    if data is not None:
        axes[k].plot(np.asarray(data, dtype=np.float64))
        axes[k].set_title("Data")
        k += 1
    axes[k].plot(result.mp)
    axes[k].set_title(
        f"Valmod Matrix Profile (w = {result.w_min} - {result.w_max})"
    )
    axes[k + 1].plot(result.w)
    axes[k + 1].set_title("Winning window size")
    axes[k + 1].set_xlabel("Index")
    return fig


def plot_snippet(result, data=None):
    """plot.Snippet (plot.R:1006-1100): data pane colored by regime."""
    fig, axes = _figure(2)
    if data is not None:
        d = np.asarray(data, dtype=np.float64)
        axes[0].plot(d)
        for i in np.atleast_1d(result.snippet_idx):
            axes[0].axvline(int(i), linestyle=":")
    axes[0].set_title(
        f"Snippets (size = {int(result.snippet_size)}, "
        f"fractions = {np.round(np.atleast_1d(result.snippet_frac), 3)})"
    )
    axes[1].plot(result.regime)
    axes[1].set_title("Regime")
    axes[1].set_xlabel("Index")
    return fig


def plot_multi_matrix_profile(result, data=None):
    """plot.MultiMatrixProfile (plot.R:1102-1200): one pane per k-dim
    profile column."""
    mp2d = np.atleast_2d(result.mp)
    if mp2d.shape[0] < mp2d.shape[1]:
        mp2d = mp2d.T
    k = mp2d.shape[1]
    fig, axes = _figure(k)
    for c in range(k):
        axes[c].plot(mp2d[:, c])
        axes[c].set_title(f"Matrix Profile ({c + 1}-dim)")
    axes[-1].set_xlabel("Index")
    return fig


def plot_multi_motif(result, motifs, data=None):
    """plot.MultiMotif (plot.R:1202-1280): k-dim panes + pick vlines."""
    fig = plot_multi_matrix_profile(result, data=data)
    for ax in fig.axes:
        for pair in motifs.motif_idx:
            for i in np.atleast_1d(np.asarray(pair, dtype=np.int64)):
                ax.axvline(int(i), linestyle=":")
    return fig


def plot_simple_matrix_profile(result, data=None):
    """plot.SimpleMatrixProfile (plot.R:1282-1316)."""
    fig, axes = _figure(2 if data is not None else 1)
    k = 0
    if data is not None:
        d = np.atleast_2d(np.asarray(data, dtype=np.float64))
        if d.shape[0] < d.shape[1]:
            d = d.T
        for c in range(d.shape[1]):
            axes[0].plot(d[:, c])
        axes[0].set_title("Data (all dimensions)")
        k = 1
    axes[k].plot(result.mp)
    axes[k].set_title("SiMPle Matrix Profile")
    axes[k].set_xlabel("Index")
    return fig


def plot_pmp(result):
    """plot.PMP: the pan-matrix-profile heatmap (window × position)."""
    fig, (ax,) = _figure(1, 4.0)
    ws = sorted(result.pmp)
    rows = [np.asarray(result.pmp[w], dtype=np.float64) for w in ws]
    width = max(r.shape[0] for r in rows)
    grid = np.full((len(rows), width), np.nan)
    for r, row in enumerate(rows):
        grid[r, : row.shape[0]] = row
    ax.imshow(grid, aspect="auto", origin="lower")
    ax.set_yticks(range(len(ws)))
    ax.set_yticklabels([str(w) for w in ws])
    ax.set_ylabel("Window size")
    ax.set_xlabel("Index")
    ax.set_title("Pan-Matrix Profile")
    return fig
