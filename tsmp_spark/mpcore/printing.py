"""Reference-format summaries — tsmp's ``print.*`` S3 methods (print.R:1-388)
re-derived as pure string formatters.

Layout parity is exact: R's ``cat("a =", x, "\\n")`` emits space-separated
tokens with a trailing space before the newline (see the golden files in
the reference's tests/prints/). Indexes are printed 1-BASED, like the R
objects users see (our kernels are 0-based internally; the +1 happens only
here and in JSON serialization, mirroring serialize.R:43's boundary rule).
"""

from __future__ import annotations

import numpy as np


def _num(x) -> str:
    """R ``cat`` number rendering: integers plain, floats to 7 significant
    digits with trailing zeros dropped."""
    if isinstance(x, (bool, np.bool_)):
        return "TRUE" if x else "FALSE"
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    if isinstance(x, (float, np.floating)):
        return f"{float(x):.7g}"
    return str(x)


def _cat(*parts) -> str:
    return " ".join(_num(p) for p in parts) + " \n"


def _header(title: str) -> str:
    return title + "\n" + "-" * len(title) + "\n"


def _signif(x: float, digits: int) -> float:
    if x == 0 or not np.isfinite(x):
        return x
    from math import floor, log10

    return round(x, -int(floor(log10(abs(x)))) + (digits - 1))


def _bracketed(groups) -> str:
    """``[a, b] [c, d] `` pair/neighbor rendering (print.R:300-320)."""
    out = ""
    for g in groups:
        arr = np.atleast_1d(np.asarray(g))
        out += "[" + ", ".join(str(int(v) + 1) for v in arr) + "] "
    return out


def _data_line(n_obs: int | None, n_dim: int = 1, n_set: int = 1) -> str:
    if n_obs is None:
        return ""
    return _cat(
        "Contains", n_set, "sets" if n_set > 1 else "set", "of data with",
        n_obs, "observations and", n_dim,
        "dimensions" if n_dim > 1 else "dimension",
    )


def format_matrix_profile(profile) -> str:
    """print.MatrixProfile (print.R:35-53)."""
    from .stats import exclusion_zone_size

    s = _header("Matrix Profile")
    s += _cat("Profile size =", profile.mp.shape[0])
    s += _cat("Window size =", profile.w)
    s += _cat("Exclusion zone =", exclusion_zone_size(profile.w, profile.ez))
    n_obs = profile.data.shape[0] if getattr(profile, "data", None) is not None else None
    s += _data_line(n_obs)
    return s


def format_multi_matrix_profile(result, n_obs: int | None = None) -> str:
    """print.MultiMatrixProfile (print.R:64-86)."""
    from .stats import exclusion_zone_size

    s = _header("Multidimensional Matrix Profile")
    s += _cat("Profile size =", result.mp.shape[0])
    s += _cat("Dimensions =", result.n_dim)
    s += _cat("Window size =", result.w)
    s += _cat("Exclusion zone =", exclusion_zone_size(result.w, result.ez))
    must = getattr(result, "must", None)
    exc = getattr(result, "exc", None)
    must = None if must is None or len(must) == 0 else must
    exc = None if exc is None or len(exc) == 0 else exc
    s += _cat("Must dimensions =", "None" if must is None else ", ".join(str(m + 1) for m in must))
    s += _cat("Excluded dimensions =", "None" if exc is None else ", ".join(str(e + 1) for e in exc))
    s += _data_line(n_obs, n_dim=result.n_dim)
    return s


def format_simple_matrix_profile(result, n_obs: int | None = None) -> str:
    """print.SimpleMatrixProfile (print.R:119-137)."""
    from .stats import exclusion_zone_size

    s = _header("SiMPle Matrix Profile")
    s += _cat("Profile size =", result.mp.shape[0])
    s += _cat("Dimensions =", result.n_dim)
    s += _cat("Window size =", result.w)
    s += _cat("Exclusion zone =", exclusion_zone_size(result.w, result.ez))
    s += _data_line(n_obs, n_dim=result.n_dim)
    return s


def format_pmp(result, n_obs: int | None = None) -> str:
    """print.PMP (print.R:95-111)."""
    s = _header("Pan-Matrix Profile")
    s += _cat("Number of profiles =", len(result.pmp))
    s += _cat("Window sizes = from", int(min(result.w)), "to", int(max(result.w)))
    s += _cat("Exclusion zone =", result.ez)
    if n_obs is not None:
        s += _cat("Contains", 1, "set", "of data with", n_obs, "observations")
    return s


def format_valmod(result, n_obs: int | None = None, n_dim: int = 1) -> str:
    """print.Valmod (print.R:9-26)."""
    s = _header("Valmod Matrix Profile")
    s += _cat("Profile size =", result.mp.shape[0])
    s += _cat("Window size =", int(np.min(result.w)), "-", int(np.max(result.w)))
    # print.Valmod embeds the newline in the last string -> no trailing space
    s += " ".join([_num("Exclusion zone ="), _num(result.ez), "times the windows size"]) + "\n"
    s += _data_line(n_obs, n_dim=n_dim)
    return s


def format_arc_count(profile, online: bool = False) -> str:
    """print.ArcCount (print.R:146-163) — appended below the profile."""
    cac = profile.cac
    s = format_matrix_profile(profile)
    s += "\n" + _header("Arc Count - Online" if online else "Arc Count")
    s += _cat("Profile size =", cac.shape[0])
    s += _cat(
        "Minimum normalized count =", _signif(float(np.min(cac)), 2),
        "at index", int(np.argmin(cac)) + 1,
    )
    return s


def format_fluss(profile, segments) -> str:
    """print.Fluss (print.R:192-203)."""
    s = format_arc_count(profile)
    s += "\n" + _header("Fluss")
    segs = np.atleast_1d(np.asarray(segments))
    s += _cat("Segments =", segs.shape[0])
    s += _cat("Segmentation indexes =", *[int(v) + 1 for v in segs])
    return s


def format_floss(profile, segments, seg_vals) -> str:
    """print.Floss (print.R:172-183)."""
    s = format_arc_count(profile, online=True)
    s += "\n" + _header("Floss")
    segs = np.atleast_1d(np.asarray(segments))
    s += _cat("Segments =", segs.shape[0])
    s += _cat("Segmentation indexes =", *[int(v) + 1 for v in segs])
    s += _cat("Segmentation thld values =", *[float(v) for v in np.atleast_1d(seg_vals)])
    return s


def format_chain(profile, chains, best) -> str:
    """print.Chain (print.R:211-227)."""
    s = format_matrix_profile(profile)
    s += "\n" + _header("Chain")
    s += _cat("Chains found =", len(chains))
    best_arr = np.atleast_1d(np.asarray(best)) if best is not None else np.array([], dtype=int)
    s += _cat("Best Chain size =", best_arr.shape[0])
    s += _cat("Best Chain indexes =", *[int(v) + 1 for v in best_arr])
    return s


def format_discord(profile, discords) -> str:
    """print.Discord (print.R:235-262)."""
    s = format_matrix_profile(profile)
    s += "\n" + _header("Discord")
    n = len(discords.discord_idx)
    s += _cat("Discords found =", n)
    s += _cat("Discords indexes =", _bracketed([[i] for i in discords.discord_idx]))
    s += _cat("Discords neighbors =", _bracketed(discords.discord_neighbor))
    return s


def format_motif(profile, motifs) -> str:
    """print.Motif (print.R:284-332)."""
    s = format_matrix_profile(profile)
    s += "\n" + _header("Motif")
    n = len(motifs.motif_idx)
    s += _cat("Motif pairs found =", n)
    s += _cat("Motif pairs indexes =", _bracketed(motifs.motif_idx))
    s += _cat("Motif pairs neighbors =", _bracketed(motifs.motif_neighbor))
    return s


def format_snippet(result) -> str:
    """print.Snippet (print.R:269-281)."""
    s = "\n" + _header("Snippet")
    idx = np.atleast_1d(result.snippet_idx)
    s += _cat("Snippets found =", idx.shape[0])
    s += _cat("Snippets indexes =", *[int(v) + 1 for v in idx])
    s += _cat(
        "Snippets fractions =",
        *[f"{100 * float(f):1.2f}%" for f in np.atleast_1d(result.snippet_frac)],
    )
    s += _cat("Snippet size =", int(result.snippet_size))
    return s


def format_salient(profile, indexes, bits) -> str:
    """print.Salient (print.R:369-388)."""
    s = format_matrix_profile(profile)
    # print.R:373-374 hardcodes a 22-dash rule under the 20-char title
    s += "\n" + "Salient Subsequences\n" + "-" * 22 + "\n"
    s += _cat("Subsequences found =", int(np.asarray(indexes).shape[0]))
    s += _cat("Bitsizes tested =", *[int(b) for b in np.atleast_1d(bits)])
    return s


def format_valmod_motif(result, motifs, n_obs: int | None = None) -> str:
    """print.Motif on a Valmod object (print.R:287-332): the Valmod
    profile header, then the motif block titled 'Valmod Motif' with the
    extra per-pair windows line (window SIZES, printed as-is)."""
    s = format_valmod(result, n_obs=n_obs)
    s += "\n" + _header("Valmod Motif")
    n = len(motifs.motif_idx)
    s += _cat("Motif pairs found =", n)
    s += _cat("Motif pairs indexes =", _bracketed(motifs.motif_idx))
    s += _cat("Motif pairs neighbors =", _bracketed(motifs.motif_neighbor))
    windows = ""
    for w in motifs.motif_window:
        arr = np.atleast_1d(np.asarray(w))
        windows += "[" + ", ".join(str(int(v)) for v in arr) + "] "
    s += _cat("Motif pairs windows =", windows)
    return s


def format_multi_motif(result, motifs, n_obs: int | None = None) -> str:
    """print.MultiMotif (print.R:342-367): appended below the
    multidimensional profile; dims and pairs 1-based."""
    s = format_multi_matrix_profile(result, n_obs=n_obs)
    s += "\n" + _header("Multidimensional Motif")
    s += _cat("Motif pairs found =", len(motifs.motif_idx))
    s += _cat("Motif pairs indexes =", _bracketed(motifs.motif_idx))
    s += _cat("Motifs pairs dimensions =", _bracketed(motifs.motif_window))
    return s
