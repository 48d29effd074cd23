"""Reference-verb API facade — the tsmp exported surface
(NAMESPACE:61-130) under the reference's own names, so a tsmp user can
switch: every verb they call today exists here with the same meaning.

Single-series inputs (numpy arrays) run the numpy kernels directly;
DataFrame inputs run the distributed operators. Plotting verbs
(``visualize``, ``plot_arcs``) have no terminal equivalent and return the
data they would plot.
"""

from __future__ import annotations

import numpy as np

# ---- kernels & profiles under reference names ------------------------------
from .mpcore import MatrixProfile
from .mpcore import av_apply as av_apply
from .mpcore import find_motifs_multi as find_motif_multi  # find_motif.MultiMatrixProfile
from .mpcore import av_complexity as av_complexity
from .mpcore import av_hardlimit_artifact as av_hardlimit_artifact
from .mpcore import av_motion_artifact as av_motion_artifact
from .mpcore import av_stop_word as av_stop_word
from .mpcore import av_zerocrossing as av_zerocrossing
from .mpcore import fast_avg_sd as fast_avg_sd
from .mpcore import find_chains as find_chains
from .mpcore import find_snippets as find_snippet
from .mpcore import floss as floss
from .mpcore import floss_cac as floss_cac
from .mpcore import floss_extract as floss_extract
from .mpcore import fluss as fluss
from .mpcore import fluss_cac as fluss_cac
from .mpcore import fluss_extract as fluss_extract
from .mpcore import fluss_score as fluss_score
from .mpcore import mass_pre as mass_pre
from .mpcore import mass_v2 as mass
from .mpcore import mass_v3 as mass_v3
from .mpcore import min_mp_idx as min_mp_idx
from .mpcore import movmean as fast_movavg
from .mpcore import mpdist as mpdist
from .mpcore import mpx as mpx
from .mpcore import mstomp as mstomp
from .mpcore import pmp as pmp
from .mpcore import pmp_upper_bound as pmp_upper_bound
from .mpcore import read_profile as read
from .mpcore import salient_subsequences as salient_subsequences
from .mpcore import scrimp as scrimp
from .mpcore import sdts_predict as sdts_predict
from .mpcore import sdts_score as sdts_score
from .mpcore import sdts_train as sdts_train
from .mpcore import simple_fast as simple_fast
from .mpcore import stamp as stamp
from .mpcore import stomp as stomp
from .mpcore import stompi_update as stompi_update
from .mpcore import valmod as valmod
from .mpcore import write_profile as write
from .mpcore.discovery import find_discords, find_motifs
from .mpcore.mass import dist_profile as dist_profile
from .mpcore.stats import fast_avg_sd as _favg


def fast_movsd(a, w):
    """Rolling population SD (tsmp fast_movsd)."""
    return _favg(a, w)[1]


# parallel variants: Spark supplies the parallelism; the serial kernels are
# the single-series forms (the reference's *_par produce identical results)
stamp_par = stamp
stomp_par = stomp
mstomp_par = mstomp


def find_motif(profile: MatrixProfile, *args, **kwargs):
    """tsmp find_motif S3 verb."""
    return find_motifs(profile, *args, **kwargs)


def find_discord(profile: MatrixProfile, *args, **kwargs):
    return find_discords(profile, *args, **kwargs)


def motifs(profile: MatrixProfile, k: int = 3, **kw):
    """motifs.R:16-18 thin wrapper."""
    return find_motifs(profile, n_motifs=k, **kw)


def discords(profile: MatrixProfile, k: int = 3, **kw):
    """discords.R:16-18 thin wrapper."""
    return find_discords(profile, n_discords=k, **kw)


def tsmp(data, window_size: int, mode: str = "stomp", **kw):
    """tsmp.R:111-282 mode dispatcher (single-series form). For tables use
    ``tsmp_spark.plans.compute`` / ``operators.matrix_profile``."""
    data = np.asarray(data, dtype=np.float64)
    if mode in ("stomp", "stamp"):
        fn = stomp if mode == "stomp" else stamp
        return fn(data, window_size, **kw)
    if mode == "scrimp":
        return scrimp(data, window_size, **kw)
    if mode == "mpx":
        return mpx(data, window_size, **kw)
    if mode == "mstomp":
        return mstomp(data, window_size, **kw)
    if mode == "simple":
        return simple_fast(data, window_size, **kw)
    if mode == "valmod":
        return valmod(data, window_size, kw.pop("upper_window", window_size + 10), **kw)
    if mode == "pmp":
        return pmp(data, kw.pop("windows", [window_size]), **kw)
    raise ValueError(f"unknown mode {mode!r}")


def compute(data, windows=None, query=None, sample_pct: float = 1.0, **kw):
    """compute.R:45-144 rule table (single-series form):
    one window + exact → mpx; sampled → scrimp; query → AB-join;
    window list → PMP."""
    data = np.asarray(data, dtype=np.float64)
    if query is not None:
        from .mpcore import mpx_ab

        return mpx_ab(data, np.asarray(query, np.float64), int(windows))
    if isinstance(windows, (list, tuple, np.ndarray)):
        return pmp(data, list(windows), **kw)
    if sample_pct < 1.0:
        return scrimp(data, int(windows), s_size=sample_pct, **kw)
    return mpx(data, int(windows), **kw)


def analyze(data, windows: int, **kw):
    """analyze.R:44-73: compute → motifs(3) → discords(3)."""
    profile = stomp(np.asarray(data, np.float64), int(windows))
    return profile, find_motifs(profile, n_motifs=3), find_discords(profile, n_discords=3)


def get_data(profile: MatrixProfile) -> np.ndarray:
    """misc.R:1123-1171."""
    return profile.data


def set_data(profile: MatrixProfile, data) -> MatrixProfile:
    profile.data = np.asarray(data, dtype=np.float64)
    return profile


def visualize(profile: MatrixProfile):
    """visualize.R:1-20 analogue: a matplotlib Figure when the optional
    plot layer is available (tsmp_spark.plotting mirrors plot.R's
    surface), else the raw plot data — the engine stays headless-first."""
    try:
        from .plotting import plot_matrix_profile

        return plot_matrix_profile(profile)
    except ImportError:
        return {"mp": profile.mp, "pi": profile.pi, "w": profile.w}


def describe(profile: MatrixProfile) -> str:
    """print.MatrixProfile parity (print.R:35-53): the exact text the
    reference prints, byte-for-byte vs its tests/prints goldens."""
    from .mpcore import format_matrix_profile

    return format_matrix_profile(profile)


def plot_arcs(profile: MatrixProfile):
    from .mpcore import arc_counts

    return arc_counts(profile.pi, profile.pi.shape[0])


def salient_mds(profile: MatrixProfile, data=None, res=None, n_bits=8, bit_idx: int = 0):
    """salient.R:358-408: classical MDS (cmdscale) of the znormed salient
    subsequences of the ``bit_idx``-th bit column."""
    from .mpcore import salient_subsequences

    if res is None:
        res = salient_subsequences(profile, data=data, n_bits=n_bits)
    src = np.asarray(profile.data if data is None else data, np.float64).ravel()
    w = profile.w
    idxs = np.atleast_2d(res.indexes.T)[bit_idx] if res.indexes.ndim > 1 else res.indexes
    subs = []
    for i in idxs:
        x = src[i : i + w]
        sd = float(np.std(x))
        subs.append((x - x.mean()) / (sd if sd != 0 else 1.0))
    subs = np.stack(subs) if subs else np.empty((0, w))
    if subs.shape[0] < 2:
        return np.zeros((subs.shape[0], 2))
    d2 = ((subs[:, None, :] - subs[None, :, :]) ** 2).sum(axis=2)
    j = np.eye(d2.shape[0]) - 1.0 / d2.shape[0]
    b = -0.5 * j @ d2 @ j
    vals, vecs = np.linalg.eigh(b)
    order = np.argsort(vals)[::-1][:2]
    return vecs[:, order] * np.sqrt(np.maximum(vals[order], 0.0))


def salient_score(res, gtruth: np.ndarray, w: int):
    """salient.R:410-479, exact semantics: per bit column, a pick is a hit
    when its distance to the nearest ground-truth index is < 0.2·w; the
    pick list is cut at the first increase of the running description
    length; returns (fscore, precision, recall) with the reference's quirk
    preserved — fscore is the LAST column's score while precision/recall
    track the best column."""
    gtruth = np.asarray(gtruth, dtype=np.int64)
    idxs = res.indexes if res.indexes.ndim > 1 else res.indexes[:, None]
    sizes = res.bit_save if res.bit_save.ndim > 1 else res.bit_save[:, None]
    f_score = best_f = best_p = best_r = 0.0
    for b in range(idxs.shape[1]):
        hit = np.array(
            [np.abs(int(i) - gtruth).min() < 0.2 * w for i in idxs[:, b]]
        )
        d = np.diff(sizes[:, b])
        inc = np.flatnonzero(d > 0)
        if inc.shape[0] == 0:
            continue
        cutoff = int(inc[0])  # R: which(...)[1] - 1 picks, 1-based
        if cutoff <= 0:
            continue
        h = hit[:cutoff]
        precision = float(h.sum()) / h.shape[0]
        recall = float(h.sum()) / gtruth.shape[0]
        f_score = (
            2 * precision * recall / (precision + recall)
            if (precision + recall) > 0
            else 0.0
        )
        if f_score > best_f:
            best_p, best_r, best_f = precision, recall, f_score
    return {"fscore": f_score, "precision": best_p, "recall": best_r}


# S3 converters: the schema is the class — validation no-ops kept for
# call-compatibility (misc.R:1253-1400)
def as_matrixprofile(x):
    return x


as_arccount = as_chain = as_discord = as_fluss = as_motif = as_matrixprofile
as_multimatrixprofile = as_multimotif = as_pmp = as_salient = as_valmod = as_matrixprofile


def remove_class(x, *_):
    return x
