"""FLUSS / FLOSS — semantic segmentation via corrected arc counts.

Re-derives tsmp fluss.R: ``fluss_cac`` (320-349), ``fluss_extract``
(254-282), ``fluss_score`` (476-492), ``floss_cac`` online variant with the
one-sided Kumaraswamy ideal curve (385-453) and the chunked ``floss``
streaming driver (66-137). All indexes 0-based externally.
"""

from __future__ import annotations

import numpy as np

from .stats import EPS, KMODE, exclusion_zone_size
from .stomp import MatrixProfile, stompi_update

#: Kumaraswamy parameters of the one-sided ideal arc curve (fluss.R:426-428)
KU_A = 1.939274
KU_B = 1.698150


def _dbeta22(x: np.ndarray) -> np.ndarray:
    """Beta(2,2) density: 6 x (1-x) — the symmetric ideal arc curve."""
    return 6.0 * x * (1.0 - x)


def _dbeta(x: np.ndarray, a: float, b: float) -> np.ndarray:
    from math import gamma

    c = gamma(a + b) / (gamma(a) * gamma(b))
    with np.errstate(divide="ignore", invalid="ignore"):
        return c * np.power(x, a - 1.0) * np.power(1.0 - x, b - 1.0)


def arc_counts(pi: np.ndarray, n: int) -> np.ndarray:
    """Raw arc counts: +1 at min(i, pi[i]), −1 at max, cumulative sum =
    number of arcs crossing each position (fluss.R:325-339). ``pi`` must be
    0-based with -1/out-of-range meaning "skip"."""
    nnmark = np.zeros(n, dtype=np.float64)
    valid = (pi >= 0) & (pi < n)
    i = np.arange(n, dtype=np.int64)[valid]
    j = pi[valid]
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    np.add.at(nnmark, lo, 1.0)
    np.add.at(nnmark, hi, -1.0)
    return np.cumsum(nnmark)


def fluss_cac(
    profile: MatrixProfile,
    exclusion_zone: float | None = None,
    subset: bool = False,
) -> np.ndarray:
    """Corrected arc counts (fluss.R:307-349): normalize raw arcs by the
    ideal beta(2,2) curve, clamp to 1, force 1 inside the edge exclusion
    zone (default ez·10 window fractions)."""
    if exclusion_zone is None:
        exclusion_zone = profile.ez * 10.0
    n = profile.pi.shape[0]
    ac = arc_counts(profile.pi, n)
    # arange/(n-1), not linspace: bit-identical to SQL's pos/(n-1.0) so
    # ulp-level ties in cac resolve the same way in the DuckDB oracle
    # (identical at the reference's golden precision either way)
    x = np.arange(n, dtype=np.float64) / (n - 1.0)
    if subset:
        ideal = _dbeta(x, 2.1, 2.1) * n / 3.0
    else:
        ideal = _dbeta22(x) * n / 3.0
    with np.errstate(divide="ignore", invalid="ignore"):
        cac = np.minimum(ac / ideal, 1.0)
    cac[~np.isfinite(cac)] = 1.0
    ez_n = int(np.rint(profile.w * exclusion_zone + EPS))
    cac[: min(ez_n, n)] = 1.0
    cac[max(n - ez_n, 0) :] = 1.0
    profile.cac = cac
    return cac


def fluss_extract(
    profile: MatrixProfile,
    num_segments: int = 1,
    exclusion_zone: float | None = None,
) -> np.ndarray:
    """Greedy segment extraction (fluss.R:254-282): repeatedly take the CAC
    minimum, stop at >= 1, suppress the asymmetric zone
    ``[idx-ez, idx+ez-1)`` (0-based) around each pick."""
    assert profile.cac is not None, "run fluss_cac first"
    if exclusion_zone is None:
        exclusion_zone = profile.ez * 10.0
    cac = profile.cac.copy()
    n = cac.shape[0]
    ez_n = int(np.rint(profile.w * exclusion_zone + EPS))
    out = []
    for _ in range(num_segments):
        idx = int(np.argmin(cac))
        if cac[idx] >= 1.0:
            break
        out.append(idx)
        cac[max(0, idx - ez_n) : min(n, idx + ez_n - 1)] = np.inf
    return np.asarray(out, dtype=np.int64)


def fluss(
    profile: MatrixProfile,
    num_segments: int = 1,
    exclusion_zone: float | None = None,
) -> np.ndarray:
    """fluss.R:30 — cac then extract."""
    fluss_cac(profile, exclusion_zone)
    return fluss_extract(profile, num_segments, exclusion_zone)


def fluss_score(gtruth: np.ndarray, extracted: np.ndarray, data_size: int) -> float:
    """Segmentation score (fluss.R:476-492): mean |extracted − gtruth| / n
    over a greedy nearest matching; 0 is perfect."""
    gtruth = np.sort(np.asarray(gtruth, dtype=np.float64))
    extracted = np.sort(np.asarray(extracted, dtype=np.float64))
    n = gtruth.shape[0]
    total = 0.0
    for g in gtruth:
        if extracted.shape[0] == 0:
            total += data_size
            continue
        k = int(np.argmin(np.abs(extracted - g)))
        total += abs(extracted[k] - g)
        extracted = np.delete(extracted, k)
    return float(total / data_size)


def floss_cac(
    profile: MatrixProfile,
    data_window: int,
    exclusion_zone: float | None = None,
) -> np.ndarray:
    """Online corrected arc counts over the trailing buffer (fluss.R:385-453).

    Uses the one-sided Kumaraswamy ideal curve once the stream has trimmed
    history (offset > 0), else the symmetric beta curve; appends the slice
    around the curve mode to ``cac_final``.
    """
    if data_window <= profile.w:
        raise ValueError("data_window must be larger than window_size")
    profile_size = profile.mp.shape[0]
    cac_size = data_window - profile.w + 1
    start_idx = profile_size - cac_size  # 0-based
    new_data_size = profile.new_data
    mp_offset = profile.offset

    ez_n = exclusion_zone_size(profile.w, profile.ez)
    end_idx = profile_size - ez_n - 1  # exclusive bound in 0-based slice
    pi = profile.pi[max(start_idx, 0) : end_idx]
    # rebase to the buffer (reference indexes are relative after slicing)
    pi = pi - max(start_idx, 0)

    nnmark = np.zeros(cac_size, dtype=np.float64)
    # Reference-EXACT arc histogram (fluss.R:412-421, 1-based): keep
    # j in [0, cac_size]; j == 0 (a neighbor exactly one position before
    # the buffer after history trimming) contributes only its -1 half-arc
    # because R's ``nnmark[0] <- v`` is a silent no-op. Reproduces the
    # published FLOSS goldens bit-for-bit (cac mean 0.8643 / sd 0.2007 /
    # cac_final 0.9755 on tilt_abp).
    i_r = np.arange(1, pi.shape[0] + 1, dtype=np.int64)
    jr = pi + 1
    keep = (jr >= 0) & (jr <= cac_size)
    lo = np.minimum(i_r, jr)[keep]
    hi = np.maximum(i_r, jr)[keep]
    np.add.at(nnmark, lo[lo >= 1] - 1, 1.0)
    np.add.at(nnmark, hi[hi >= 1] - 1, -1.0)
    ac = np.cumsum(nnmark)

    x = np.arange(cac_size, dtype=np.float64) / (cac_size - 1.0)
    if mp_offset > 0:
        mode = KMODE
        ideal = (
            KU_A * KU_B * np.power(x, KU_A - 1.0)
            * np.power(1.0 - np.power(x, KU_A), KU_B - 1.0)
            * cac_size / 4.035477
        )
    else:
        mode = 0.5
        ideal = _dbeta22(x) * cac_size / 3.0

    with np.errstate(divide="ignore", invalid="ignore"):
        cac = np.minimum(ac / ideal, 1.0)
    cac[: min(ez_n, cac_size)] = 1.0
    cac[(cac < 0) | ~np.isfinite(cac)] = 1.0

    # append the slice around the mode to cac_final (fluss.R:435-449)
    mid_idx = int(np.rint(cac_size * mode)) - new_data_size // 2 - 1  # 0-based
    if profile.cac_final.shape[0] == 0:
        data_size = profile.data.shape[0] if profile.data is not None else profile_size
        pad = int(
            np.rint(
                data_window * (mode - 1.0)
                - new_data_size / 2.0
                + data_size
                - profile.w * mode
            )
        ) + mp_offset
        profile.cac_final = np.full(max(pad, 0), np.nan)
    profile.cac_final = np.concatenate(
        [profile.cac_final, cac[mid_idx : mid_idx + new_data_size]]
    )
    profile.cac = cac
    return cac


def floss(
    profile: MatrixProfile,
    new_data: np.ndarray,
    data_window: int,
    threshold: float = 1.0,
    exclusion_zone: float | None = None,
    chunk_size: int | None = None,
    segments: list[int] | None = None,
    seg_vals: list[float] | None = None,
) -> tuple[MatrixProfile, list[int], list[float]]:
    """Chunked streaming FLOSS driver (fluss.R:66-137): repeatedly
    ``stompi_update`` + ``floss_cac`` per chunk, then threshold-gated split
    extraction with exclusion-zone update-or-append (floss_extract,
    fluss.R:163-230). Returns the evolved profile plus split lists."""
    new_data = np.asarray(new_data, dtype=np.float64)
    segments = list(segments or [])
    seg_vals = list(seg_vals or [])
    data_size = profile.data.shape[0]

    if data_size < data_window:
        if data_size + new_data.shape[0] <= data_window:
            profile = stompi_update(profile, new_data)
            return profile, segments, seg_vals
        head = data_window - data_size
        profile = stompi_update(profile, new_data[:head])
        new_data = new_data[head:]

    if chunk_size is None:
        chunk_size = min(profile.data.shape[0] // 2, 50, data_window // 2)
        chunk_size = max(chunk_size, 1)

    num_chunks = new_data.shape[0] // chunk_size
    end = 0
    for c in range(num_chunks):
        st = c * chunk_size
        end = st + chunk_size
        profile = stompi_update(profile, new_data[st:end], history_size=data_window)
        floss_cac(profile, data_window, exclusion_zone)
    if end < new_data.shape[0]:
        profile = stompi_update(profile, new_data[end:], history_size=data_window)
        floss_cac(profile, data_window, exclusion_zone)

    segments, seg_vals = floss_extract(
        profile, threshold, exclusion_zone, segments, seg_vals
    )
    return profile, segments, seg_vals


def floss_extract(
    profile: MatrixProfile,
    threshold: float = 1.0,
    exclusion_zone: float | None = None,
    segments: list[int] | None = None,
    seg_vals: list[float] | None = None,
) -> tuple[list[int], list[float]]:
    """Streaming split extraction (fluss.R:163-230): global min of the
    accumulated ``cac_final`` below ``threshold``; a new minimum within
    ``ez`` of the last split updates it in place, otherwise appends."""
    segments = list(segments or [])
    seg_vals = list(seg_vals or [])
    if profile.cac_final.shape[0] == 0:
        return segments, seg_vals
    if exclusion_zone is None:
        exclusion_zone = profile.ez * 10.0
    offset = profile.offset
    cac = profile.cac_final.copy()
    if profile.new_data and offset == 0:
        cac = cac[profile.new_data :] if cac.shape[0] > profile.new_data else cac
    elif offset > 0:
        cac = cac[offset:] if cac.shape[0] > offset else cac
    cac[cac > threshold] = np.nan
    if np.all(np.isnan(cac)):
        return segments, seg_vals
    idx = int(np.nanargmin(cac))
    val = float(cac[idx])
    real_idx = idx + offset
    ez_n = int(np.rint(profile.w * exclusion_zone + EPS))
    if segments:
        last_idx, last_val = segments[-1], seg_vals[-1]
        if real_idx > last_idx:
            if real_idx < last_idx + ez_n:
                if val < last_val:
                    segments[-1] = real_idx
                    seg_vals[-1] = val
            else:
                segments.append(real_idx)
                seg_vals.append(val)
    else:
        segments.append(real_idx)
        seg_vals.append(val)
    return segments, seg_vals
