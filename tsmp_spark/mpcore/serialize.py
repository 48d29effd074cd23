"""Profile serialization — JSON compatibility with the reference's on-disk
format (tsmp serialize.R:29-110 write, 130-176 read): profile indexes are
serialized 0-based (serialize.R:43), floats at full precision, metadata
(window, ez, algorithm, class) attached. Internally we are already
0-based, so write is a plain dump and read a plain load.
"""

from __future__ import annotations

import json

import numpy as np

from .stomp import MatrixProfile


def _arr(a: np.ndarray | None) -> list | None:
    if a is None:
        return None
    out = np.asarray(a, dtype=np.float64).copy()
    # JSON has no Inf: use null like the reference's NA pass-through
    return [None if not np.isfinite(x) else float(x) for x in out]


def write_profile(profile: MatrixProfile, path: str) -> None:
    doc = {
        "class": "MatrixProfile",
        "algorithm": profile.algorithm,
        "w": int(profile.w),
        "ez": float(profile.ez),
        "offset": int(profile.offset),
        "join": bool(profile.join),
        "mp": _arr(profile.mp),
        "pi": profile.pi.astype(int).tolist(),
        "lmp": _arr(profile.lmp),
        "lpi": profile.lpi.astype(int).tolist() if profile.lpi is not None else None,
        "rmp": _arr(profile.rmp),
        "rpi": profile.rpi.astype(int).tolist() if profile.rpi is not None else None,
        "data": _arr(profile.data),
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def read_profile(path: str) -> MatrixProfile:
    with open(path) as f:
        doc = json.load(f)

    def arr(key, dt=np.float64, fill=np.inf):
        v = doc.get(key)
        if v is None:
            return None
        out = np.array([fill if x is None else x for x in v], dtype=dt)
        return out

    return MatrixProfile(
        mp=arr("mp"),
        pi=np.asarray(doc["pi"], dtype=np.int64),
        w=int(doc["w"]),
        ez=float(doc["ez"]),
        lmp=arr("lmp"),
        lpi=np.asarray(doc["lpi"], dtype=np.int64) if doc.get("lpi") is not None else None,
        rmp=arr("rmp"),
        rpi=np.asarray(doc["rpi"], dtype=np.int64) if doc.get("rpi") is not None else None,
        data=arr("data", fill=np.nan),
        join=bool(doc.get("join", False)),
        offset=int(doc.get("offset", 0)),
        algorithm=doc.get("algorithm", "unknown"),
    )


def subset_profile(profile: MatrixProfile, start: int, end: int) -> MatrixProfile:
    """Window-consistent slicing (tsmp subset.R:8-45): keep profile
    positions in [start, end), clamp neighbor indexes that escape the
    slice to -1, rebase by ``start``."""
    def cut_f(a):
        return None if a is None else a[start:end].copy()

    def cut_i(a):
        if a is None:
            return None
        out = a[start:end].copy() - start
        out[(out < 0) | (out >= end - start)] = -1
        return out

    return MatrixProfile(
        mp=cut_f(profile.mp),
        pi=cut_i(profile.pi),
        w=profile.w,
        ez=profile.ez,
        lmp=cut_f(profile.lmp),
        lpi=cut_i(profile.lpi),
        rmp=cut_f(profile.rmp),
        rpi=cut_i(profile.rpi),
        data=profile.data[start : end + profile.w - 1].copy()
        if profile.data is not None
        else None,
        join=profile.join,
        offset=profile.offset + start,
        algorithm=profile.algorithm,
    )


def head_profile(profile: MatrixProfile, n: int | None = None) -> MatrixProfile:
    """First n observations (tsmp subset.R:616-650, default 2·w)."""
    if n is None:
        n = 2 * profile.w
    return subset_profile(profile, 0, min(n, profile.mp.shape[0]))


def tail_profile(profile: MatrixProfile, n: int | None = None) -> MatrixProfile:
    """Last n observations (tsmp subset.R:652-690)."""
    if n is None:
        n = 2 * profile.w
    size = profile.mp.shape[0]
    return subset_profile(profile, max(0, size - n), size)
