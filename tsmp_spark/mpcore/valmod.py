"""VALMOD — variable-length motif discovery over a window range.

Output parity with tsmp valmod.R:52-702: per position the best
length-normalized match over windows [w_min, w_max], with both the
normalized profile (``mp``·sqrt(1/w), valmod.R length normalization) and
the non-normalized best (``mpnn``).

The reference prunes with per-window lower-bound profiles + a candidate
heap re-verified against true distances (valmod.R:233-245, 270-282,
344-410) and falls back to STOMP when pruning fails. That is a
single-machine optimization of the same exact result; here each window's
exact profile is one independent kernel task (the PMP grid shape,
SURVEY.md §2.5 'Spark-level alternative'), so the Spark plan gets its
speed from fan-out instead of pruning. Semantics are identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mpx import mpx
from .stats import exclusion_zone_size


@dataclass
class Valmod:
    mp: np.ndarray  # length-normalized best distance per position
    pi: np.ndarray
    w: np.ndarray  # winning window per position
    mpnn: np.ndarray  # non-normalized best
    pinn: np.ndarray
    wnn: np.ndarray
    w_min: int
    w_max: int
    ez: float


def valmod(
    data: np.ndarray,
    window_min: int,
    window_max: int,
    exclusion_zone: float = 0.5,
) -> Valmod:
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]
    if window_min < 4 or window_max < window_min:
        raise ValueError("bad window range")
    out_len = n - window_min + 1

    best = np.full(out_len, np.inf)
    best_pi = np.full(out_len, -1, dtype=np.int64)
    best_w = np.full(out_len, window_min, dtype=np.int64)
    best_nn = np.full(out_len, np.inf)
    best_nn_pi = np.full(out_len, -1, dtype=np.int64)
    best_nn_w = np.full(out_len, window_min, dtype=np.int64)

    for w in range(window_min, window_max + 1):
        ez_n = exclusion_zone_size(w, exclusion_zone)
        if n < w + ez_n + 1:
            break
        r = mpx(data, w, minlag=ez_n + 1)
        plen = r.mp.shape[0]
        norm = r.mp * np.sqrt(1.0 / w)  # valmod.R length normalization
        upd = norm < best[:plen]
        best[:plen][upd] = norm[upd]
        best_pi[:plen][upd] = r.pi[upd]
        best_w[:plen][upd] = w
        upd = r.mp < best_nn[:plen]
        best_nn[:plen][upd] = r.mp[upd]
        best_nn_pi[:plen][upd] = r.pi[upd]
        best_nn_w[:plen][upd] = w

    return Valmod(
        mp=best, pi=best_pi, w=best_w,
        mpnn=best_nn, pinn=best_nn_pi, wnn=best_nn_w,
        w_min=window_min, w_max=window_max, ez=exclusion_zone,
    )
