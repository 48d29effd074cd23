"""VALMOD — variable-length motif discovery over a window range.

Output parity with tsmp valmod.R:52-702: per position the best
length-normalized match over windows [w_min, w_max], with both the
normalized profile (``mp``·sqrt(1/w), valmod.R length normalization) and
the non-normalized best (``mpnn``).

Two execution modes:

- ``lb=True`` (default, the reference's path): the base window runs a
  full STOMP-style pass that also derives the per-row LOWER-BOUND profile
  ``w·(1−corr₊²)`` (valmod.R:233-245) and stores the ``heap_size``
  smallest-LB candidates per row (valmod.R:270-282). Each later window
  updates only those heap cells by one point (dot-product/stat
  increments, valmod.R:344-410): if the heap's true minimum beats the
  scaled LB cutoff ``max_lb·σ²_q,base/σ²_q,cur`` the row minimum is
  PROVEN (every non-heap candidate's distance is ≥ that cutoff) and the
  row costs O(heap_size) instead of O(n). Unproven rows are re-computed
  exactly and their heaps re-based (the reference's MASS/STOMP fallback,
  valmod.R:490-610); if most rows are unproven the whole window falls
  back to a full pass. Unlike the reference — which leaves unproven
  non-motif entries un-updated and flags them approximate — every row
  here is either proven or recomputed, so the result is always the
  EXACT per-window argmin (oracle-checked).
- ``lb=False``: one exact pass per window WITHOUT heap bookkeeping (the
  PMP grid shape; the Spark fan-out path distributes windows as
  independent tasks, SURVEY.md §2.5 'Spark-level alternative'). Both
  modes run THE SAME ``_full_pass`` code (same fast_avg_sd, same
  absolute-eps low-variance guard), so they agree bit-for-bit on every
  input — including near-constant runs where distances are
  cancellation-limited (the reference's own fast_avg_sd behaves the
  same way on such data).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from .stats import exclusion_zone_size, fast_avg_sd, lowvar_threshold

#: scaled suspect threshold: a row/winner whose sd is below ~1e-4 of
#: its level is near fast_avg_sd's cancellation regime — such rows are
#: never "proven" from the incremental heap and always take the exact
#: recompute path, so pruned == grid on any input
_EPS_REL = 1e-4
# The low-variance MASK (sd < 1e-7·level → Inf) that first landed here
# is now the ENGINE-WIDE rule — stats.lowvar_threshold — shared by
# every kernel and oracle (SCALE.md §8 round-3 unification).


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
    # pruning diagnostics (lb=True): rows whose minimum was proven from
    # the heap alone vs rows that needed an exact recompute / full pass
    pruned_rows: int = 0
    total_rows: int = 0


class _HeapState:
    """Per-row candidate heaps from the last full pass (valmod.R's
    list_motifs_profile, the fields we need for exact re-verification)."""

    def __init__(self, m: int, hs: int):
        self.idx = np.zeros((m, hs), dtype=np.int64)
        self.lb = np.full((m, hs), np.inf)
        self.dps = np.zeros((m, hs))
        self.alive = np.zeros((m, hs), dtype=bool)
        self.sd_q_base = np.full(m, np.nan)


def _row_profiles(qt: np.ndarray, i: int, w: int, mu: np.ndarray,
                  sig: np.ndarray, ez_n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distance + lower-bound profile of query row ``i`` from its dot
    products (valmod.R:225-245 expression order)."""
    m = mu.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        dist = 2.0 * (w - (qt - w * mu[i] * mu) / (sig[i] * sig))
        corr = (qt / w - mu[i] * mu) / (sig[i] * sig)
    dist[dist < 0] = 0.0
    corr[corr < 0] = 0.0
    lbr = w * (1.0 - corr * corr)
    lo, hi = max(0, i - ez_n), min(m, i + ez_n + 1)
    dist[lo:hi] = np.inf
    lbr[lo:hi] = np.inf
    thresh = lowvar_threshold(mu)
    bad = sig < thresh
    dist[bad] = np.inf
    lbr[bad] = np.inf
    if sig[i] < thresh[i]:
        dist[:] = np.inf
        lbr[:] = np.inf
    return dist, lbr


def _store_heap(heap: _HeapState, i: int, lbr: np.ndarray, qt: np.ndarray,
                sig_i: float) -> None:
    hs = heap.idx.shape[1]
    order = np.argsort(lbr, kind="stable")[:hs]
    k = order.shape[0]
    heap.idx[i, :k] = order
    heap.lb[i, :k] = lbr[order]
    heap.dps[i, :k] = qt[order]
    heap.alive[i, :k] = np.isfinite(lbr[order])
    heap.alive[i, k:] = False
    # unused tail slots mean the heap holds EVERY candidate — there is no
    # outside candidate to bound, so the cutoff (last lb) must be +inf;
    # likewise when fewer than hs candidates are finite, the inf lb of a
    # stored masked cell lands in the tail and yields the same cutoff
    heap.lb[i, k:] = np.inf
    heap.sd_q_base[i] = sig_i


def _full_pass(data: np.ndarray, w: int, ez_n: int, heap: _HeapState | None,
               rows: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Exact STOMP-recurrence pass (valmod.R:190-300) that also stores the
    LB heaps (``heap=None`` skips the heap bookkeeping — the lb=False
    grid mode, which therefore shares THIS code path bit-for-bit with the
    pruned mode's exact passes: the two modes cannot diverge, including
    on near-zero-variance windows where distances are cancellation-
    limited exactly as in the reference's own fast_avg_sd trace).
    ``rows=None`` processes every row; otherwise only the given
    rows (the partial-recompute fallback) using exact batched dots."""
    n = data.shape[0]
    m = n - w + 1
    mu, sig = fast_avg_sd(data, w)
    win = np.lib.stride_tricks.sliding_window_view(data, w)

    if rows is not None:
        mp_rows = np.full(rows.shape[0], np.inf)
        pi_rows = np.full(rows.shape[0], -1, dtype=np.int64)
        qt_batch = win @ win[rows].T  # (m, |rows|) exact dots
        for k, i in enumerate(rows):
            dist, lbr = _row_profiles(qt_batch[:, k], i, w, mu, sig, ez_n)
            if heap is not None:
                _store_heap(heap, i, lbr, qt_batch[:, k], sig[i])
            j = int(np.argmin(dist))
            if np.isfinite(dist[j]):
                mp_rows[k] = dist[j]
                pi_rows[k] = j
        return mp_rows, pi_rows

    mp_w = np.full(m, np.inf)
    pi_w = np.full(m, -1, dtype=np.int64)
    qt = win @ win[0]  # exact first row (no FFT noise)
    qt0 = qt.copy()
    for i in range(m):
        if i > 0:
            prev = qt.copy()
            qt[1:] = prev[:-1] - data[: m - 1] * data[i - 1] \
                + data[w:] * data[i + w - 1]
            qt[0] = qt0[i]
        dist, lbr = _row_profiles(qt, i, w, mu, sig, ez_n)
        if heap is not None:
            _store_heap(heap, i, lbr, qt, sig[i])
        j = int(np.argmin(dist))
        if np.isfinite(dist[j]):
            mp_w[i] = dist[j]
            pi_w[i] = j
    return mp_w, pi_w


def valmod(
    data: np.ndarray,
    window_min: int,
    window_max: int,
    exclusion_zone: float = 0.5,
    lb: bool = True,
    heap_size: int = 50,
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
    pruned_rows = 0
    total_rows = 0

    heap = _HeapState(out_len, min(heap_size, out_len)) if lb else None
    # A heap "proof" is only sound if every candidate admissible NOW had a
    # valid lower bound when the row's heap was (re)stored: a window that
    # was DEGENERATE at the heap's base (masked, lbr = inf, never stored)
    # can become valid at a larger w (e.g. a constant run absorbing a
    # varying point) with an unbounded-below distance. Track the validity
    # vector per heap-base window and force an exact recompute for rows
    # whose base masked a now-valid position (found by the const-prefix
    # adversarial probe: pruned picked pi 43 where grid finds pi 34).
    valid_cache: dict[int, np.ndarray] = {}
    base_w = np.full(out_len, window_min, dtype=np.int64)

    for w in range(window_min, window_max + 1):
        ez_n = exclusion_zone_size(w, exclusion_zone)
        if n < w + ez_n + 1:
            break
        m = n - w + 1

        if not lb:
            mp_sq, pi_w = _full_pass(data, w, ez_n, None)
            mp_sqrt = None
        elif w == window_min:
            mp_sq, pi_w = _full_pass(data, w, ez_n, heap)
            mu0, sig0 = fast_avg_sd(data, w)
            valid_cache[w] = sig0 >= lowvar_threshold(mu0)
            total_rows += m
            mp_sqrt = None
        else:
            total_rows += m
            mu, sig = fast_avg_sd(data, w)
            rows = np.arange(m)
            newq = data[rows + w - 1]
            idx = heap.idx[:m]
            cand_end = idx + w - 1
            # once a cell dies (fell off the end, or became a trivial
            # match as the ez widened) it stays dead — its stale sums
            # would be wrong (valmod.R:373-377 ez_v gating)
            heap.alive[:m] &= (cand_end <= n - 1) & (
                np.abs(idx - rows[:, None]) > ez_n
            )
            alive = heap.alive[:m]
            inc = newq[:, None] * data[np.minimum(cand_end, n - 1)]
            heap.dps[:m][alive] += inc[alive]
            mu_c = mu[np.minimum(idx, m - 1)]
            sig_c = sig[np.minimum(idx, m - 1)]
            with np.errstate(divide="ignore", invalid="ignore"):
                dcell = 2.0 * (
                    w - (heap.dps[:m] - w * mu[rows][:, None] * mu_c)
                    / (sig[rows][:, None] * sig_c)
                )
            dcell[dcell < 0] = 0.0
            dcell[~alive] = np.inf
            # candidates degenerate at THIS window can't win a proof cell
            # (the full pass masks them; the stored dps would z-norm junk)
            valid_w = sig >= lowvar_threshold(mu)
            valid_cache[w] = valid_w
            dcell[~valid_w[np.minimum(idx, m - 1)]] = np.inf
            cand_arg = np.argmin(dcell, axis=1)
            cand_min = dcell[rows, cand_arg]
            cand_pi = heap.idx[rows, cand_arg].astype(np.int64)

            # candidates DEGENERATE at a row's heap base (masked, never
            # stored — e.g. a constant run absorbing a varying point as w
            # grows) have no lower bound in that heap: compute their
            # distances exactly and merge. Zero-cost on data without
            # degenerate windows; found by the const_prefix adversarial
            # probe (pruned picked pi 43 where the grid finds pi 34).
            winv = None
            for bw, vb in valid_cache.items():
                if bw == w:
                    continue
                revived = np.flatnonzero(valid_w & ~vb[:m])
                rows_b = np.flatnonzero(base_w[:m] == bw)
                if revived.shape[0] == 0 or rows_b.shape[0] == 0:
                    continue
                if winv is None:
                    winv = np.lib.stride_tricks.sliding_window_view(data, w)
                qt_r = winv[rows_b] @ winv[revived].T
                with np.errstate(divide="ignore", invalid="ignore"):
                    d_r = 2.0 * (
                        w - (qt_r - w * mu[rows_b][:, None] * mu[revived])
                        / (sig[rows_b][:, None] * sig[revived])
                    )
                d_r[d_r < 0] = 0.0
                d_r[np.abs(revived[None, :] - rows_b[:, None]) <= ez_n] = np.inf
                r_arg = np.argmin(d_r, axis=1)
                r_min = d_r[np.arange(rows_b.shape[0]), r_arg]
                better = r_min < cand_min[rows_b]
                cand_min[rows_b] = np.where(better, r_min, cand_min[rows_b])
                cand_pi[rows_b] = np.where(
                    better, revived[r_arg], cand_pi[rows_b]
                )

            with np.errstate(divide="ignore", invalid="ignore"):
                cutoff = heap.lb[:m, -1] * (heap.sd_q_base[:m] / sig[rows]) ** 2
            proven = alive.any(axis=1) & np.isfinite(cand_min) & (
                cand_min < cutoff
            )
            # near-flat rows/winners: cancellation regime — recompute
            sus_row = sig[rows] < _EPS_REL * (np.abs(mu[rows]) + 1.0)
            win_clip = np.minimum(np.maximum(cand_pi, 0), m - 1)
            win_sig = sig[win_clip]
            win_mu = mu[win_clip]
            sus_cand = win_sig < _EPS_REL * (np.abs(win_mu) + 1.0)
            proven &= ~sus_row & ~sus_cand & valid_w[rows]
            unproven = np.flatnonzero(~proven)
            pruned_rows += int(proven.sum())

            mp_sq = np.where(proven, cand_min, np.inf)
            pi_w = np.where(proven, cand_pi, -1).astype(np.int64)
            if unproven.shape[0] > m // 2:
                # pruning collapsed — full re-pass, re-basing every heap
                # (the reference's whole-window STOMP fallback)
                mp_sq, pi_w = _full_pass(data, w, ez_n, heap)
                pruned_rows -= int(proven.sum())
                base_w[:m] = w
            elif unproven.shape[0]:
                mp_u, pi_u = _full_pass(data, w, ez_n, heap, rows=unproven)
                mp_sq[unproven] = mp_u
                pi_w[unproven] = pi_u
                base_w[unproven] = w
            mp_sqrt = None

        if mp_sqrt is None:
            mp_sqrt = np.sqrt(np.where(np.isfinite(mp_sq), mp_sq, np.inf))
            mp_sqrt[pi_w < 0] = np.inf

        plen = mp_sqrt.shape[0]
        norm = mp_sqrt * np.sqrt(1.0 / w)  # valmod.R length normalization
        upd = norm < best[:plen]
        best[:plen][upd] = norm[upd]
        best_pi[:plen][upd] = pi_w[upd]
        best_w[:plen][upd] = w
        upd = mp_sqrt < best_nn[:plen]
        best_nn[:plen][upd] = mp_sqrt[upd]
        best_nn_pi[:plen][upd] = pi_w[upd]
        best_nn_w[:plen][upd] = w

    return Valmod(
        mp=best, pi=best_pi, w=best_w,
        mpnn=best_nn, pinn=best_nn_pi, wnn=best_nn_w,
        w_min=window_min, w_max=window_max, ez=exclusion_zone,
        pruned_rows=pruned_rows, total_rows=total_rows,
    )
