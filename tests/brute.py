"""Brute-force O(n² w) references for kernel validation — the ground truth
the fast kernels are tested against (mirrors the role of tsmp's
cross-algorithm consistency suite, test-stamps.R:101-199)."""

from __future__ import annotations

import numpy as np


def znorm_window(x: np.ndarray) -> np.ndarray:
    mu = x.mean()
    sd = x.std(ddof=0)
    if sd == 0:
        return np.zeros_like(x)
    return (x - mu) / sd


def brute_distance_matrix(a: np.ndarray, b: np.ndarray, w: int) -> np.ndarray:
    """dist[i, j] = z-normalized ED between a[i:i+w] and b[j:j+w]."""
    na = a.shape[0] - w + 1
    nb = b.shape[0] - w + 1
    za = np.stack([znorm_window(a[i : i + w]) for i in range(na)])
    zb = np.stack([znorm_window(b[j : j + w]) for j in range(nb)])
    d2 = (
        (za * za).sum(axis=1)[:, None]
        - 2.0 * za @ zb.T
        + (zb * zb).sum(axis=1)[None, :]
    )
    return np.sqrt(np.maximum(d2, 0.0))


def brute_mp_self(
    a: np.ndarray, w: int, ez_n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Self-join MP with exclusion |i-j| <= ez_n."""
    d = brute_distance_matrix(a, a, w)
    n = d.shape[0]
    for i in range(n):
        lo = max(0, i - ez_n)
        hi = min(n, i + ez_n + 1)
        d[i, lo:hi] = np.inf
    mp = d.min(axis=1)
    pi = d.argmin(axis=1).astype(np.int64)
    pi[~np.isfinite(mp)] = -1
    return mp, pi


def brute_mp_ab(
    a: np.ndarray, b: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    d = brute_distance_matrix(a, b, w)
    return (
        d.min(axis=1),
        d.argmin(axis=1).astype(np.int64),
        d.min(axis=0),
        d.argmin(axis=0).astype(np.int64),
    )


def random_walk(n: int, seed: int = 2018) -> np.ndarray:
    """The reference's own benchmark generator (README.Rmd:75-78):
    cumsum of ±1 steps."""
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.choice(np.array([-1.0, 1.0]), size=n))


def planted_series(n: int = 550, seed: int = 42, motif_at=(33, 102), w: int = 30) -> np.ndarray:
    """Random walk with an exact planted motif pair — shape-faithful stand-in
    for mp_toy_data (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.standard_normal(n))
    pattern = np.sin(np.linspace(0, 3 * np.pi, w)) * 3.0
    noise = rng.standard_normal(w) * 0.05
    a, b = motif_at
    x[a : a + w] = pattern + noise
    x[b : b + w] = pattern + noise + rng.standard_normal(w) * 0.02
    return x
