"""Scoped caching for operators whose plans feed multiple lineages.

Several operators (shingle tables, MinHash signatures, LSH bucket keys,
IVF assignments) derive an expensive intermediate that both sides of a
self-join consume. Persisting it makes the derivation run once per
*action* instead of once per lineage branch — but a bare ``persist()``
inside a lazy operator leaks storage memory in a long-lived session,
because the operator never sees the action and so can never unpersist.

``pin()`` persists and registers the DataFrame; callers (pipelines,
benchmark/verify harnesses, tests) call :func:`release_caches` after the
terminal action to drop every pinned block. ``release_caches`` is
idempotent and safe to call with queries still lazy — Spark recomputes
an unpersisted plan transparently, so the worst case of an early release
is lost dedup, never a wrong answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_caches`."""
    df.persist()
    _PINNED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every pinned DataFrame; returns how many were released."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
