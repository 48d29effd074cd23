"""Streaming sessionization — Spark's NATIVE ``session_window``
aggregation (dynamic-gap session state in the state store, merged as
events arrive, finalized when the watermark passes the gap).

Semantics vs the batch op (``operators.rollup.sessionize``): identical
session SPLITS for fully-ingested data — a session window closes when no
event lands within ``gap`` — with two representational differences,
pytest-gated: (1) the stream keys sessions by their start time (batch
emits a 0-based ``session_idx`` per key; join on start), and (2)
``session_window.end`` is ``last_event + gap`` (the window's validity
horizon), so the batch ``session_end``/``duration`` correspond to
``max(ts)`` aggregated alongside, not to ``window.end``.

State is one open window per (key, active session), merged server-side —
bounded by activity, evicted at ``watermark + gap``; append mode emits
each session exactly once, when it can no longer grow. No Python
anywhere in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "2 hours",
    watermark: str = "4 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session aggregates over a streaming source: one output row per
    finalized session — (key, session_start, session_end = last event,
    n_events, duration) — via ``F.session_window`` (append mode)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("key"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("key").alias(key_col),
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
            ).alias("duration"),
        )
    )
