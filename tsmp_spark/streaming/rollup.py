"""Streaming continuous aggregates — the rollup tiers maintained
incrementally from an event stream (the TimescaleDB-style half of the
north star, in native Structured Streaming).

``rollup_stream`` is a pure built-in plan: watermark → bucketed groupBy →
update-mode aggregates. No Python in the stream; state is the open
buckets, bounded by the watermark horizon (closed buckets are finalized
and evicted by Spark's state store). The batch ``rollup_tier`` and this
stream produce identical rows for fully-ingested data — pytest-gated by
draining a file stream and diffing against the batch rollup.

Semantics vs batch: the batch tier buckets *positions* (pos div bucket);
a stream has no global positions, so the streaming tier buckets event
*time* (window(ts, bucket_duration)) — the same continuous-aggregate
shape TimescaleDB/the retention layer use at ingest time. Late rows
inside the watermark update their bucket in place (update output mode);
rows later than the watermark are dropped — that bound is the state-size
contract that lets this run forever at 10^12-event scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_stream(
    events: DataFrame,
    bucket_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Continuous tier-1 aggregate over a streaming events source.

    Input: a streaming DataFrame (``spark.readStream...``) with at least
    (ts, user_id, value). Output (update mode): one row per
    (doc_id, bucket_start) with min/avg/max/count — the same aggregate
    set as the batch ``rollup_tier``.
    """
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).cast("string").alias("doc_id"),
            F.window(ts_col, bucket_duration).alias("bucket"),
        )
        .agg(
            F.min(v).alias("v_min"),
            F.avg(v).alias("v_avg"),
            F.max(v).alias("v_max"),
            F.count(v).alias("n"),
        )
        .select(
            "doc_id",
            F.col("bucket.start").alias("bucket_start"),
            "v_min",
            "v_avg",
            "v_max",
            "n",
        )
    )


def rollup_batch_equivalent(
    events: DataFrame,
    bucket_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The batch plan the stream must converge to once drained — same
    expressions, no watermark (used by tests and backfill jobs: a tier
    backfill over historical parquet IS this query)."""
    v = F.col(value_col)
    return (
        events.groupBy(
            F.col(key_col).cast("string").alias("doc_id"),
            F.window(ts_col, bucket_duration).alias("bucket"),
        )
        .agg(
            F.min(v).alias("v_min"),
            F.avg(v).alias("v_avg"),
            F.max(v).alias("v_max"),
            F.count(v).alias("n"),
        )
        .select(
            "doc_id",
            F.col("bucket.start").alias("bucket_start"),
            "v_min",
            "v_avg",
            "v_max",
            "n",
        )
    )
