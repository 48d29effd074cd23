"""Stream-stream event attribution: the watermarked two-stream join.

The canonical Structured-Streaming join shape (clicks ⋈ purchases
within a time bound): both sides carry event-time watermarks, the join
condition bounds purchase time to a window after the click, and Spark
buffers only the watermark-bounded state on each side — state is
O(events inside the window), not the stream history.

Unlike the stateful applyInPandasWithState operators (packing, HLL,
CMS, stompi), this one is PURE JVM — no Python anywhere in the stream —
and its output is fully SQL-expressible, so the driver oracle gates the
actual streaming execution against a plain relational pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All (click, purchase) attribution pairs per user with the
    purchase inside ``[click_ts, click_ts + window_sec]`` — emitted
    from a watermarked stream-stream inner join (append mode; a pair
    emits exactly once, when both sides have arrived and neither can be
    late anymore).

    Watermark 0s: the driver replay is in-order per file; real
    deployments raise it to their lateness bound — the join state then
    holds ``window_sec + watermark`` of events per side, which is the
    scale contract (bounded by TIME, not stream length).

    Output: (user_id, click_id, purchase_id, lag_sec) — integer lag.
    """
    c = (
        clicks.withWatermark(ts_col, "0 seconds")
        .select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("click_ts"),
            F.col(id_col).alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark(ts_col, "0 seconds")
        .select(
            F.col(key_col).alias("p_user_id"),
            F.col(ts_col).alias("purchase_ts"),
            F.col(id_col).alias("purchase_id"),
        )
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(window_sec)} SECONDS")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("bigint").alias("lag_sec"),
    )
