"""Series-shape converters between the engine's two representations.

Nested form (the input_hint / Iceberg-table shape):
    ``(doc_id string, tokens array<int|double>, n_tok int, source string)``
Long form (relational / oracle-checkable shape):
    ``(doc_id string, pos bigint, value double)``

The long form is what DuckDB oracles and Catalyst window functions see; the
nested form is what per-series pandas-UDF kernels consume. Both derive from
the same rows, and converting between them keeps per-row token-array
equality (BASELINE.json input_hint invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def events_to_long(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) →
    (doc_id, pos, value): per-user series ordered by (ts, event_id).

    The (ts, event_id) tie-break is load-bearing: the DuckDB oracle orders
    identically, so row_number assignments match bit-for-bit.
    """
    w = Window.partitionBy("doc_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("ts"),
            F.col("event_id"),
            F.col("value").cast("double").alias("value"),
        )
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .select("doc_id", "pos", "value")
    )


def long_to_nested(long_df: DataFrame, source: str | None = None) -> DataFrame:
    """(doc_id, pos, value) → (doc_id, tokens, n_tok, source).

    ``sort_array(collect_list(struct(pos, value)))`` makes aggregation
    order-deterministic regardless of shuffle arrival order.
    """
    out = (
        long_df.groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "value"))),
                lambda s: s["value"],
            ).alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    if source is not None:
        out = out.withColumn("source", F.lit(source))
    else:
        out = out.withColumn("source", F.lit("events"))
    return out


def nested_to_long(nested: DataFrame, value_type: str = "double") -> DataFrame:
    """(doc_id, tokens, ...) → (doc_id, pos, value) via posexplode."""
    return nested.select(
        "doc_id",
        F.posexplode(F.col("tokens").cast(f"array<{value_type}>")).alias("pos", "value"),
    )


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    """Explicit salted repartition for skewed keys (north rule).

    Hash-partitioning on ``(key, salt)`` spreads a hot key over
    ``salt_buckets`` partitions. Use for operators that are per-row
    embarrassingly parallel after keying (e.g. per-series kernels, where a
    single giant ``source`` group would otherwise pin one executor).
    """
    salted = df.withColumn(
        "_salt", (F.xxhash64(F.col(key), F.monotonically_increasing_id()) % salt_buckets)
    )
    out = salted.repartition(num_partitions, F.col(key), F.col("_salt"))
    return out.drop("_salt")


def events_to_nested(events: DataFrame, source: str = "events") -> DataFrame:
    """events → nested (doc_id, tokens, n_tok, source) in ONE aggregate.

    Fuses ``long_to_nested(events_to_long(...))``: ordering by
    (ts, event_id) happens inside ``sort_array`` on the collected structs
    (struct comparison is lexicographic by field order), so the separate
    row_number Window — a second sort over the same shuffle — disappears.
    One exchange on doc_id, one sort per group, map-side partial collect.
    Produces exactly the same tokens arrays as the two-step path.
    """
    out = (
        events.select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.struct(F.col("ts"), F.col("event_id"), F.col("value").cast("double").alias("value")).alias("e"),
        )
        .groupBy("doc_id")
        .agg(
            F.transform(F.sort_array(F.collect_list("e")), lambda s: s["value"]).alias(
                "tokens"
            )
        )
        .withColumn("n_tok", F.size("tokens"))
        .withColumn("source", F.lit(source))
    )
    return out
