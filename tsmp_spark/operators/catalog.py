"""Table catalog helpers: Iceberg when available, parquet otherwise.

The engine's tables are "Iceberg-style" (north rule): partition-pruned
columnar scans + snapshot-ish manifests (jobs.CheckpointedJob). The actual
Iceberg runtime needs its Spark catalog jars on the classpath — absent in
this image — so reads/writes go through an import-try: Iceberg tables when
a catalog is configured, plain parquet paths otherwise. Everything
downstream is identical (same DataFrames, same pushdown behavior).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """``catalog.db.table`` when Iceberg is on the classpath; otherwise a
    parquet path/glob."""
    if not name_or_path.endswith(".parquet") and iceberg_available(spark):
        try:
            return spark.read.format("iceberg").load(name_or_path)
        except Exception:
            pass
    return spark.read.parquet(name_or_path)


def write_table(df: DataFrame, name_or_path: str, mode: str = "overwrite") -> None:
    spark = df.sparkSession
    if not name_or_path.endswith(".parquet") and iceberg_available(spark):
        try:
            df.writeTo(name_or_path).createOrReplace()
            return
        except Exception:
            pass
    df.write.mode(mode).parquet(name_or_path)


COMPACTION_SCHEMA = "grp string, file_id long, size long, bin_id long"


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    group_col: str = "grp",
    id_col: str = "file_id",
    size_col: str = "size",
) -> DataFrame:
    """Small-file compaction planner — the Iceberg
    ``rewrite_data_files`` bin-packing step as a first-class operator:
    within each partition group, pack files into output bins of at
    most ``target_bytes`` by FIRST-FIT-DECREASING over the TOTAL
    (size DESC, id ASC) order (files larger than the target get a bin
    of their own). Returns every file's assigned ``bin_id`` (1-based,
    in bin-creation order) — the rewrite task list.

    Determinism: pure integer greedy over a total order — the bin
    assignment is EXACT on both engines (the oracle replays the same
    walk in a recursive CTE, numpy/DuckDB-validated first).

    Scale: this is a MANIFEST-level operator — input is file metadata
    (one row per data file), thousands of rows per partition group,
    not data. One group-hash exchange into the Arrow kernel; the
    sequential greedy is inherent to FFD and irrelevant at manifest
    cardinality.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["size", "file_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        bins = []
        for sz in pdf["size"].astype(int):
            placed = None
            for b, ld in enumerate(loads):
                if ld + sz <= target_bytes:
                    placed = b
                    break
            if placed is None:
                loads.append(int(sz))
                placed = len(loads) - 1
            else:
                loads[placed] += int(sz)
            bins.append(placed + 1)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["grp", "file_id", "size", "bin_id"]]

    rows = files.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(id_col).cast("long").alias("file_id"),
        F.col(size_col).cast("long").alias("size"),
    )
    return rows.groupBy("grp").applyInPandas(
        lambda pdf: kernel(pdf), COMPACTION_SCHEMA
    )


def hrw_shard_assign(
    keys: DataFrame,
    n_shards: int = 8,
    n_shards_after: int | None = None,
    key_col: str = "key",
) -> DataFrame:
    """Rendezvous / highest-random-weight consistent shard assignment
    (Thaler & Ravishankar 1998 — the consistent-hashing variant every
    shard-router and Iceberg-style partition rebalancer leans on):
    ``shard(key) = argmax_s hash(s, key)``, evaluated for ``n_shards``
    and (optionally) ``n_shards_after`` with a per-key ``moved`` flag —
    the elasticity audit. HRW's defining property, pinned in pytest:
    growing N→N+1 moves keys ONLY onto the new shard (every key's old
    per-shard weights are unchanged), at an expected 1/(N+1) rate.

    Determinism: weight = the house portable md5 hash salted
    ``hrw<s>:`` per shard; the argmax is ONE integer ``greatest`` over
    packed ``w·64 + s`` values (w < 2³², s < 64), so ties fall to the
    LARGER shard by construction — no window, no explode, no join.

    Scale: per-row JVM expressions only — ZERO exchange, map-only at
    any corpus size; N inlines as N literal md5 calls (N ≤ 64 by the
    packing contract).
    """
    from .dedup import _h64

    if not 1 <= n_shards <= 64:
        raise ValueError("n_shards must be in [1, 64]")
    k = F.col(key_col).cast("string")

    def packed(n: int) -> Column:
        terms = [
            _h64(F.concat(F.lit(f"hrw{s}:"), k), 0) * F.lit(64) + F.lit(s)
            for s in range(n)
        ]
        best = terms[0] if len(terms) == 1 else F.greatest(*terms)
        return (best % 64).cast("int")

    out = keys.select(
        F.col(key_col).alias("key"), packed(n_shards).alias("shard")
    )
    if n_shards_after is None:
        return out
    if not 1 <= n_shards_after <= 64:
        raise ValueError("n_shards_after must be in [1, 64]")
    return keys.select(
        F.col(key_col).alias("key"),
        packed(n_shards).alias("shard"),
        packed(n_shards_after).alias("shard_after"),
    ).withColumn(
        "moved", (F.col("shard") != F.col("shard_after")).cast("int")
    )
