"""tsmp_spark — a PySpark-native time-series rollup/downsample/retention
engine whose analytic core re-derives the UCR Matrix Profile stack of
matrix-profile-foundation/tsmp (reference at /root/reference) as vectorized
pandas/Arrow UDFs. Built Spark-first — not a port.

Layers (SURVEY.md §7.1):
- ``tsmp_spark.mpcore``     pure numpy kernels (exactness layer)
- ``tsmp_spark.operators``  Spark operators (applyInPandas per series,
                            relational rollups, dedup/similarity/text)
- ``tsmp_spark.functions``  Column-expression helpers (JVM-side)
- ``tsmp_spark.codecs``     Gorilla XOR / delta-of-delta packing
- ``tsmp_spark.streaming``  incremental STOMPi / FLOSS micro-batching
- ``tsmp_spark.jobs``       checkpoint / lineage / metrics
- ``tsmp_spark.plans``      algorithm selection (compute()/analyze() facade)
"""

__version__ = "0.1.0"
