"""Deterministic synthetic fixture generation (FIXTURES.md).

The primary engine input table (BASELINE.json input_hint):
``sequences(doc_id string, tokens array<int>, n_tok int, source string)``
— one row per pre-tokenized training sequence. Values are seeded random
walks (the reference's own benchmark generator, README.Rmd:75-78:
``cumsum(sample(c(-1,1)))``) with planted motif pairs / discords / regime
changes, quantized to int32. ``source`` is Zipf-skewed to exercise the
salted-repartition path (north rule).

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with a
per-doc ``default_rng(seed + doc_index)`` — byte-identical regardless of
partitioning, executor count, or row order.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

#: length mix mirroring the tsmp datasets (FIXTURES.md §1): mostly short
#: (toy-like 550), some mid, occasionally long
LENGTH_CHOICES = np.array([256, 550, 550, 550, 1024, 2048, 4096])
N_SOURCES = 20


def make_tokens(doc_index: int, seed: int = 42, length: int | None = None) -> np.ndarray:
    """One deterministic series. Random walk + planted structure:
    every series gets a motif pair at known offsets; every 7th series gets
    a discord spike; every 5th gets a regime change (for segmentation)."""
    rng = np.random.default_rng(seed * 1_000_003 + doc_index)
    if length is None:
        length = int(LENGTH_CHOICES[rng.integers(0, len(LENGTH_CHOICES))])
    x = np.cumsum(rng.choice(np.array([-1.0, 1.0]), size=length))
    w = 32
    # planted motif pair
    a = int(rng.integers(0, length // 2 - w))
    b = int(rng.integers(length // 2, length - w))
    pattern = np.sin(np.linspace(0, 3 * np.pi, w)) * 6.0
    x[a : a + w] = x[a] + pattern
    x[b : b + w] = x[b] + pattern + rng.standard_normal(w) * 0.1
    if doc_index % 7 == 3:
        c = int(rng.integers(w, length - 2 * w))
        x[c : c + w // 2] += np.linspace(0, 14.0, w // 2)
    if doc_index % 5 == 2:
        half = length // 2
        t = np.arange(length - half)
        x[half:] = x[half] + np.sin(2 * np.pi * t / 16.0) * 5.0
    return np.round(x * 8.0).astype(np.int32)


def source_for(doc_index: int, seed: int = 42) -> str:
    """Zipf-skewed source key: src0 dominates (skew target for salting)."""
    rng = np.random.default_rng(seed * 7_000_003 + doc_index)
    z = min(int(rng.zipf(1.5)), N_SOURCES)
    return f"src{z - 1}"


def generate_sequences(
    spark: SparkSession,
    n_docs: int = 500,
    seed: int = 42,
    length: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                toks = make_tokens(int(i), seed, length)
                rows.append(
                    {
                        "doc_id": f"doc_{int(i):08d}",
                        "tokens": toks,
                        "n_tok": np.int32(toks.shape[0]),
                        "source": source_for(int(i), seed),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_docs).repartition(num_partitions).mapInPandas(gen, SEQUENCES_SCHEMA)
