"""compute()/analyze() — the unified API facade with rule-based physical
algorithm selection, mirroring tsmp compute.R:45-144 / analyze.R:44-73.

The rule table (compute.R:61-107):
    one window + exact          → MPX kernel
    one window + sample_pct < 1 → SCRIMP (anytime)
    query series present        → AB-join (MPX-AB, ez = 0)
    multiple windows            → PMP-style fan-out over (series × window)

Spark-side this picks between the ``matrix_profile`` physical modes and
the (series × window) grid job — the engine's tiny optimizer on top of
whatever Catalyst already does for the relational shell.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..operators.matrix_profile import PROFILE_SCHEMA, _clean, matrix_profile, matrix_profile_join
from ..mpcore import exclusion_zone_size, mpx, scrimp


def compute(
    sequences: DataFrame,
    windows: int | list[int],
    query: DataFrame | None = None,
    sample_pct: float = 1.0,
    exclusion_zone: float = 0.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Unified entry point. Returns the exploded profile table; for
    multi-window requests the output carries a ``w`` column (PMP long
    form, SURVEY.md §1.3)."""
    if query is not None:
        if isinstance(windows, list):
            raise ValueError("AB-join takes a single window")
        pairs = sequences.select(
            F.col("doc_id").alias("doc_id_a"), F.col("tokens").alias("tokens_a")
        ).crossJoin(
            F.broadcast(
                query.select(
                    F.col("doc_id").alias("doc_id_b"), F.col("tokens").alias("tokens_b")
                )
            )
        )
        return matrix_profile_join(pairs, windows)

    if isinstance(windows, int):
        if sample_pct >= 1.0:
            return matrix_profile(sequences, windows, exclusion_zone=exclusion_zone)
        return _scrimp_sampled(
            sequences, windows, sample_pct, exclusion_zone, num_partitions
        )

    return pan_matrix_profile(sequences, windows, exclusion_zone)


def _scrimp_sampled(
    sequences: DataFrame,
    window_size: int,
    sample_pct: float,
    exclusion_zone: float,
    num_partitions: int | None = None,
) -> DataFrame:
    w = int(window_size)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                a = np.asarray(tokens, dtype=np.float64)
                ez_n = exclusion_zone_size(w, exclusion_zone)
                if a.shape[0] < w + ez_n + 1:
                    continue
                # deterministic per-doc seed → reproducible anytime sample
                # (zlib.crc32, not hash(): PYTHONHASHSEED varies per process)
                import zlib

                seed = zlib.crc32(str(doc_id).encode()) % (2**31)
                r = scrimp(a, w, exclusion_zone, s_size=sample_pct, seed=seed)
                n = r.mp.shape[0]
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": np.repeat(doc_id, n),
                            "pos": np.arange(n, dtype=np.int32),
                            "mp": _clean(r.mp),
                            "pi": r.pi.astype(np.int32),
                            "lmp": _clean(r.lmp),
                            "lpi": r.lpi.astype(np.int32),
                            "rmp": _clean(r.rmp),
                            "rpi": r.rpi.astype(np.int32),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    # same round-robin rebalance as matrix_profile_nested: sampled-SCRIMP
    # rows are tiny in bytes but quadratic in kernel CPU, and a single-
    # row-group local parquet would otherwise run the stage on 1 task.
    # Knob convention matches matrix_profile: None = defaultParallelism,
    # 0 = trust the input layout (no shuffle at warehouse scale)
    base = sequences.select("doc_id", "tokens")
    if num_partitions is None:
        num_partitions = sequences.sparkSession.sparkContext.defaultParallelism
    if num_partitions:
        base = base.repartition(num_partitions)
    return base.mapInPandas(kernel, PROFILE_SCHEMA)


def pan_matrix_profile(
    sequences: DataFrame, windows: list[int], exclusion_zone: float = 0.5
) -> DataFrame:
    """PMP (pmp.R:52-227) as an embarrassingly-parallel (series × window)
    grid: explode the window list against the series rows — each grid cell
    is one independent kernel task; Spark's scheduler replaces the
    reference's binary-split anytime ordering."""
    spark = sequences.sparkSession
    win_df = spark.createDataFrame([(int(w),) for w in windows], "w int")
    grid = sequences.select("doc_id", "tokens").crossJoin(F.broadcast(win_df))

    schema = "doc_id string, w int, pos int, mp double, pi int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, tokens, w in zip(pdf["doc_id"], pdf["tokens"], pdf["w"]):
                a = np.asarray(tokens, dtype=np.float64)
                w = int(w)
                ez_n = exclusion_zone_size(w, exclusion_zone)
                if a.shape[0] < w + ez_n + 1:
                    continue
                r = mpx(a, w, minlag=ez_n + 1)
                n = r.mp.shape[0]
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": np.repeat(doc_id, n),
                            "w": np.repeat(np.int32(w), n),
                            "pos": np.arange(n, dtype=np.int32),
                            "mp": _clean(r.mp),
                            "pi": r.pi.astype(np.int32),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    n_parts = spark.sparkContext.defaultParallelism
    return grid.repartition(n_parts).mapInPandas(kernel, schema)


def analyze(
    sequences: DataFrame,
    window_size: int,
    n_motifs: int = 3,
    n_discords: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """analyze.R:44-73 analogue: profile + top-k motifs and discords per
    series, one pass. Output: (doc_id, kind, rank, pos, pair_pos, value)."""
    from ..mpcore import find_discords, find_motifs, stomp

    w = int(window_size)
    schema = "doc_id string, kind string, rank int, pos int, pair_pos int, value double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                a = np.asarray(tokens, dtype=np.float64)
                ez_n = exclusion_zone_size(w, 0.5)
                if a.shape[0] < w + ez_n + 1:
                    continue
                r = stomp(a, w)
                motifs = find_motifs(r, n_motifs=n_motifs)
                discords = find_discords(r, n_discords=n_discords)
                for rank, pair in enumerate(motifs.motif_idx):
                    rows.append(
                        {
                            "doc_id": doc_id, "kind": "motif", "rank": rank,
                            "pos": int(pair[0]), "pair_pos": int(pair[1]),
                            "value": float(r.mp[pair[0]]),
                        }
                    )
                for rank, idx in enumerate(discords.discord_idx):
                    rows.append(
                        {
                            "doc_id": doc_id, "kind": "discord", "rank": rank,
                            "pos": int(idx), "pair_pos": int(r.pi[idx]),
                            "value": float(r.mp[idx]),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    # same knob convention as matrix_profile: None = defaultParallelism
    # (the local single-row-group rebalance), 0 = trust the input layout
    # (NO shuffle — the warehouse-scale setting, CLAUDE.md parallelism rule)
    base = sequences.select("doc_id", "tokens")
    if num_partitions is None:
        num_partitions = sequences.sparkSession.sparkContext.defaultParallelism
    if num_partitions:
        base = base.repartition(num_partitions)
    return base.mapInPandas(kernel, schema)
