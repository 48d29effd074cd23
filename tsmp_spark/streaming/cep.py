"""Streaming CEP negation-pattern matching — the stateful counterpart
of ``operators.rollup.cep_pattern_match`` ("A then B within T with no C
strictly between", the ClickHouse sequenceMatch / Flink notFollowedBy
shape) as an ``applyInPandasWithState`` state machine.

Semantics equivalence (pytest + oracle-pinned): processing events in
the packed ``sk = sec·2²⁴ + event_id`` total order, every open A is
resolved by the FIRST B or C that follows it — which is exactly its
"next B" (matched iff within the window) or a C between it and any
later B (unmatched). Open A's left at drain are unmatched, matching the
batch operator's ``next_b IS NULL`` rows. So the LAST snapshot per key
equals the batch output row-for-row, and the batch DuckDB oracle gates
the drained stream directly.

ORDERED-append contract (the stompi/DGIM convention): micro-batches
arrive in ``sk`` order across batches; within a batch we sort. State
per key is the ascending list of open A sks — bounded by the longest
A-run between consecutive B/C events — plus six integers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PACK = 1 << 24

OUTPUT_SCHEMA = (
    "key long, n_seen long, n_a long, n_matches long, matched int, "
    "first_a_sec long, first_b_sec long"
)
STATE_SCHEMA = (
    "n_seen long, n_a long, n_matches long, first_sk long, first_b long, "
    "open_a array<long>"
)


def _make_func(window_sec: int):
    window_sec = int(window_sec)

    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, n_a, n_matches, first_sk, first_b, open_t = state.get
            open_a = list(open_t)
        else:
            n_seen, n_a, n_matches, first_sk, first_b = 0, 0, 0, -1, -1
            open_a = []
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "sk", kind="mergesort"
        )
        for sk, role in zip(pdf["sk"], pdf["role"]):
            sk = int(sk)
            n_seen += 1
            if role == 0:  # A
                n_a += 1
                open_a.append(sk)
            elif role == 1:  # B resolves every open A (this IS its next B)
                # window test on SECONDS (matches the batch operator):
                # a packed-key test would make the exact-boundary pair
                # id-dependent
                lo_sec = sk // PACK - window_sec
                matched = [a for a in open_a if a // PACK >= lo_sec]
                n_matches += len(matched)
                if matched and first_sk < 0:
                    first_sk = matched[0]
                    first_b = sk
                open_a = []
            else:  # C kills every open A (it sits between A and any later B)
                open_a = []
        state.update((n_seen, n_a, n_matches, first_sk, first_b, open_a))
        if n_a == 0:  # batch emits only keys with >=1 A event
            return
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "n_seen": [n_seen],
                "n_a": [n_a],
                "n_matches": [n_matches],
                "matched": [1 if n_matches > 0 else 0],
                "first_a_sec": [first_sk // PACK if first_sk >= 0 else None],
                "first_b_sec": [first_b // PACK if first_b >= 0 else None],
            }
        )

    return func


def cep_stream(
    event_stream: DataFrame,
    a_type: str,
    b_type: str,
    not_between: str,
    window_sec: int = 3600,
    key_col: str = "user_id",
    sec_col: str = "sec",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key streaming pattern matcher; one snapshot row per
    (key, micro-batch) — the LAST (max ``n_seen``) snapshot equals the
    batch operator exactly. Rows of other event types are filtered
    JVM-side before the state function (shared derivation with batch:
    the same packed-sk expression)."""
    from pyspark.sql import functions as F

    rows = (
        event_stream.select(
            F.col(key_col).cast("long").alias("key"),
            F.when(
                F.col(id_col).cast("long") < F.lit(PACK),
                F.col(sec_col).cast("long") * F.lit(PACK)
                + F.col(id_col).cast("long"),
            ).otherwise(
                F.raise_error(F.lit(
                    "cep_stream: event_id >= 2^24 breaks the packed "
                    "total order"
                )).cast("long")
            ).alias("sk"),
            F.when(F.col(type_col) == a_type, F.lit(0))
            .when(F.col(type_col) == b_type, F.lit(1))
            .when(F.col(type_col) == not_between, F.lit(2))
            .alias("role"),
        )
        .filter(F.col("role").isNotNull())
    )
    return rows.groupBy("key").applyInPandasWithState(
        _make_func(window_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
