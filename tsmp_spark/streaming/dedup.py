"""Streaming exact dedup: documents arrive as a stream; the FIRST
occurrence of each content hash (md5 of normalized text — the same
canonical form as ``operators.dedup.exact_dedup``) survives, every later
arrival is flagged a duplicate, across micro-batch boundaries.

Semantics vs the batch op: ``exact_dedup`` keeps the global min doc_id
per hash; a stream can only keep the FIRST ARRIVAL (within a
micro-batch, doc_id order — so feeding the corpus in doc_id-ordered
batches reproduces the batch survivor set exactly, pytest-gated). Same
append-only / watermark-0 ordered-append contract as the packing and
profile streams (streaming/packing.py, streaming/stompi.py).

State is O(1) per DISTINCT hash (first id + arrival count), so the
state store grows with the distinct-document count — inherent to
streaming dedup; at warehouse scale back it with the RocksDB state
store provider and let the hash key partition it evenly (md5 is
uniform, no skew salting needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalize_text

OUTPUT_SCHEMA = "content_hash string, doc_id long, is_first boolean, dup_idx long"
STATE_SCHEMA = "first_id long, n_seen long"


def _dedup_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_id, n_seen = state.get
    else:
        first_id, n_seen = None, 0
    (content_hash,) = key
    # concatenate all Arrow chunks first, sort ONCE — the multi-chunk
    # arrival-order lesson from the streaming packer (streaming/packing.py)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if chunks:
        whole = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        for doc_id in whole["doc_id"]:
            if n_seen == 0:
                first_id = int(doc_id)
            out.append(
                {
                    "content_hash": content_hash,
                    "doc_id": int(doc_id),
                    "is_first": n_seen == 0,
                    "dup_idx": n_seen,
                }
            )
            n_seen += 1
    state.update((first_id, n_seen))
    if out:
        yield pd.DataFrame(out)


def dedup_stream(
    doc_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming counterpart of ``exact_dedup``: input is a streaming
    DataFrame of documents; output is a streaming DataFrame with one row
    per arriving document — ``is_first`` marks the survivor, later
    arrivals carry their duplicate index. Keyed by the content hash, so
    the stateful stage partitions uniformly (md5) and each group's state
    is two scalars."""
    keyed = doc_stream.select(
        F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_func,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


UPSERT_OUTPUT_SCHEMA = (
    "user_id long, event_type string, n_seen long, "
    "latest_sec long, latest_event_id long, latest_vu long"
)
UPSERT_STATE_SCHEMA = "sec long, eid long, vu long, n_seen long"


def _upsert_func(key, pdfs, state):
    """Latest-wins upsert state: keep the max (sec, event_id) row per
    key — max over a total order is COMMUTATIVE, so stream==batch holds
    for ANY arrival order (the hll_stream contract)."""
    import pandas as pd

    if state.exists:
        sec, eid, vu, n_seen = state.get
    else:
        sec, eid, vu, n_seen = -1, -1, 0, 0
    user_id, event_type = key
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        for s, e, v in zip(pdf["sec"], pdf["event_id"], pdf["vu"]):
            if (int(s), int(e)) > (sec, eid):
                sec, eid, vu = int(s), int(e), int(v)
    state.update((sec, eid, vu, n_seen))
    yield pd.DataFrame(
        [
            {
                "user_id": int(user_id),
                "event_type": event_type,
                "n_seen": int(n_seen),
                "latest_sec": sec,
                "latest_event_id": eid,
                "latest_vu": vu,
            }
        ]
    )


def upsert_stream(event_stream):
    """Streaming CDC latest-wins compaction: one snapshot row per
    stream key per micro-batch carrying the running latest (sec,
    event_id, value) — the MERGE-on-read collapse maintained online.
    State is O(1) per key; the LAST snapshot (max n_seen) equals the
    batch ``latest_snapshot`` exactly, for any arrival order."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return event_stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _upsert_func,
        outputStructType=UPSERT_OUTPUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
