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
