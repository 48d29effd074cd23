"""Streaming sequence packing: documents arrive as a stream and each
(source, shard) packing stream keeps a carry buffer (leftover tokens
below one ``seq_len``) plus the next sequence index in
``applyInPandasWithState`` state; every micro-batch emits exactly the
full sequences it completes.

Semantics vs the batch op (``operators.tokens.pack_sequences``): the
batch op packs in global ``doc_id`` order; a stream can only pack in
ARRIVAL order (within a micro-batch, ``doc_id`` order — so feeding the
corpus in doc_id-ordered batches reproduces the batch output exactly,
pytest-gated). Append-only, watermark-0 — same ordered-append contract
as the profile streams (streaming/stompi.py). The trailing partial
sequence of each stream stays in state: it is not yet a training
sequence until the stream closes (flush by sending an end-of-stream
marker batch, or read it from the state store at teardown).

State is O(seq_len) per stream — bounded by the context length, not
the stream length."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, shard int, seq_idx long, tokens array<int>, n_docs long"
)
STATE_SCHEMA = "carry array<int>, next_seq long, carry_docs long"


def make_pack_func(seq_len: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            carry, next_seq, carry_docs = state.get
            buf = list(carry)
        else:
            buf, next_seq, carry_docs = [], 0, 0
        source, shard = key
        out = []
        n_docs = int(carry_docs)
        # a group larger than one Arrow batch arrives as MULTIPLE chunks in
        # arbitrary relative order — concatenate first, sort ONCE, so the
        # "within a micro-batch, doc_id order" contract holds at any batch
        # size (per-chunk sorting silently broke it past ~10k rows)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            for toks in whole["tokens"]:
                if toks is None or len(toks) == 0:
                    continue
                buf.extend(int(t) for t in toks)
                n_docs += 1
                while len(buf) >= seq_len:
                    out.append(
                        {
                            "source": source,
                            "shard": int(shard),
                            "seq_idx": int(next_seq),
                            "tokens": buf[:seq_len],
                            "n_docs": n_docs,
                        }
                    )
                    buf = buf[seq_len:]
                    next_seq += 1
                    # docs fully consumed leave the carry accounting;
                    # approximation: a doc spanning the cut counts in
                    # both sequences, mirroring the batch op's span rows
                    n_docs = 1 if buf else 0
        state.update((buf, int(next_seq), int(n_docs)))
        yield pd.DataFrame(
            out, columns=["source", "shard", "seq_idx", "tokens", "n_docs"]
        )

    return fn


def pack_stream(
    doc_stream: DataFrame,
    seq_len: int = 2048,
    shards: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
) -> DataFrame:
    """Streaming counterpart of ``pack_sequences``: input is a streaming
    DataFrame of tokenized documents; output is a streaming DataFrame of
    COMPLETED fixed-length sequences (append mode)."""
    from ..operators.tokens import shard_key

    keyed = doc_stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        shard_key(id_col, shards).alias("shard"),
        F.col(tokens_col).alias("tokens"),
    )
    return keyed.groupBy("source", "shard").applyInPandasWithState(
        make_pack_func(seq_len),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
