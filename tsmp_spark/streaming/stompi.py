"""Incremental / streaming matrix profile — the Spark rendering of
tsmp's ``stompi_update`` (stompi.R:18-134) and chunked ``floss`` ingest
(fluss.R:114-128).

Two forms:

- :func:`stompi_stateful` — Structured Streaming
  ``applyInPandasWithState`` per series key. State = (series tail, six
  profile vectors, offset) exactly like the reference's MatrixProfile
  object-as-state (SURVEY.md §1.1). Watermark semantics: the reference is
  strictly ordered append-only (SURVEY.md §2.9), so chunks must arrive
  in order per key — we document watermark = 0 and order by a chunk
  sequence number inside each micro-batch.
- :func:`stompi_update_batch` — the micro-batch/upsert analogue for batch
  pipelines and tests: one call per chunk table, same state evolution.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..mpcore import MatrixProfile, stomp, stompi_update

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),  # absolute (offset applied)
        T.StructField("mp", T.DoubleType(), True),
        T.StructField("pi", T.IntegerType(), True),
        # batch sequence of this emission: a position's final value is the
        # row with the highest upd_seq (old positions can improve when a
        # later window turns out to be their nearest neighbor)
        T.StructField("upd_seq", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.ArrayType(T.DoubleType()), True),
        T.StructField("mp", T.ArrayType(T.DoubleType()), True),
        T.StructField("pi", T.ArrayType(T.IntegerType()), True),
        T.StructField("lmp", T.ArrayType(T.DoubleType()), True),
        T.StructField("lpi", T.ArrayType(T.IntegerType()), True),
        T.StructField("rmp", T.ArrayType(T.DoubleType()), True),
        T.StructField("rpi", T.ArrayType(T.IntegerType()), True),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("upd_seq", T.IntegerType(), True),
    ]
)


def _profile_from_state(state_tuple, w: int) -> tuple[MatrixProfile, int]:
    data, mp, pi, lmp, lpi, rmp, rpi, offset, upd_seq = state_tuple
    def arr(x, dt):
        return np.asarray(x, dtype=dt)
    mpo = MatrixProfile(
        mp=arr(mp, np.float64), pi=arr(pi, np.int64), w=w, ez=0.5,
        lmp=arr(lmp, np.float64), lpi=arr(lpi, np.int64),
        rmp=arr(rmp, np.float64), rpi=arr(rpi, np.int64),
        data=arr(data, np.float64), offset=int(offset),
    )
    # stored NaN means Inf internally (Arrow has no inf-safe transport here)
    for v in (mpo.mp, mpo.lmp, mpo.rmp):
        v[np.isnan(v)] = np.inf
    return mpo, int(upd_seq or 0)


def _state_from_profile(p: MatrixProfile, upd_seq: int = 0):
    def clean(v):
        out = np.asarray(v, dtype=np.float64).copy()
        out[~np.isfinite(out)] = np.nan
        return out.tolist()
    return (
        p.data.tolist(),
        clean(p.mp),
        p.pi.astype(np.int32).tolist(),
        clean(p.lmp),
        p.lpi.astype(np.int32).tolist(),
        clean(p.rmp),
        p.rpi.astype(np.int32).tolist(),
        int(p.offset),
        int(upd_seq),
    )


def make_stompi_func(window_size: int, history_size: int = 0):
    """Build the applyInPandasWithState function.

    Emits every profile row whose value changed this micro-batch (update
    semantics): consumers take, per (doc_id, pos), the row with the highest
    ``upd_seq``. A matrix profile is never append-final — an old position
    improves whenever a later window becomes its nearest neighbor — so
    changed-row emission is the only correct streaming contract.
    """
    w = int(window_size)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        chunks = pd.concat(list(pdfs), ignore_index=True)
        # strictly ordered append (watermark-0 semantics)
        chunks = chunks.sort_values(["chunk_id", "seq"], kind="stable")
        new_values = chunks["value"].to_numpy(dtype=np.float64)

        prev, upd_seq = (
            _profile_from_state(state.get, w) if state.exists else (None, 0)
        )
        upd_seq += 1
        if prev is None or prev.mp.shape[0] == 0:
            buffered = (
                np.concatenate([prev.data, new_values]) if prev is not None else new_values
            )
            if buffered.shape[0] < 2 * w:
                # not enough to bootstrap: stash raw data, emit nothing
                empty = MatrixProfile(
                    mp=np.empty(0), pi=np.empty(0, np.int64), w=w, ez=0.5,
                    lmp=np.empty(0), lpi=np.empty(0, np.int64),
                    rmp=np.empty(0), rpi=np.empty(0, np.int64), data=buffered,
                )
                state.update(_state_from_profile(empty, upd_seq))
                return
            profile = stomp(buffered, w)
            old_mp = np.empty(0)
            old_pi = np.empty(0, np.int64)
            old_offset = 0
        else:
            old_mp, old_pi, old_offset = prev.mp.copy(), prev.pi.copy(), prev.offset
            profile = stompi_update(prev, new_values, history_size=history_size)

        state.update(_state_from_profile(profile, upd_seq))
        n = profile.mp.shape[0]
        if n == 0:
            return

        # changed-row detection in ABSOLUTE positions (offset-rebased)
        changed = np.ones(n, dtype=bool)
        if old_mp.shape[0]:
            shift = profile.offset - old_offset  # rows trimmed this batch
            overlap = old_mp.shape[0] - shift
            if overlap > 0:
                same = (
                    (profile.mp[:overlap] == old_mp[shift:])
                    | (~np.isfinite(profile.mp[:overlap]) & ~np.isfinite(old_mp[shift:]))
                ) & (profile.pi[:overlap] == (old_pi[shift:] - shift))
                changed[:overlap] = ~same
        idx = np.flatnonzero(changed)
        if idx.shape[0] == 0:
            return
        mp_out = profile.mp[idx].copy()
        mp_out[~np.isfinite(mp_out)] = np.nan
        pi_out = profile.pi[idx].astype(np.int64)
        pi_abs = np.where(pi_out >= 0, pi_out + profile.offset, -1)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_id, idx.shape[0]),
                "pos": (idx + profile.offset).astype(np.int32),
                "mp": mp_out,
                "pi": pi_abs.astype(np.int32),
                "upd_seq": np.full(idx.shape[0], upd_seq, np.int32),
            }
        )

    return fn


def stompi_stateful(
    chunk_stream: DataFrame, window_size: int, history_size: int = 0
) -> DataFrame:
    """chunk_stream: streaming DataFrame
    ``(doc_id string, chunk_id long, seq long, value double)`` —
    one row per new point, (chunk_id, seq) gives the per-key order.
    Returns a streaming DataFrame of changed profile rows (take the max
    ``upd_seq`` per (doc_id, pos) for the current value)."""
    return chunk_stream.groupBy("doc_id").applyInPandasWithState(
        make_stompi_func(window_size, history_size),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stompi_update_batch(
    profiles: dict[str, MatrixProfile],
    chunk: pd.DataFrame,
    window_size: int,
    history_size: int = 0,
) -> dict[str, MatrixProfile]:
    """Batch/upsert analogue used by non-streaming pipelines: evolve a dict
    of per-series profiles with one chunk table (columns doc_id, value,
    ordered)."""
    for doc_id, grp in chunk.groupby("doc_id", sort=True):
        vals = grp["value"].to_numpy(dtype=np.float64)
        if doc_id in profiles:
            profiles[doc_id] = stompi_update(
                profiles[doc_id], vals, history_size=history_size
            )
        else:
            profiles[doc_id] = stomp(vals, window_size)
    return profiles
