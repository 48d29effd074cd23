"""Streaming FLOSS — online semantic segmentation as a stateful Spark
operator.

The Spark rendering of tsmp's chunked ``floss`` driver (fluss.R:66-137):
per series key, state = the evolving MatrixProfile over a trailing
``data_window`` buffer (history-trimmed, offset-rebased) plus the split
list; each micro-batch appends its points via ``stompi_update``, computes
the online corrected arc counts (``floss_cac``, one-sided Kumaraswamy
ideal once trimming starts), and extracts threshold-gated splits with
exclusion-zone update-or-append (``floss_extract``).

Emits one row per detected/updated split (update semantics): consumers
keep the latest ``upd_seq`` per (doc_id, split_rank).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..mpcore import MatrixProfile, floss, stomp
from .stompi import _profile_from_state, _state_from_profile

FLOSS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("split_rank", T.IntegerType(), False),
        T.StructField("split_pos", T.IntegerType(), False),  # absolute stream position
        T.StructField("cac_value", T.DoubleType(), False),
        T.StructField("upd_seq", T.IntegerType(), False),
    ]
)

FLOSS_STATE_SCHEMA = T.StructType(
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
        T.StructField("cac_final", T.ArrayType(T.DoubleType()), True),
        T.StructField("segments", T.ArrayType(T.IntegerType()), True),
        T.StructField("seg_vals", T.ArrayType(T.DoubleType()), True),
    ]
)


def make_floss_func(window_size: int, data_window: int, threshold: float = 1.0):
    w = int(window_size)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        chunks = pd.concat(list(pdfs), ignore_index=True)
        chunks = chunks.sort_values(["chunk_id", "seq"], kind="stable")
        new_values = chunks["value"].to_numpy(dtype=np.float64)

        if state.exists:
            tup = state.get
            profile, upd_seq = _profile_from_state(tup[:9], w)
            cac_final = np.asarray(tup[9] or [], dtype=np.float64)
            segments = list(tup[10] or [])
            seg_vals = list(tup[11] or [])
            profile.cac_final = cac_final
        else:
            profile, upd_seq = None, 0
            segments, seg_vals = [], []
        upd_seq += 1

        if profile is None or profile.mp.shape[0] == 0:
            buffered = (
                np.concatenate([profile.data, new_values])
                if profile is not None
                else new_values
            )
            if buffered.shape[0] < 2 * w:
                empty = MatrixProfile(
                    mp=np.empty(0), pi=np.empty(0, np.int64), w=w, ez=0.5,
                    lmp=np.empty(0), lpi=np.empty(0, np.int64),
                    rmp=np.empty(0), rpi=np.empty(0, np.int64), data=buffered,
                )
                state.update(
                    _state_from_profile(empty, upd_seq) + ([], [], [])
                )
                return
            profile = stomp(buffered, w)
            new_values = np.empty(0)

        prev_segments = list(segments)
        if new_values.shape[0]:
            profile, segments, seg_vals = floss(
                profile, new_values, data_window, threshold=threshold,
                segments=segments, seg_vals=seg_vals,
            )

        cf = profile.cac_final
        cf_clean = np.where(np.isfinite(cf), cf, np.nan).tolist() if cf.shape[0] else []
        state.update(
            _state_from_profile(profile, upd_seq)
            + (cf_clean, [int(s) for s in segments], [float(v) for v in seg_vals])
        )

        changed = [
            (rank, s, v)
            for rank, (s, v) in enumerate(zip(segments, seg_vals))
            if rank >= len(prev_segments) or prev_segments[rank] != s
        ]
        if changed:
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_id, len(changed)),
                    "split_rank": np.asarray([c[0] for c in changed], np.int32),
                    "split_pos": np.asarray([c[1] for c in changed], np.int32),
                    "cac_value": np.asarray([c[2] for c in changed], np.float64),
                    "upd_seq": np.full(len(changed), upd_seq, np.int32),
                }
            )

    return fn


def floss_stateful(
    chunk_stream: DataFrame,
    window_size: int,
    data_window: int,
    threshold: float = 1.0,
) -> DataFrame:
    """chunk_stream: (doc_id, chunk_id, seq, value) streaming DataFrame.
    Returns detected/updated regime splits as they emerge."""
    return chunk_stream.groupBy("doc_id").applyInPandasWithState(
        make_floss_func(window_size, data_window, threshold),
        outputStructType=FLOSS_OUTPUT_SCHEMA,
        stateStructType=FLOSS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
