"""Streaming HyperLogLog distinct counts: events arrive as a stream;
each micro-batch folds new register observations into a 512-byte state
per time bucket and emits the updated estimate snapshot.

Unlike the packing/profile streams (watermark-0 ORDERED-append
contract), HLL registers are COMMUTATIVE — max-merge is
order-insensitive — so stream==batch holds for ANY arrival order, not
just doc-id-ordered batches (pytest feeds batches out of order and
still matches ``operators.sketch.hll_rollup`` register-for-register).

State is exactly m=512 bytes per open bucket (rho ≤ 24 fits uint8) —
bounded regardless of item cardinality, the same reason the batch
sketch exists. The hash/register derivation is JVM-side and shared
with the batch operator (``hll_register_rows``); the Python state
function only max-merges a numpy array.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import HLL_M, HLL_REST_BITS, hll_register_rows

OUTPUT_SCHEMA = "bucket long, n_seen long, zeros long, z_int long, est double"
STATE_SCHEMA = "regs binary, n_seen long"


def _estimate(regs: np.ndarray) -> tuple[int, int, float]:
    """(zeros, z_int, est) from a register array — the SAME arithmetic
    as the batch operator's Spark expressions: exact integer
    Z = Σ 2^(24−reg), alpha·m²·2^24/Z, linear-counting correction.
    ``est`` is rounded half-away (matching Spark/DuckDB round on
    doubles; Python's built-in round is half-even and would diverge on
    exact .5e-6 boundaries)."""
    zeros = int((regs == 0).sum())
    z_int = int((np.int64(1) << (HLL_REST_BITS + 1 - regs.astype(np.int64))).sum())
    alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    raw = alpha * float(HLL_M * HLL_M) * float(1 << (HLL_REST_BITS + 1)) / z_int
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / zeros)
    else:
        est = raw
    return zeros, z_int, math.floor(est * 1e6 + 0.5) / 1e6


def _hll_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        regs_bytes, n_seen = state.get
        regs = np.frombuffer(regs_bytes, dtype=np.uint8).copy()
    else:
        regs, n_seen = np.zeros(HLL_M, dtype=np.uint8), 0
    (bucket,) = key
    new = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        idx = pdf["idx"].to_numpy(dtype=np.int64)
        rho = pdf["rho"].to_numpy(dtype=np.uint8)
        np.maximum.at(regs, idx, rho)
        new += len(pdf)
    n_seen += new
    state.update((regs.tobytes(), n_seen))
    zeros, z_int, est = _estimate(regs)
    yield pd.DataFrame(
        [
            {
                "bucket": int(bucket),
                "n_seen": int(n_seen),
                "zeros": zeros,
                "z_int": z_int,
                "est": est,
            }
        ]
    )


def hll_stream(
    event_stream: DataFrame,
    bucket_sec: int = 3600,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """Streaming counterpart of ``hll_rollup``: one snapshot row per
    (bucket, micro-batch) carrying the running distinct-count sketch —
    ``n_seen`` makes append-mode rows distinct and monotone, the LAST
    snapshot per bucket equals the batch sketch exactly (any arrival
    order; registers are commutative)."""
    rows = hll_register_rows(event_stream, bucket_sec, item_col, ts_col)
    return rows.groupBy("bucket").applyInPandasWithState(
        _hll_func,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMS_OUTPUT_SCHEMA = "bucket long, n_seen long, r int, c int, cell_cnt long"
CMS_STATE_SCHEMA = "counters binary, n_seen long"


def _cms_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from ..operators.sketch import CMS_D, CMS_W

    if state.exists:
        counters_bytes, n_seen = state.get
        counters = np.frombuffer(counters_bytes, dtype=np.int64).copy()
    else:
        counters, n_seen = np.zeros(CMS_D * CMS_W, dtype=np.int64), 0
    (bucket,) = key
    for pdf in pdfs:
        if not len(pdf):
            continue
        for r in range(CMS_D):
            cols = pdf[f"c{r}"].to_numpy(dtype=np.int64)
            np.add.at(counters, r * CMS_W + cols, 1)
        n_seen += len(pdf)
    state.update((counters.tobytes(), n_seen))
    nz = np.nonzero(counters)[0]
    yield pd.DataFrame(
        {
            "bucket": np.repeat(np.int64(bucket), len(nz)),
            "n_seen": np.repeat(np.int64(n_seen), len(nz)),
            "r": (nz // CMS_W).astype(np.int32),
            "c": (nz % CMS_W).astype(np.int32),
            "cell_cnt": counters[nz],
        }
    )


def cms_stream(
    event_stream: DataFrame,
    bucket_sec: int = 86400,
    item_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Streaming counterpart of the ``cms_counts`` counter BUILD: each
    micro-batch folds item arrivals into the d×w=1024-cell counter
    state per time bucket (8 KB per open bucket — bounded regardless of
    item cardinality) and emits the nonzero cells as an append-mode
    snapshot tagged with ``n_seen`` (monotone — the LAST snapshot per
    bucket is the final counter table).

    Counters are COMMUTATIVE (cell-wise sums), so stream==batch holds
    for ANY arrival order — same contract as ``hll_stream``, gated by
    the same SQL cells chain as the batch oracle. The hash derivation
    is JVM-side and SHARED with the batch operator
    (``operators.sketch.cms_hash_rows``); the Python state function
    only increments a numpy array.
    """
    from ..operators.sketch import cms_hash_rows

    rows = cms_hash_rows(event_stream, bucket_sec, item_col, ts_col).drop("item")
    return rows.groupBy("bucket").applyInPandasWithState(
        _cms_func,
        outputStructType=CMS_OUTPUT_SCHEMA,
        stateStructType=CMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HDR_OUTPUT_SCHEMA = "key string, bucket long, n_seen long, idx long, cnt long"
HDR_STATE_SCHEMA = "idxs binary, cnts binary, n_seen long"


def _hdr_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        idx_b, cnt_b, n_seen = state.get
        idxs = np.frombuffer(idx_b, dtype=np.int64)
        cnts = np.frombuffer(cnt_b, dtype=np.int64)
    else:
        idxs = np.empty(0, dtype=np.int64)
        cnts = np.empty(0, dtype=np.int64)
        n_seen = 0
    k, bucket = key
    parts_i, parts_c = [idxs], [cnts]
    for pdf in pdfs:
        if not len(pdf):
            continue
        ni, nc = np.unique(pdf["idx"].to_numpy(dtype=np.int64), return_counts=True)
        parts_i.append(ni)
        parts_c.append(nc)
        n_seen += len(pdf)
    all_i = np.concatenate(parts_i)
    all_c = np.concatenate(parts_c)
    idxs, inv = np.unique(all_i, return_inverse=True)
    cnts = np.zeros(len(idxs), dtype=np.int64)
    np.add.at(cnts, inv, all_c)
    state.update((idxs.tobytes(), cnts.tobytes(), int(n_seen)))
    yield pd.DataFrame(
        {
            "key": np.repeat(k, len(idxs)),
            "bucket": np.repeat(np.int64(bucket), len(idxs)),
            "n_seen": np.repeat(np.int64(n_seen), len(idxs)),
            "idx": idxs,
            "cnt": cnts,
        }
    )


def hdr_stream(
    event_stream: DataFrame,
    bucket_sec: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
) -> DataFrame:
    """Streaming counterpart of ``operators.sketch.hdr_rollup``: each
    micro-batch folds exponential-bucket index arrivals into a sparse
    (idx → cnt) state per (key, time bucket) and emits the populated
    buckets as an append-mode snapshot tagged with monotone ``n_seen``
    (the LAST snapshot per (key, bucket) is the final sketch).

    State is ≤ 16 populated sub-buckets per octave — a few KB per open
    (key, bucket) regardless of raw-row count or value cardinality, the
    HDR bound. Counts are COMMUTATIVE (cell-wise sums), so stream==batch
    holds for ANY arrival order — the hll/cms contract, gated by the
    same index chain as the batch oracle. Index derivation is JVM-side
    and SHARED with the batch operator (``hdr_index_rows``); the Python
    state function only buckets-and-adds a numpy array.
    """
    from ..operators.sketch import hdr_index_rows

    rows = hdr_index_rows(event_stream, bucket_sec, key_col, ts_col, value_col)
    return rows.groupBy("key", "bucket").applyInPandasWithState(
        _hdr_func,
        outputStructType=HDR_OUTPUT_SCHEMA,
        stateStructType=HDR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUTPUT_SCHEMA = "bucket long, n_seen long, item long, est long"
MG_STATE_SCHEMA = "items array<long>, ests array<long>, n_seen long"
MG_STREAM_K = 8


def _mg_reduce(counts: dict, k: int) -> dict:
    """One Misra–Gries reduce (Agarwal et al. PODS 2012 §2.1): if more
    than k counters survive, subtract the (k+1)-th largest and prune.
    theta is a fixed position of the count multiset — deterministic
    under any tie order."""
    if len(counts) <= k:
        return {i: c for i, c in counts.items() if c > 0}
    theta = sorted(counts.values(), reverse=True)[k]
    return {i: c - theta for i, c in counts.items() if c > theta}


def _mg_func(key, pdfs, state):
    import pandas as pd

    if state.exists:
        items, ests, n_seen = state.get
        summary = dict(zip(items, ests))
    else:
        summary, n_seen = {}, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        for item, cnt in pdf["item"].value_counts().items():
            summary[int(item)] = summary.get(int(item), 0) + int(cnt)
        n_seen += len(pdf)
    summary = _mg_reduce(summary, MG_STREAM_K)
    items = sorted(summary)
    state.update(([int(i) for i in items],
                  [int(summary[i]) for i in items], int(n_seen)))
    (bucket,) = key
    if items:
        yield pd.DataFrame(
            {
                "bucket": [int(bucket)] * len(items),
                "n_seen": [int(n_seen)] * len(items),
                "item": items,
                "est": [int(summary[i]) for i in items],
            }
        )
    else:  # keep a snapshot row so the drained state is observable
        yield pd.DataFrame(
            [{"bucket": int(bucket), "n_seen": int(n_seen),
              "item": None, "est": None}]
        )


def mg_stream(
    event_stream: DataFrame,
    bucket_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """Heavy hitters maintained AT INGEST with k-bounded state — the
    streaming face of ``operators.sketch.mg_summary``: each micro-batch
    contributes its exact item counts, merged into the running
    Misra–Gries summary by the Agarwal et al. MERGE (sum counters,
    subtract the (k+1)-th largest, prune). State per open bucket is at
    most k (item, est) pairs + n — fixed bytes regardless of item
    cardinality, the property that lets this run forever at 10^12
    events where exact streaming counts cannot.

    Unlike the hll/cms/hdr/ohlc streams the RESULT is arrival-order
    dependent (MG is lossy; errors land on different items per order) —
    so there is deliberately NO stream==batch oracle. What IS
    order-independent is the guarantee, and the pytest gates exactly
    that under scrambled arrival: every reduce removes ≥ (k+1)·theta of
    counter mass and total mass is n, so Σ thetas ≤ n/(k+1) and the
    drained summary satisfies ``true − n/(k+1) ≤ est ≤ true`` with
    every item heavier than n/(k+1) present.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = event_stream.select(
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        F.col(item_col).cast("bigint").alias("item"),
    )
    return rows.groupBy("bucket").applyInPandasWithState(
        _mg_func,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


AMS_OUTPUT_SCHEMA = "bucket long, n_seen long, est_x16 long"
AMS_STATE_SCHEMA = "counters binary, n_seen long"


def _ams_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-bucket AMS fold: 64 signed integer counters (512 bytes).
    Counters are LINEAR in the multiset — integer adds commute — so
    stream == batch for ANY arrival order (the hll register argument);
    the estimate re-derives from the counters at every snapshot."""
    from ..operators.sketch import AMS_G, AMS_K, AMS_PER_G

    if state.exists:
        counters_bytes, n_seen = state.get
        counters = np.frombuffer(counters_bytes, dtype=np.int64).copy()
    else:
        counters, n_seen = np.zeros(AMS_K, dtype=np.int64), 0
    (bucket,) = key
    for pdf in pdfs:
        if not len(pdf):
            continue
        h0 = pdf["h0"].to_numpy(dtype=np.int64)
        h1 = pdf["h1"].to_numpy(dtype=np.int64)
        for j in range(AMS_K):
            h = h0 if j < 32 else h1
            counters[j] += len(h) - 2 * int(
                ((h >> (j % 32)) & 1).sum()
            )
        n_seen += len(pdf)
    state.update((counters.tobytes(), n_seen))
    g = counters.reshape(AMS_G, AMS_PER_G).astype(object)
    gsums = sorted(int((row * row).sum()) for row in g)
    yield pd.DataFrame(
        [
            {
                "bucket": int(bucket),
                "n_seen": int(n_seen),
                "est_x16": int(gsums[1]),  # lower median of 4
            }
        ]
    )


def ams_stream(
    event_stream: DataFrame,
    bucket_sec: int = 21600,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """Streaming counterpart of ``ams_f2``: the tug-of-war F2 sketch
    maintained incrementally per bucket. One snapshot row per (bucket,
    micro-batch); the LAST snapshot equals the batch estimate exactly
    for any arrival order (counter linearity). State = 64 int64
    counters = 512 bytes per open bucket; the hash derivation is
    JVM-side and SHARED with batch (``ams_hash_rows``)."""
    from ..operators.sketch import ams_hash_rows

    rows = ams_hash_rows(event_stream, bucket_sec, item_col, ts_col)
    return rows.groupBy("bucket").applyInPandasWithState(
        _ams_func,
        outputStructType=AMS_OUTPUT_SCHEMA,
        stateStructType=AMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- DGIM sliding-window bit counting ----------------------------------------

DGIM_OUTPUT_SCHEMA = "key long, n_window long, n_buckets long, est2 long, n_pos long"
DGIM_STATE_SCHEMA = "n_pos long, sizes array<long>, poss array<long>"

#: window sizes the stream snapshots — matches the batch driver query.
DGIM_WINDOWS = (8, 32, 128, 512)


def _dgim_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """True sequential DGIM (Datar et al. 2002): one bucket per 1-bit,
    cascade-merge the two OLDEST whenever three share a size. State is
    the O(log² N) bucket list (sizes + newest-one positions, newest
    first) — the streaming counterpart of the batch operator's closed
    form, which the stream==batch pytest pins bucket-for-bucket.

    ORDERED-append contract (the stompi convention): batches arrive in
    (ts, event_id) order across micro-batches; within a batch we sort."""
    if state.exists:
        n_pos, sizes_t, poss_t = state.get
        sizes, poss = list(sizes_t), list(poss_t)
    else:
        n_pos, sizes, poss = 0, [], []
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    for bit in pdf["bit"].to_numpy():
        n_pos += 1
        if not bit:
            continue
        sizes.insert(0, 1)
        poss.insert(0, n_pos)
        while True:
            merged = False
            seen: dict[int, list[int]] = {}
            for j, s in enumerate(sizes):
                seen.setdefault(s, []).append(j)
            for s in sorted(seen):
                idxs = seen[s]
                if len(idxs) == 3:
                    j1, j2 = idxs[-2], idxs[-1]  # the two OLDEST
                    sizes[j1] = 2 * s  # keeps the newer one's position
                    del sizes[j2]
                    del poss[j2]
                    merged = True
                    break
            if not merged:
                break
    state.update((n_pos, sizes, poss))
    out = []
    for n in DGIM_WINDOWS:
        inw = [s for s, p in zip(sizes, poss) if p >= n_pos - n + 1]
        est2 = 2 * sum(inw) - max(inw) if inw else 0
        out.append((int(key[0]), int(n), len(inw), int(est2), int(n_pos)))
    yield pd.DataFrame(
        out, columns=["key", "n_window", "n_buckets", "est2", "n_pos"]
    )


def dgim_stream(event_stream: DataFrame) -> DataFrame:
    """Streaming counterpart of ``operators.sketch.dgim_estimate``: the
    textbook DGIM state machine per key. One snapshot row per (key,
    window, micro-batch); the LAST snapshot equals the batch closed form
    exactly under the ordered-append contract. Expects columns
    ``key, ts, event_id, bit``."""
    return event_stream.groupBy("key").applyInPandasWithState(
        _dgim_func,
        outputStructType=DGIM_OUTPUT_SCHEMA,
        stateStructType=DGIM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PRESENCE_OUTPUT_SCHEMA = "key string, bucket long, n_seen long, mask long, n_active int"
PRESENCE_STATE_SCHEMA = "mask long, n_seen long"


def _presence_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(key, bucket) presence fold: ONE bigint mask. bit_or is
    commutative and idempotent — stream == batch for ANY arrival order
    AND under at-least-once replay (the strongest of the fold
    guarantees: even duplicate deliveries cannot change the mask)."""
    if state.exists:
        mask, n_seen = state.get
    else:
        mask, n_seen = 0, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        for s in pdf["slot"].to_numpy():
            mask |= 1 << int(s)
        n_seen += len(pdf)
    state.update((mask, n_seen))
    k, bucket = key
    yield pd.DataFrame(
        [
            {
                "key": str(k),
                "bucket": int(bucket),
                "n_seen": int(n_seen),
                "mask": int(mask),
                "n_active": int(bin(mask).count("1")),
            }
        ]
    )


def presence_stream(
    event_stream: DataFrame,
    bucket_sec: int = 3600,
    slots: int = 60,
    key_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Streaming counterpart of ``operators.sketch.presence_rollup``
    tier 1: the presence bitmap maintained incrementally per (key,
    bucket). One snapshot row per micro-batch; the LAST snapshot equals
    the batch mask exactly for any arrival order (bit_or commutes and
    is idempotent). State = one bigint + a count per open (key, bucket)
    — 16 bytes, the smallest state in the streaming family. Slot
    derivation is JVM-side and SHARED with batch
    (``presence_slot_rows``)."""
    from ..operators.sketch import presence_slot_rows

    rows = presence_slot_rows(event_stream, bucket_sec, slots, key_col, ts_col)
    return rows.groupBy("key", "bucket").applyInPandasWithState(
        _presence_func,
        outputStructType=PRESENCE_OUTPUT_SCHEMA,
        stateStructType=PRESENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
