"""Streaming continuous aggregates — the rollup tiers maintained
incrementally from an event stream (the TimescaleDB-style half of the
north star, in native Structured Streaming).

``rollup_stream`` is a pure built-in plan: watermark → bucketed groupBy →
update-mode aggregates. No Python in the stream; state is the open
buckets, bounded by the watermark horizon (closed buckets are finalized
and evicted by Spark's state store). The batch ``rollup_tier`` and this
stream produce identical rows for fully-ingested data — pytest-gated by
draining a file stream and diffing against the batch rollup.

Semantics vs batch: the batch tier buckets *positions* (pos div bucket);
a stream has no global positions, so the streaming tier buckets event
*time* (window(ts, bucket_duration)) — the same continuous-aggregate
shape TimescaleDB/the retention layer use at ingest time. Late rows
inside the watermark update their bucket in place (update output mode);
rows later than the watermark are dropped — that bound is the state-size
contract that lets this run forever at 10^12-event scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_stream(
    events: DataFrame,
    bucket_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Continuous tier-1 aggregate over a streaming events source.

    Input: a streaming DataFrame (``spark.readStream...``) with at least
    (ts, user_id, value). Output (update mode): one row per
    (doc_id, bucket_start) with min/avg/max/count — the same aggregate
    set as the batch ``rollup_tier``.
    """
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).cast("string").alias("doc_id"),
            F.window(ts_col, bucket_duration).alias("bucket"),
        )
        .agg(
            F.min(v).alias("v_min"),
            F.avg(v).alias("v_avg"),
            F.max(v).alias("v_max"),
            F.count(v).alias("n"),
        )
        .select(
            "doc_id",
            F.col("bucket.start").alias("bucket_start"),
            "v_min",
            "v_avg",
            "v_max",
            "n",
        )
    )


def rollup_batch_equivalent(
    events: DataFrame,
    bucket_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The batch plan the stream must converge to once drained — same
    expressions, no watermark (used by tests and backfill jobs: a tier
    backfill over historical parquet IS this query)."""
    v = F.col(value_col)
    return (
        events.groupBy(
            F.col(key_col).cast("string").alias("doc_id"),
            F.window(ts_col, bucket_duration).alias("bucket"),
        )
        .agg(
            F.min(v).alias("v_min"),
            F.avg(v).alias("v_avg"),
            F.max(v).alias("v_max"),
            F.count(v).alias("n"),
        )
        .select(
            "doc_id",
            F.col("bucket.start").alias("bucket_start"),
            "v_min",
            "v_avg",
            "v_max",
            "n",
        )
    )


OHLC_OUTPUT_SCHEMA = (
    "key string, bucket long, n_seen long, open double, high double, "
    "low double, close double, vol_centi long, n long, first_ts long, "
    "first_id long, last_ts long, last_id long"
)
OHLC_STATE_SCHEMA = (
    "open double, high double, low double, close double, vol_centi long, "
    "n long, first_ts long, first_id long, last_ts long, last_id long"
)


def _ohlc_func(key, pdfs, state):
    """Per-(key, bucket) candle fold. The candle is a COMMUTATIVE
    mergeable aggregate — open/close are picked by the TOTAL (ts, id)
    order carried in the state, high/low/vol/n are max/min/sums — so
    stream == batch holds for ANY arrival order (the hll register
    argument), pytest-gated with out-of-order micro-batches."""
    import numpy as np
    import pandas as pd

    if state.exists:
        (o, h, lo, c, vol, n, fts, fid, lts, lid) = state.get
    else:
        o = h = lo = c = None
        vol = n = 0
        fts = fid = lts = lid = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        t = pdf["t"].to_numpy()
        i = pdf["i"].to_numpy()
        v = pdf["v"].to_numpy()
        vc = pdf["v_centi"].to_numpy()
        order = np.lexsort((i, t))
        first, last = order[0], order[-1]
        if fts is None or (int(t[first]), int(i[first])) < (fts, fid):
            fts, fid, o = int(t[first]), int(i[first]), float(v[first])
        if lts is None or (int(t[last]), int(i[last])) > (lts, lid):
            lts, lid, c = int(t[last]), int(i[last]), float(v[last])
        bh, bl = float(np.max(v)), float(np.min(v))
        h = bh if h is None or bh > h else h
        lo = bl if lo is None or bl < lo else lo
        vol += int(vc.sum())
        n += len(pdf)
    state.update((o, h, lo, c, vol, n, fts, fid, lts, lid))
    (k, bucket) = key
    yield pd.DataFrame(
        [
            {
                "key": k,
                "bucket": int(bucket),
                "n_seen": int(n),
                "open": o,
                "high": h,
                "low": lo,
                "close": c,
                "vol_centi": int(vol),
                "n": int(n),
                "first_ts": fts,
                "first_id": fid,
                "last_ts": lts,
                "last_id": lid,
            }
        ]
    )


def ohlc_stream(
    event_stream: DataFrame,
    bucket_sec: int = 21600,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming counterpart of ``operators.rollup.ohlc``: the candle
    per (key, bucket) maintained incrementally by
    ``applyInPandasWithState``. One snapshot row per (key, bucket,
    micro-batch); ``n_seen`` makes append-mode rows distinct and
    monotone, and the LAST snapshot per (key, bucket) equals the batch
    candle EXACTLY for any arrival order — open/close re-derive from
    the carried (first_ts, first_id)/(last_ts, last_id) total-order
    metadata exactly like the batch tier merge, high/low/vol/n are
    commutative folds.

    State is ONE fixed-width row per open candle (~80 bytes) — bounded
    by open (key, bucket) pairs, not by events; the input derivation is
    JVM-side and SHARED with batch (``ohlc_rows``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.rollup import ohlc_rows

    rows = ohlc_rows(
        event_stream, bucket_sec, key_col, ts_col, value_col, id_col
    )
    return rows.groupBy("key", "bucket").applyInPandasWithState(
        _ohlc_func,
        outputStructType=OHLC_OUTPUT_SCHEMA,
        stateStructType=OHLC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SDT_OUTPUT_SCHEMA = "key string, bucket long, t long, v_centi long"
SDT_STATE_SCHEMA = (
    "at long, av long, pt long, pv long, fresh boolean, "
    "smax_n long, smax_d long, smin_n long, smin_d long"
)


def _sdt_func_factory(dev: int):
    def _sdt_func(key, pdfs, state):
        """Per-(key, bucket) swinging-door walk with O(1) state — the
        anchor, the previous point, and the two door rationals. The walk
        is ORDER-dependent (unlike the commutative candle fold), so the
        stream==batch contract is ORDERED INGEST per key (the
        sessionize_stream convention): each micro-batch sorts its own
        rows, batches must not interleave timestamps. Kept points emit
        the moment their door closes; the bucket's trailing point stays
        pending until the NEXT point arrives (batch semantics always
        keep the final point — the pytest compares modulo that flush).
        """
        import pandas as pd

        if state.exists:
            (at, av, pt, pv, fresh, smax_n, smax_d, smin_n, smin_d) = state.get
            started = True
        else:
            at = av = pt = pv = 0
            fresh = True
            smax_n = smin_n = 0
            smax_d = smin_d = 1
            started = False
        out = []
        (k, bucket) = key
        # Arrow may hand one micro-batch as SEVERAL chunks that are not
        # globally time-ordered — concat and sort ONCE so the ordered-
        # ingest contract only concerns batch boundaries, never chunk
        # boundaries.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allp = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(["t", "i"])
                .drop_duplicates("t", keep="last")
            )
            for t, v in zip(allp["t"], allp["v_centi"]):
                ct, cv = int(t), int(v)
                if not started:
                    at, av = ct, cv
                    pt, pv = ct, cv
                    fresh = True
                    started = True
                    out.append((ct, cv))  # first point always kept
                    continue
                if ct <= pt:
                    continue  # ordered-ingest contract: drop regressions
                dt = ct - at
                up_n, dn_n = cv + dev - av, cv - dev - av
                if fresh:
                    smax_n, smax_d = up_n, dt
                    smin_n, smin_d = dn_n, dt
                    fresh = False
                else:
                    if up_n * smax_d < smax_n * dt:
                        smax_n, smax_d = up_n, dt
                    if dn_n * smin_d > smin_n * dt:
                        smin_n, smin_d = dn_n, dt
                if smin_n * smax_d > smax_n * smin_d:
                    out.append((pt, pv))  # door closed: prev finalized
                    at, av = pt, pv
                    d2 = ct - at
                    smax_n, smax_d = cv + dev - av, d2
                    smin_n, smin_d = cv - dev - av, d2
                pt, pv = ct, cv
        state.update(
            (at, av, pt, pv, fresh, smax_n, smax_d, smin_n, smin_d)
        )
        if out:
            yield pd.DataFrame(
                [
                    {"key": k, "bucket": int(bucket), "t": t, "v_centi": v}
                    for t, v in out
                ]
            )

    return _sdt_func


def sdt_stream(
    event_stream: DataFrame,
    bucket_sec: int = 21600,
    dev_centi: int = 200,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming swinging-door trimming — historian compression AT
    INGEST: the batch ``rollup.sdt_compress`` door walk maintained
    incrementally per (key, bucket) with O(1) state (anchor + previous
    point + two integer door rationals; ~70 bytes per open window).

    Contract: ordered ingest per key (regressing timestamps within a
    group are dropped); kept points append as doors close, the open
    window's trailing point is pending until superseded. The input
    derivation is JVM-side and shares the batch centi quantization.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    b = F.floor(F.col(ts_col).cast("long") / bucket_sec).cast("long")
    rows = event_stream.select(
        F.col(key_col).cast("string").alias("key"),
        b.alias("bucket"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(id_col).cast("long").alias("i"),
        F.round(F.col(value_col).cast("double") * 100)
        .cast("bigint")
        .alias("v_centi"),
    )
    return rows.groupBy("key", "bucket").applyInPandasWithState(
        _sdt_func_factory(int(dev_centi)),
        outputStructType=SDT_OUTPUT_SCHEMA,
        stateStructType=SDT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RATE_OUTPUT_SCHEMA = (
    "key long, sec long, event_id long, allowed int, tokens_after long"
)
RATE_STATE_SCHEMA = "tokens long, prev_sec long"


def _make_rate_func(capacity: int, refill_per_sec: int):
    cap, refill = int(capacity), int(refill_per_sec)

    def func(key, pdfs, state):
        import pandas as pd

        if state.exists:
            tokens, prev = state.get
            prev = None if prev < 0 else int(prev)
        else:
            tokens, prev = cap, None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["sec", "event_id"], kind="mergesort"
        )
        secs = pdf["sec"].tolist()
        eids = pdf["event_id"].tolist()
        allowed, after = [], []
        tokens = int(tokens)
        for s, _e in zip(secs, eids):
            s = int(s)
            if prev is not None:
                tokens = min(cap, tokens + (s - prev) * refill)
            prev = s
            if tokens >= 1:
                tokens -= 1
                allowed.append(1)
            else:
                allowed.append(0)
            after.append(tokens)
        state.update((tokens, -1 if prev is None else prev))
        yield pd.DataFrame(
            {
                "key": [int(key[0])] * len(secs),
                "sec": secs,
                "event_id": eids,
                "allowed": allowed,
                "tokens_after": after,
            }
        )

    return func


def rate_limit_stream(
    event_stream,
    capacity: int = 5,
    refill_per_sec: int = 1,
    key_col: str = "user_id",
    sec_col: str = "sec",
    id_col: str = "event_id",
):
    """Streaming token-bucket rate limiter — the PRODUCTION twin of
    ``operators.rollup.rate_limit_replay``'s audit replay, as an
    ``applyInPandasWithState`` machine with the O(1) two-integer state
    the batch docstring promises: (tokens, prev_sec) per key, ~16
    bytes. Ordered-append contract (the stompi convention); within a
    batch rows sort by (sec, event_id). Every decision is the SAME
    integer recurrence, so every emitted row equals the batch replay
    row-for-row and the batch recursive-CTE oracle gates the drained
    stream directly (append mode: decisions are immutable once made).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = event_stream.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(sec_col).cast("long").alias("sec"),
        F.col(id_col).cast("long").alias("event_id"),
    )
    return rows.groupBy("key").applyInPandasWithState(
        _make_rate_func(capacity, refill_per_sec),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
