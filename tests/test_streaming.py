"""Structured Streaming STOMPi: stateful incremental profile equals the
batch profile when the stream is drained (micro-batched file source)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tsmp_spark.mpcore import stomp
from tsmp_spark.streaming import stompi_stateful

W = 16


@pytest.fixture()
def chunk_dir(tmp_path, spark):
    """Write per-chunk parquet files of two series so maxFilesPerTrigger=1
    drives multiple ordered micro-batches."""
    rng = np.random.default_rng(11)
    series = {
        "s1": np.cumsum(rng.choice([-1.0, 1.0], size=300)),
        "s2": np.cumsum(rng.choice([-1.0, 1.0], size=260)),
    }
    base = str(tmp_path / "chunks")
    os.makedirs(base)
    chunk = 50
    max_len = max(len(v) for v in series.values())
    file_no = 0
    for start in range(0, max_len, chunk):
        rows = []
        for doc_id, vals in series.items():
            seg = vals[start : start + chunk]
            for k, v in enumerate(seg):
                rows.append((doc_id, start // chunk, k, float(v)))
        if rows:
            df = spark.createDataFrame(
                rows, "doc_id string, chunk_id long, seq long, value double"
            )
            df.coalesce(1).write.parquet(f"{base}/f{file_no:03d}.parquet")
            file_no += 1
    return base, series


def test_stompi_stateful_equals_batch(spark, chunk_dir, tmp_path):
    base, series = chunk_dir
    stream = (
        spark.readStream.schema("doc_id string, chunk_id long, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    out = stompi_stateful(stream, W)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stompi_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        """
        SELECT doc_id, pos, mp, pi FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id, pos
                                       ORDER BY upd_seq DESC) AS rn
          FROM stompi_out
        ) WHERE rn = 1
        """
    ).toPandas()

    from brute import brute_distance_matrix
    from tsmp_spark.mpcore import exclusion_zone_size

    ez_n = exclusion_zone_size(W, 0.5)
    for doc_id, vals in series.items():
        ref = stomp(vals, W)
        g = got[got.doc_id == doc_id].sort_values("pos")
        assert len(g) == ref.mp.shape[0]
        ref_mp = ref.mp.copy()
        ref_mp[~np.isfinite(ref_mp)] = np.nan
        np.testing.assert_allclose(g["mp"].to_numpy(), ref_mp, atol=1e-6)
        # pi may flip on float-level ties (FFT sizes differ between the
        # incremental and batch paths); the distance AT pi must match and
        # the neighbor must be outside the exclusion zone
        bd = brute_distance_matrix(vals, vals, W)
        pis = g["pi"].to_numpy()
        pos = g["pos"].to_numpy()
        valid = pis >= 0
        assert np.all(np.abs(pos[valid] - pis[valid]) > ez_n)
        np.testing.assert_allclose(
            bd[pos[valid], pis[valid]], ref_mp[valid], atol=1e-5
        )


def test_floss_stateful_detects_regime(spark, tmp_path):
    """Streaming FLOSS: regime change in a drained stream produces a split
    near the true boundary (matches the batch floss driver semantics)."""
    import os

    import numpy as np

    from tsmp_spark.streaming import floss_stateful

    rng = np.random.default_rng(13)
    n_per = 400
    t = np.arange(n_per, dtype=np.float64)
    seg1 = np.sin(2 * np.pi * t / 25.0) + rng.standard_normal(n_per) * 0.05
    seg2 = np.cumsum(rng.standard_normal(n_per)) * 0.3
    series = np.concatenate([seg1, seg2 - seg2[0] + seg1[-1]])

    base = str(tmp_path / "floss_chunks")
    os.makedirs(base)
    chunk = 80
    fno = 0
    for start in range(0, len(series), chunk):
        seg = series[start : start + chunk]
        rows = [("s1", start // chunk, k, float(v)) for k, v in enumerate(seg)]
        spark.createDataFrame(
            rows, "doc_id string, chunk_id long, seq long, value double"
        ).coalesce(1).write.parquet(f"{base}/f{fno:03d}.parquet")
        fno += 1

    stream = (
        spark.readStream.schema("doc_id string, chunk_id long, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    out = floss_stateful(stream, window_size=25, data_window=300, threshold=0.8)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("floss_out")
        .option("checkpointLocation", str(tmp_path / "floss_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        """
        SELECT doc_id, split_rank, split_pos FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id, split_rank
                                       ORDER BY upd_seq DESC) AS rn
          FROM floss_out
        ) WHERE rn = 1
        """
    ).toPandas()
    assert len(got) >= 1
    # at least one split within 150 of the true regime change at 400
    assert (got.split_pos - 400).abs().min() < 150, got


def test_rollup_stream_matches_batch(spark, tmp_path):
    """Streaming continuous aggregate == batch rollup once drained.

    Events are written as two parquet files (simulating micro-batches,
    second file containing in-watermark late rows for buckets opened by
    the first); the update-mode sink's LAST emission per bucket must equal
    the batch aggregate over all rows."""
    import pandas as pd

    from tsmp_spark.streaming import rollup_batch_equivalent, rollup_stream

    src = tmp_path / "ev_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows1, rows2 = [], []
    for u in range(4):
        for k in range(40):
            rows1.append(
                {"ts": base + pd.Timedelta(minutes=3 * k), "user_id": u,
                 "value": float((u + 1) * k % 7)}
            )
        # late-but-in-watermark rows landing in the first hour's bucket
        for k in range(5):
            rows2.append(
                {"ts": base + pd.Timedelta(minutes=7 * k + 1), "user_id": u,
                 "value": float(100 + k)}
            )
    spark.createDataFrame(pd.DataFrame(rows1)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    spark.createDataFrame(pd.DataFrame(rows2)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = rollup_stream(stream, bucket_duration="1 hour", watermark="4 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("roll_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emission per (doc_id, bucket) wins (update mode re-emits)
    got = (
        spark.sql(
            """
            SELECT doc_id, bucket_start, v_min, v_avg, v_max, n FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id, bucket_start ORDER BY n DESC) AS rn
              FROM roll_sink) WHERE rn = 1
            """
        )
        .toPandas()
        .sort_values(["doc_id", "bucket_start"])
        .reset_index(drop=True)
    )
    all_events = spark.read.parquet(str(src / "*"))
    want = (
        rollup_batch_equivalent(all_events, bucket_duration="1 hour")
        .toPandas()
        .sort_values(["doc_id", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pack_stream_equals_batch(spark, tmp_path):
    """Streaming packer fed doc_id-ordered micro-batches emits exactly
    the batch op's FULL sequences (the trailing partial stays in
    state), with identical tokens and seq indexes."""
    import os

    import numpy as np

    from tsmp_spark.operators import pack_sequences
    from tsmp_spark.streaming.packing import pack_stream

    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        n = int(rng.integers(1, 40))
        rows.append(
            (f"d{i:03d}", [int(x) for x in rng.integers(0, 1000, n)], f"s{i % 3}")
        )
    batch_df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")

    base = str(tmp_path / "docs")
    os.makedirs(base)
    # doc_id-ordered arrival: file k holds docs [10k, 10(k+1))
    for k in range(4):
        spark.createDataFrame(
            rows[10 * k : 10 * (k + 1)],
            "doc_id string, tokens array<int>, source string",
        ).coalesce(1).write.parquet(f"{base}/f{k:02d}.parquet")

    stream = (
        spark.readStream.schema("doc_id string, tokens array<int>, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    out = pack_stream(stream, seq_len=32)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pack_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_pack"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.source, r.seq_idx): (r.tokens, r.n_docs)
        for r in spark.sql("SELECT * FROM pack_out").collect()
    }
    exp_rows = pack_sequences(batch_df, seq_len=32).collect()
    by_stream = {}
    for r in exp_rows:
        by_stream.setdefault(r.source, []).append(r)
    exp = {}
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.seq_idx)
        for r in rs[:-1] if rs[-1].n_tok < 32 else rs:
            exp[(r.source, r.seq_idx)] = (r.tokens, r.n_docs)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == exp[k][1], k


class _FakeState:
    """Minimal GroupState stand-in for driving the pack function directly."""

    def __init__(self):
        self.exists = False
        self._tuple = None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.exists = True


def _run_pack_func(chunks, seq_len=32):
    import pandas as pd

    from tsmp_spark.streaming.packing import make_pack_func

    fn = make_pack_func(seq_len)
    state = _FakeState()
    outs = list(fn(("s0", 0), iter(chunks), state))
    return pd.concat(outs, ignore_index=True), state


def test_pack_func_multichunk_doc_order():
    """A (source, shard) group larger than one Arrow batch arrives as
    MULTIPLE pandas chunks in arbitrary relative order; packing must sort
    the WHOLE micro-batch by doc_id once, not per-chunk — the output must
    be identical however the rows are split across chunks."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    docs = [
        (f"d{i:03d}", [int(x) for x in rng.integers(0, 999, int(rng.integers(3, 30)))])
        for i in range(30)
    ]
    whole = pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "tokens": [t for _, t in docs]}
    )
    ref, _ = _run_pack_func([whole])

    # adversarial split: chunks arrive in REVERSE doc ranges, rows shuffled
    perm = whole.sample(frac=1.0, random_state=3).reset_index(drop=True)
    chunks = [perm.iloc[20:30], perm.iloc[0:10], perm.iloc[10:20]]
    got, _ = _run_pack_func(chunks)

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_pack_stream_late_batch_appends_in_arrival_order():
    """Out-of-order arrival ACROSS micro-batches: the packer's contract
    is watermark-0 arrival-order append (doc_id order only WITHIN a
    micro-batch). A batch whose doc_ids precede already-packed ones is
    packed at its ARRIVAL position — the carry buffer and seq indexes
    continue uninterrupted, and the output equals packing the
    arrival-order concatenation, NOT the doc_id-order corpus."""
    import numpy as np
    import pandas as pd

    from tsmp_spark.streaming.packing import make_pack_func

    rng = np.random.default_rng(5)
    docs = [
        (f"d{i:03d}", [int(x) for x in rng.integers(0, 999, int(rng.integers(3, 30)))])
        for i in range(30)
    ]
    batches = [docs[0:10], docs[20:30], docs[10:20]]  # middle arrives LAST

    fn = make_pack_func(32)
    state = _FakeState()
    outs = []
    for b in batches:
        pdf = pd.DataFrame(
            {"doc_id": [d for d, _ in b], "tokens": [t for _, t in b]}
        )
        outs.extend(list(fn(("s0", 0), iter([pdf]), state)))
    got = pd.concat(outs, ignore_index=True)

    # expected: the flat token stream in ARRIVAL order (each batch in
    # doc_id order), cut into full 32-token sequences
    flat = [t for b in batches for _, toks in sorted(b) for t in toks]
    n_full = len(flat) // 32
    assert list(got["seq_idx"]) == list(range(n_full))
    for i in range(n_full):
        assert list(got["tokens"][i]) == flat[32 * i : 32 * (i + 1)], i
    # the late batch genuinely moved tokens: arrival order != doc_id order
    flat_sorted = [t for _, toks in sorted(docs) for t in toks]
    assert flat != flat_sorted
    # trailing partial stays in state, not in the output
    carry, next_seq, _ = state.get
    assert len(carry) == len(flat) - 32 * n_full
    assert next_seq == n_full


def test_stompi_late_chunk_appends_in_arrival_order(spark, tmp_path):
    """Out-of-order arrival ACROSS micro-batches: stompi's contract is
    watermark-0 ordered append — a chunk whose chunk_id precedes already
    -processed data is appended in ARRIVAL order (no reordering, no
    rejection, no crash). The drained profile equals the batch profile of
    the arrival-order concatenation, NOT of the chunk_id-order series."""
    import os

    import numpy as np

    from tsmp_spark.streaming import stompi_stateful

    rng = np.random.default_rng(23)
    vals = np.cumsum(rng.choice([-1.0, 1.0], size=240))
    pieces = [vals[0:80], vals[80:160], vals[160:240]]
    # write micro-batch files with chunk 2 arriving BEFORE chunk 1
    arrival = [0, 2, 1]
    base = str(tmp_path / "late")
    os.makedirs(base)
    for file_no, ci in enumerate(arrival):
        rows = [("s1", ci, k, float(v)) for k, v in enumerate(pieces[ci])]
        spark.createDataFrame(
            rows, "doc_id string, chunk_id long, seq long, value double"
        ).coalesce(1).write.parquet(f"{base}/f{file_no:03d}.parquet")

    stream = (
        spark.readStream.schema("doc_id string, chunk_id long, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        stompi_stateful(stream, W)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stompi_late")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        """
        SELECT pos, mp FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id, pos
                                       ORDER BY upd_seq DESC) AS rn
          FROM stompi_late
        ) WHERE rn = 1
        """
    ).toPandas().sort_values("pos")

    arrival_series = np.concatenate([pieces[ci] for ci in arrival])
    ref = stomp(arrival_series, W)
    ref_mp = ref.mp.copy()
    ref_mp[~np.isfinite(ref_mp)] = np.nan
    assert len(got) == ref_mp.shape[0]
    np.testing.assert_allclose(got["mp"].to_numpy(), ref_mp, atol=1e-6)
    # and it must NOT equal the chunk_id-order profile (the contract is
    # arrival order; if these coincide the test lost its teeth)
    in_order = stomp(vals, W).mp
    assert not np.allclose(
        np.nan_to_num(got["mp"].to_numpy()), np.nan_to_num(in_order), atol=1e-6
    )


def test_dedup_stream_equals_batch_and_cross_batch(spark, tmp_path):
    """Streaming exact dedup fed doc_id-ordered micro-batches: survivor
    set == batch exact_dedup keep_ids; a duplicate arriving in a LATER
    micro-batch is flagged (state crosses batch boundaries)."""
    import os

    from tsmp_spark.operators.dedup import exact_dedup
    from tsmp_spark.streaming.dedup import dedup_stream

    rows = []
    for i in range(30):
        # doc 3k repeats doc 3k-30's text in the next decade of ids:
        # cross-batch duplicates with the original arriving first
        text = f"unique text number {i}" if (i < 10 or i % 3) else f"unique text number {i - 10}"
        rows.append((i, text))
    batch_df = spark.createDataFrame(rows, "doc_id long, text string")

    base = str(tmp_path / "docs")
    os.makedirs(base)
    for k in range(3):
        spark.createDataFrame(
            rows[10 * k : 10 * (k + 1)], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(got) == 30  # one row per arriving doc
    survivors = {r.doc_id for r in got if r.is_first}
    keep_ids = {r.keep_id for r in exact_dedup(batch_df).collect()}
    assert survivors == keep_ids  # ordered arrival reproduces the batch op
    # cross-batch: doc 12 duplicates doc 2 (earlier batch) -> flagged
    by_id = {r.doc_id: r for r in got}
    assert not by_id[12].is_first and by_id[12].dup_idx >= 1
    assert by_id[2].is_first
    # duplicate indexes count arrivals per hash
    assert by_id[12].content_hash == by_id[2].content_hash


def test_sessionize_stream_equals_batch_splits(spark, tmp_path):
    """Native session_window streaming sessions == batch sessionize
    splits on fully-ingested ordered data (session_end = last event;
    stream keys by start time, batch by index — join on start)."""
    import os
    from datetime import datetime, timedelta

    from tsmp_spark.operators.rollup import sessionize
    from tsmp_spark.streaming.sessions import sessionize_stream

    base_ts = datetime(2024, 1, 1)
    rows = []
    for u, offs in [
        (1, [0, 10, 30, 300, 310, 900]),  # gap 60s -> sessions {0,10,30},{300,310},{900}
        (2, [5, 70, 130]),                # chain: each within 60s of previous
    ]:
        rows += [(u, base_ts + timedelta(seconds=o)) for o in offs]
    batch_df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    base = str(tmp_path / "ev")
    os.makedirs(base)
    for k in range(2):
        spark.createDataFrame(
            rows[k::2], "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        sessionize_stream(stream, gap="60 seconds", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    from pyspark.sql import functions as F

    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.duration)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    ev = batch_df.select("user_id", F.unix_timestamp("ts").alias("sec"))
    exp = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.duration)
        for r in sessionize(ev, 60, key_col="user_id", ts_col="sec").collect()
    }
    got_secs = {
        (u, int(s.timestamp())): (int(e.timestamp()), n, d)
        for (u, s), (e, n, d) in got.items()
    }
    # append mode emits only watermark-finalized sessions; every emitted
    # session must match the batch split exactly, and the final sessions
    # (which the watermark can't close) are the only permissible gap
    assert got_secs
    for key, val in got_secs.items():
        assert exp[key] == val
    missing = set(exp) - set(got_secs)
    last_starts = {
        max(s for (u2, s) in exp if u2 == u) for u in {u for u, _ in exp}
    }
    assert all(s in last_starts for _, s in missing)


def test_hll_stream_equals_batch_any_order(spark, tmp_path):
    """Streaming HLL fed OUT-OF-ORDER micro-batches still converges to
    the exact batch sketch — registers are commutative (max-merge), so
    unlike the ordered-append streams this equality needs no arrival
    contract at all."""
    import os

    from tsmp_spark.operators.sketch import hll_rollup
    from tsmp_spark.streaming.sketch import hll_stream

    rows = [(i * 37 % 500, (i % 3) * 4000) for i in range(600)]
    batch_df = spark.createDataFrame(rows, "user_id long, sec long")

    base = str(tmp_path / "ev")
    os.makedirs(base)
    # shuffled, reversed thirds: arrival order is scrambled twice over
    scrambled = rows[400:600] + rows[0:200] + rows[200:400]
    for k in range(3):
        spark.createDataFrame(
            scrambled[200 * k : 200 * (k + 1)], "user_id long, sec long"
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema("user_id long, sec long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        hll_stream(stream, bucket_sec=3600, item_col="user_id", ts_col="sec")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hll_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        "SELECT bucket, n_seen, zeros, z_int, est FROM (SELECT *, "
        "row_number() OVER (PARTITION BY bucket ORDER BY n_seen DESC) AS rn "
        "FROM hll_out) WHERE rn = 1"
    ).collect()
    want = {r.bucket: r for r in hll_rollup(
        batch_df, bucket_sec=3600, item_col="user_id", ts_col="sec"
    ).collect()}
    assert {r.bucket for r in got} == set(want)
    for r in got:
        w = want[r.bucket]
        assert (r.zeros, r.z_int) == (w.zeros, w.z_int)
        assert r.est == w.est  # both round half-away at 1e-6
    # snapshots are monotone: n_seen per bucket strictly increases and
    # the final one saw every row of that bucket
    per_bucket = {}
    for r in spark.sql("SELECT * FROM hll_out").collect():
        per_bucket.setdefault(r.bucket, []).append(r.n_seen)
    from collections import Counter
    true_counts = Counter(s // 3600 for _, s in rows)
    for b, seen in per_bucket.items():
        assert sorted(seen) == seen or len(set(seen)) == len(seen)
        assert max(seen) == true_counts[b]


def test_cms_stream_equals_batch_any_order(spark, tmp_path):
    """Streaming CMS fed OUT-OF-ORDER micro-batches converges to the
    exact batch counter table — counters are commutative sums, the
    hll_stream contract."""
    import os

    from tsmp_spark.operators.sketch import cms_hash_rows
    from tsmp_spark.streaming.sketch import cms_stream

    rows = [(f"e{i * 13 % 17}", (i % 2) * 5000) for i in range(500)]
    batch_df = spark.createDataFrame(rows, "event_type string, sec long")

    base = str(tmp_path / "ev")
    os.makedirs(base)
    scrambled = rows[300:500] + rows[0:300]
    for k, chunk in enumerate((scrambled[:250], scrambled[250:])):
        spark.createDataFrame(
            chunk, "event_type string, sec long"
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema("event_type string, sec long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        cms_stream(stream, bucket_sec=5000, item_col="event_type", ts_col="sec")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cms_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.bucket, r.r, r.c): r.cell_cnt
        for r in spark.sql(
            "SELECT bucket, r, c, cell_cnt FROM (SELECT *, row_number() OVER ("
            "PARTITION BY bucket, r, c ORDER BY n_seen DESC) AS rn "
            "FROM cms_out) WHERE rn = 1"
        ).collect()
    }
    # batch counter table from the SAME shared hash rows
    from pyspark.sql import functions as F

    cells = (
        cms_hash_rows(batch_df, 5000, "event_type", "sec")
        .select("bucket", F.posexplode(F.array("c0", "c1", "c2", "c3"))
                .alias("r", "c"))
        .groupBy("bucket", "r", "c")
        .agg(F.count("*").alias("cell_cnt"))
    )
    want = {(r.bucket, r.r, r.c): r.cell_cnt for r in cells.collect()}
    assert got == want


def test_attribution_stream_window_edges(spark, tmp_path):
    """Stream-stream join semantics: inclusive [click, click+W] window,
    per-user scoping, multi-pair emission — each exactly once."""
    import os
    from pyspark.sql import functions as F
    from tsmp_spark.streaming.joins import attribute_stream

    rows = [
        # (event_id, sec, user, type): purchases at lag 0, W, W+1
        (1, 1000, 1, "click"), (2, 1000, 1, "purchase"),
        (3, 1100, 1, "purchase"),            # in window for click 1
        (4, 1000 + 600, 1, "purchase"),      # exactly W -> included
        (5, 1000 + 601, 1, "purchase"),      # W+1 -> excluded
        (6, 1050, 2, "purchase"),            # other user -> excluded
        (7, 1090, 1, "click"),               # second click catches 3,4
    ]
    base = str(tmp_path / "ev")
    os.makedirs(base)
    spark.createDataFrame(
        [(i, s, u, t) for i, s, u, t in rows],
        "event_id long, sec long, user_id long, event_type string",
    ).withColumn("ts", F.col("sec").cast("timestamp")).coalesce(1) \
        .write.parquet(f"{base}/f0.parquet")

    stream = (
        spark.readStream.schema(
            "event_id long, sec long, user_id long, event_type string, ts timestamp"
        ).parquet(f"{base}/*")
    )
    out = attribute_stream(
        stream.where("event_type = 'click'"),
        stream.where("event_type = 'purchase'"),
        window_sec=600,
    )
    q = (
        out.writeStream.format("memory").queryName("attr_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.purchase_id): r.lag_sec
           for r in spark.sql("SELECT * FROM attr_t").collect()}
    assert got == {
        (1, 2): 0, (1, 3): 100, (1, 4): 600,
        (7, 3): 10, (7, 4): 510, (7, 5): 511,
    }


def test_upsert_stream_any_order(spark, tmp_path):
    """Latest-wins upsert stream fed out-of-order batches converges to
    the batch snapshot (max over a total order is commutative)."""
    import os
    from tsmp_spark.streaming.dedup import upsert_stream

    rows = [(i, i * 7 % 50, f"e{i % 3}", (i * 13) % 40, i * 10)
            for i in range(200)]  # (event_id, user, type, sec, vu)
    base = str(tmp_path / "ev")
    os.makedirs(base)
    scrambled = rows[120:] + rows[:120]
    for k, chunk in enumerate((scrambled[:100], scrambled[100:])):
        spark.createDataFrame(
            chunk, "event_id long, user_id long, event_type string, sec long, vu long"
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, sec long, vu long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        upsert_stream(stream)
        .writeStream.format("memory").queryName("ups_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.event_type): (r.latest_sec, r.latest_event_id, r.latest_vu)
           for r in spark.sql(
               "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "
               "user_id, event_type ORDER BY n_seen DESC) rn FROM ups_t) "
               "WHERE rn = 1").collect()}
    want = {}
    for eid, u, t, sec, vu in rows:
        k = (u, t)
        if k not in want or (sec, eid) > (want[k][0], want[k][1]):
            want[k] = (sec, eid, vu)
    assert got == want


def test_hdr_stream_equals_batch_any_order(spark, tmp_path):
    """Streaming HDR sketch fed OUT-OF-ORDER micro-batches converges to
    the exact batch sketch cell-for-cell — counts are commutative
    (cell-wise sums), so the equality needs no arrival contract (the
    hll/cms convention). State stays sparse: the emitted snapshot never
    holds more idxs than populated buckets."""
    import os

    from tsmp_spark.operators.sketch import hdr_rollup
    from tsmp_spark.streaming.sketch import hdr_stream

    rows = [
        ("t%d" % (i % 2), (i % 3) * 4000, float(((i * 37) % 500) - 50) / 7.0)
        for i in range(600)
    ]
    batch_df = spark.createDataFrame(
        rows, "event_type string, sec long, value double"
    )

    base = str(tmp_path / "ev")
    os.makedirs(base)
    scrambled = rows[400:600] + rows[0:200] + rows[200:400]
    for k in range(3):
        spark.createDataFrame(
            scrambled[200 * k : 200 * (k + 1)],
            "event_type string, sec long, value double",
        ).coalesce(1).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema("event_type string, sec long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        hdr_stream(stream, bucket_sec=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hdr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_hdr"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        "SELECT key, bucket, idx, cnt FROM (SELECT *, "
        "row_number() OVER (PARTITION BY key, bucket, idx ORDER BY n_seen DESC)"
        " AS rn FROM hdr_out) WHERE rn = 1"
    ).collect()
    want = {(r.key, r.bucket, r.idx): r.cnt for r in hdr_rollup(
        batch_df, bucket_sec=3600
    ).collect()}
    assert {(r.key, r.bucket, r.idx) for r in got} == set(want)
    for r in got:
        assert r.cnt == want[(r.key, r.bucket, r.idx)]


def test_ohlc_stream_equals_batch_any_order(spark, tmp_path):
    """Streaming candles fed OUT-OF-ORDER micro-batches converge to the
    exact batch OHLC on EVERY column — open/close re-derive from the
    carried (ts, id) total-order metadata, high/low/vol/n are
    commutative folds, so the equality needs no arrival contract.
    Duplicate timestamps (id tie-break) are planted across batch
    boundaries."""
    import os

    from tsmp_spark.operators.rollup import ohlc
    from tsmp_spark.streaming.rollup import ohlc_stream

    rows = [
        (i, ("t%d" % (i % 2)), (i % 5) * 9000 + ((i * 13) % 7) * 60,
         float(((i * 37) % 500) - 250) / 4.0)
        for i in range(600)
    ]
    # duplicate-second collisions with distinct ids, split across files
    rows += [(1000, "t0", 123, 5.25), (1001, "t0", 123, -7.5),
             (1002, "t0", 123, 0.75)]
    schema = "event_id long, event_type string, sec long, value double"
    batch_df = spark.createDataFrame(rows, schema)

    base = str(tmp_path / "ev")
    os.makedirs(base)
    scrambled = rows[401:] + rows[0:200] + rows[200:401]
    per = len(scrambled) // 3 + 1
    for k in range(3):
        chunk = scrambled[per * k: per * (k + 1)]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        ohlc_stream(stream, bucket_sec=9000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ohlc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        "SELECT key, bucket, open, high, low, close, vol_centi, n, "
        "first_ts, first_id, last_ts, last_id FROM (SELECT *, "
        "row_number() OVER (PARTITION BY key, bucket ORDER BY n_seen DESC)"
        " AS rn FROM ohlc_out) WHERE rn = 1"
    ).collect()
    want = {(r.key, r.bucket): r for r in ohlc(batch_df, bucket=9000).collect()}
    assert {(r.key, r.bucket) for r in got} == set(want)
    for r in got:
        w = want[(r.key, r.bucket)]
        assert (r.open, r.high, r.low, r.close) == (w.open, w.high, w.low,
                                                    w.close)
        assert (r.vol_centi, r.n) == (w.vol_centi, w.n)
        assert (r.first_ts, r.first_id, r.last_ts, r.last_id) == (
            w.first_ts, w.first_id, w.last_ts, w.last_id)


def test_mg_stream_bounds_any_order(spark, tmp_path):
    """Streaming Misra–Gries heavy hitters under SCRAMBLED arrival: the
    drained k-bounded summary must satisfy the order-INDEPENDENT
    guarantee — ≤ k items per bucket, true − n/(k+1) ≤ est ≤ true for
    every surviving item, and every item heavier than n/(k+1) present —
    even though the exact ests are arrival-order dependent (documented;
    deliberately no stream==batch oracle). State is ≤ k pairs + n per
    bucket."""
    import os

    from tsmp_spark.streaming.sketch import MG_STREAM_K, mg_stream

    k = MG_STREAM_K
    # bucket 0: one dominant item (200 of 420), mid items, unique tail
    rows = ([(1, 5)] * 200 + [(2, 9)] * 90 + [(3, 11)] * 50
            + [(100 + j, 13) for j in range(80)])
    # bucket 1: all-unique traffic — every counter must prune to empty
    rows += [(500 + j, 86400 + j % 50) for j in range(60)]
    true0 = {1: 200, 2: 90, 3: 50, **{100 + j: 1 for j in range(80)}}

    base = str(tmp_path / "ev")
    os.makedirs(base)
    import random

    rnd = random.Random(20260819)
    rnd.shuffle(rows)
    per = len(rows) // 4 + 1
    schema = "user_id long, sec long"
    for f in range(4):
        chunk = rows[per * f: per * (f + 1)]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                f"{base}/f{f}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        mg_stream(stream, bucket_sec=86400)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mg_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_mg"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql(
        "SELECT bucket, n_seen, item, est FROM (SELECT *, "
        "row_number() OVER (PARTITION BY bucket, coalesce(item, -1) "
        "ORDER BY n_seen DESC) AS rn FROM mg_out) WHERE rn = 1"
    ).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r.bucket, []).append(r)

    b0 = [r for r in by_bucket[0] if r.item is not None]
    n0 = 420
    assert {r.n_seen for r in b0} == {n0}
    assert len(b0) <= k
    bound = n0 / (k + 1)
    for r in b0:
        t = true0[r.item]
        assert t - bound <= r.est <= t
    heavy = {i for i, t in true0.items() if t > bound}
    assert heavy <= {r.item for r in b0}            # 1 and 2 must survive

    b1 = by_bucket[86400 // 86400 * 1]
    # all-unique: the last reduce prunes everything — only the sentinel
    # snapshot remains, with the full n observed
    live = [r for r in b1 if r.item is not None]
    assert len(live) <= k
    for r in live:
        assert r.est <= 1


def test_sdt_stream_equals_batch_ordered(spark, tmp_path):
    """Streaming swinging-door == batch sdt_compress on ordered ingest,
    modulo each open window's trailing point (batch always flushes it;
    the stream holds it pending until superseded — exactly the
    last-(key,bucket) rows). O(1) state: anchor + prev + two door
    rationals."""
    import os

    from tsmp_spark.operators.rollup import sdt_compress
    from tsmp_spark.streaming.rollup import sdt_stream

    rng_rows = []
    ev_id = 0
    for k, base in (("t0", 0), ("t1", 3)):
        v = 50.0
        for i in range(300):
            # random-ish walk with plateaus via deterministic arithmetic
            step = ((i * 29 + base) % 11) - 5
            v = v + step * 0.25
            rng_rows.append((ev_id, k, 60 * i + base, float(v)))
            ev_id += 1
    # duplicate timestamp within one micro-batch: later id must win
    rng_rows.append((9000, "t0", 60 * 10, 400.0))
    schema = "event_id long, event_type string, sec long, value double"
    batch_df = spark.createDataFrame(rng_rows, schema)

    base_dir = str(tmp_path / "sdt_ev")
    os.makedirs(base_dir)
    ordered = sorted(rng_rows, key=lambda r: (r[2], r[0]))
    per = len(ordered) // 3 + 1
    for k in range(3):
        chunk = ordered[per * k: per * (k + 1)]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                f"{base_dir}/f{k}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base_dir}/*")
    )
    q = (
        sdt_stream(stream, bucket_sec=7200, dev_centi=120)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sdt_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sdt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.key, r.bucket, r.t, r.v_centi)
        for r in spark.sql("SELECT * FROM sdt_out").collect()
    }
    batch = sdt_compress(batch_df, bucket=7200, dev_centi=120).collect()
    # drop each (key,bucket)'s trailing point — pending in the stream
    last_t = {}
    for r in batch:
        kb = (r.key, r.bucket)
        if kb not in last_t or r.t > last_t[kb]:
            last_t[kb] = r.t
    first_t = {}
    for r in batch:
        kb = (r.key, r.bucket)
        if kb not in first_t or r.t < first_t[kb]:
            first_t[kb] = r.t
    # trailing point pending — unless the group is a singleton, where
    # trailing == first and the first-point emission covers it
    want = {
        (r.key, r.bucket, r.t, r.v_centi)
        for r in batch
        if last_t[(r.key, r.bucket)] != r.t
        or first_t[(r.key, r.bucket)] == r.t
    }
    assert got == want
    assert len(got) > 0
    # duplicate-timestamp row: latest id (9000, v=400) won in both
    dup = [x for x in got if x[0] == "t0" and x[2] == 600]
    assert dup and dup[0][3] == 40000


def test_ams_stream_equals_batch_any_order(spark, tmp_path):
    """Streaming AMS counters fed OUT-OF-ORDER micro-batches converge
    to the exact batch estimate — integer adds commute, so no arrival
    contract is needed (the hll register argument)."""
    import os

    from tsmp_spark.operators.sketch import ams_f2
    from tsmp_spark.streaming.sketch import ams_stream

    rows = [
        (i, (i * 7) % 40, (i % 4) * 21600 + (i * 13) % 21600)
        for i in range(800)
    ]
    schema = "event_id long, user_id long, sec long"
    batch_df = spark.createDataFrame(rows, schema)

    base = str(tmp_path / "ams_ev")
    os.makedirs(base)
    scrambled = rows[500:] + rows[:250] + rows[250:500]
    per = len(scrambled) // 3 + 1
    for k in range(3):
        chunk = scrambled[per * k: per * (k + 1)]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        ams_stream(stream, bucket_sec=21600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ams_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ams"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r.bucket: (r.est_x16, r.n_seen)
        for r in spark.sql(
            "SELECT bucket, est_x16, n_seen FROM (SELECT *, row_number() "
            "OVER (PARTITION BY bucket ORDER BY n_seen DESC) rn FROM "
            "ams_out) WHERE rn = 1"
        ).collect()
    }
    want = {
        r["bucket"]: (r["est_x16"], r["n"])
        for r in ams_f2(batch_df, bucket_sec=21600).collect()
    }
    assert got == want and len(got) == 4


def test_dgim_stream_equals_batch_closed_form(spark, tmp_path):
    """Streaming textbook DGIM state machine fed ORDERED micro-batches
    (3 files, maxFilesPerTrigger=1 — state carries across batches) ends
    at exactly the batch CLOSED FORM's buckets and estimates — the
    {1,2}-digit representation theorem, end to end."""
    import os

    from tsmp_spark.operators.sketch import dgim_estimate
    from tsmp_spark.streaming.sketch import dgim_stream

    rows = [
        (i, 1_700_000_000 + i, (i * 7) % 6, 1 if (i * 13) % 3 == 0 else 0)
        for i in range(900)
    ]
    schema = "event_id long, ts long, key long, bit int"
    batch_df = spark.createDataFrame(rows, schema)

    base = str(tmp_path / "dgim_ev")
    os.makedirs(base)
    per = 300
    for k in range(3):  # ordered-append contract: files in event order
        spark.createDataFrame(rows[per * k : per * (k + 1)], schema).coalesce(
            1
        ).write.parquet(f"{base}/f{k}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*")
    )
    q = (
        dgim_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dgim_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dgim"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    from pyspark.sql import functions as F

    got = {
        (r.key, r.n_window): (r.n_buckets, r.est2)
        for r in spark.sql(
            "SELECT key, n_window, n_buckets, est2 FROM (SELECT *, "
            "row_number() OVER (PARTITION BY key, n_window ORDER BY n_pos DESC)"
            " AS rn FROM dgim_out) WHERE rn = 1"
        ).collect()
    }
    want = {
        (r.key, r.n_window): (r.n_buckets, r.est2)
        for r in dgim_estimate(
            batch_df, F.col("bit") == 1, window_sizes=(8, 32, 128, 512),
            key_col="key", ts_col="ts", id_col="event_id",
        ).collect()
    }
    assert got == want and len(got) == 6 * 4
