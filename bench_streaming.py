"""Streaming throughput evidence (VERDICT r3 'Next round' #7): the
three stateful streaming operators driven by a replayed file stream at
local[8] vs local[32], reporting events/sec per op at both levels, the
8→32 scaling efficiency, and the observed state-store size (the
O(seq_len)-per-series / O(1)-per-key state bounds as numbers from
StreamingQueryProgress, not prose).

Ops (all `applyInPandasWithState`, correctness already gated
stream==batch in tests/test_streaming.py and by the stompi_stream /
hll_stream driver oracles):

- stompi_stateful — incremental matrix profile per series key; state is
  the series tail + six recurrence arrays, O(series length).
- pack_stream    — fixed-length training-sequence packer per
  (source, shard); state is ONE partial sequence, O(seq_len).
- hll_stream     — per-bucket HLL registers; state is m=512 bytes per
  bucket, O(1) in row count.

Protocol: each leg runs in a fresh taskset-pinned subprocess (the
bench_scaling convention — an N-core cluster has N cores total), replays
a deterministic pre-generated parquet directory via maxFilesPerTrigger,
and measures processAllAvailable wall from a COLD stream (state builds
from zero at both levels on identical input). Rates are
input-rows/sec; micro-batch count is fixed, so trigger overhead is
identical at both levels and the delta is the keyed state work.

Run ALONE:  python bench_streaming.py    → BENCH_STREAMING.json
Worker:     python bench_streaming.py --worker <op> <cpus> <data_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

DATA_ROOT = "/tmp/bench_streaming_data_v4"
N_FILES = 4  # micro-batches per stream (fixed trigger overhead)

# sized so the 8-core leg is COMPUTE-bound (30s+), not micro-batch-
# overhead-bound: the first sizing (96/128/64 keys, 9-13 s walls) read
# as anti-scaling purely from per-batch planning + state-store commit
# costs — the streaming twin of the SCALE.md §9 small-series artifact.
# stompi compute is O(len) per arriving point (len²/2 per series over
# the stream) while state traffic is O(len): 4× the series length buys
# 16× compute per 4× shipped state, which is what makes the stompi leg
# measure KEYED COMPUTE rather than state-store commit latency.
N_SERIES = 128         # stompi keys
SERIES_LEN = 25600     # points per series (state = O(SERIES_LEN))
N_DOCS = 12_000        # pack docs
DOC_TOKENS = 1500      # tokens per doc
N_SHARDS = 32          # pack keys per source
N_EVENTS = 3_000_000   # hll rows
N_BUCKETS = 64         # hll keys (day buckets)


def _gen(spark) -> None:
    """Deterministic replay datasets, written once and shared by both
    legs (seeded numpy; no Date.now/randomness in the measured path)."""
    os.makedirs(DATA_ROOT, exist_ok=True)
    marker = f"{DATA_ROOT}/.done"
    if os.path.exists(marker):
        return
    rng = np.random.default_rng(42)

    # stompi: chunked series, files = consecutive chunk windows
    chunk = SERIES_LEN // N_FILES
    series = {
        f"s{i:03d}": np.cumsum(rng.choice([-1.0, 1.0], size=SERIES_LEN))
        for i in range(N_SERIES)
    }
    for f in range(N_FILES):
        rows = []
        for doc_id, vals in series.items():
            seg = vals[f * chunk : (f + 1) * chunk]
            rows.extend(
                (doc_id, f, k, float(v)) for k, v in enumerate(seg)
            )
        spark.createDataFrame(
            rows, "doc_id string, chunk_id long, seq long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{DATA_ROOT}/stompi/f{f:02d}.parquet"
        )

    # pack: docs with token arrays, doc_id-ordered arrival
    import pandas as pd

    per_file = N_DOCS // N_FILES
    for f in range(N_FILES):
        toks = rng.integers(0, 50_000, (per_file, DOC_TOKENS), dtype=np.int32)
        pdf = pd.DataFrame(
            {
                "doc_id": [f"d{f * per_file + i:06d}" for i in range(per_file)],
                "tokens": list(toks),
                "source": [f"src{(f * per_file + i) % 4}" for i in range(per_file)],
            }
        )
        spark.createDataFrame(
            pdf, "doc_id string, tokens array<int>, source string"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{DATA_ROOT}/pack/f{f:02d}.parquet"
        )

    # hll: (user_id, sec) rows over N_BUCKETS day buckets
    per_file = N_EVENTS // N_FILES
    for f in range(N_FILES):
        pdf = pd.DataFrame(
            {
                "user_id": rng.integers(0, 200_000, per_file),
                "sec": rng.integers(0, N_BUCKETS, per_file) * 86400,
            }
        )
        spark.createDataFrame(pdf, "user_id long, sec long").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{DATA_ROOT}/hll/f{f:02d}.parquet")

    open(marker, "w").write("ok")


def _gen_hdr(spark) -> None:
    """hdr leg replay data (own marker — added after the v4 .done)."""
    marker = f"{DATA_ROOT}/.done_hdr"
    if os.path.exists(marker):
        return
    import pandas as pd

    rng = np.random.default_rng(43)
    per_file = N_EVENTS // N_FILES
    for f in range(N_FILES):
        pdf = pd.DataFrame(
            {
                "event_type": [f"t{i % 4}" for i in rng.integers(0, 4, per_file)],
                "sec": rng.integers(0, N_BUCKETS, per_file) * 86400,
                "value": np.round(np.exp(rng.normal(3.0, 1.5, per_file)), 2),
            }
        )
        spark.createDataFrame(
            pdf, "event_type string, sec long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{DATA_ROOT}/hdr/f{f:02d}.parquet"
        )
    open(marker, "w").write("ok")


def _drain(out, tmp, name: str) -> dict:
    q = (
        out.writeStream.outputMode("update" if name == "stompi" else "append")
        .format("memory")
        .queryName(f"sink_{name}")
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    state = {}
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            state["state_rows"] = max(
                state.get("state_rows", 0), so.get("numRowsTotal", 0)
            )
            mem = so.get("memoryUsedBytes") or so.get("stateMemory") or 0
            state["state_bytes"] = max(state.get("state_bytes", 0), mem)
    return state


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def worker(op: str, cpus: int, tmp: str, provider: str = "hdfs") -> None:
    import time

    from pyspark.sql import functions as F  # noqa: F401

    from tsmp_spark.session import get_spark

    # shuffle_partitions (= state-store partition count) held FIXED at 32
    # on both legs: each stateful partition commits a store delta per
    # micro-batch, and on one shared local disk that commit cost scales
    # with partition count, not core count — a local-mode artifact a real
    # cluster (stores spread across executors) doesn't have. Holding it
    # fixed makes the 8-vs-32 delta the keyed COMPUTE, which is what
    # scales with executors.
    #
    # provider leg (VERDICT r4 Next #7): the default HDFSBackedStateStore
    # snapshots the whole store per commit through one shared local disk;
    # RocksDB keeps state off-heap with incremental changelogs — running
    # both separates OPERATOR cost from STORE-COMMIT cost.
    extra = {}
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            ROCKSDB_PROVIDER
        )
    spark = get_spark(
        app_name=f"bench_stream_{op}_{cpus}_{provider}", cpus=cpus,
        shuffle_partitions=32, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("WARN")
    _gen(spark)

    if op == "stompi":
        from tsmp_spark.streaming import stompi_stateful

        stream = (
            spark.readStream.schema(
                "doc_id string, chunk_id long, seq long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{DATA_ROOT}/stompi/*")
        )
        out = stompi_stateful(stream, 64)
        n_rows = N_SERIES * SERIES_LEN
    elif op == "pack":
        from tsmp_spark.streaming.packing import pack_stream

        stream = (
            spark.readStream.schema(
                "doc_id string, tokens array<int>, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{DATA_ROOT}/pack/*")
        )
        out = pack_stream(stream, seq_len=2048, shards=N_SHARDS)
        n_rows = N_DOCS * DOC_TOKENS  # tokens moved, the honest unit
    elif op == "hdr":
        from tsmp_spark.streaming.sketch import hdr_stream

        _gen_hdr(spark)
        stream = (
            spark.readStream.schema("event_type string, sec long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{DATA_ROOT}/hdr/*")
        )
        out = hdr_stream(stream, bucket_sec=86400)
        n_rows = N_EVENTS
    else:
        from tsmp_spark.streaming.sketch import hll_stream

        stream = (
            spark.readStream.schema("user_id long, sec long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{DATA_ROOT}/hll/*")
        )
        out = hll_stream(stream, bucket_sec=86400, item_col="user_id", ts_col="sec")
        n_rows = N_EVENTS

    t0 = time.time()
    state = _drain(out, tmp, op)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "op": op,
                "cpus": cpus,
                "provider": provider,
                "wall_sec": round(wall, 2),
                "rows": n_rows,
                "rows_per_sec": round(n_rows / wall, 1),
                **state,
            }
        )
    )


def main() -> None:
    import tempfile

    ops = tuple(
        o for o in os.environ.get("BENCH_STREAM_OPS", "stompi,pack,hll").split(",")
        if o
    )
    prior = {}
    if os.path.exists("BENCH_STREAMING.json"):
        with open("BENCH_STREAMING.json") as f:
            prior = {r["op"]: r for r in json.load(f).get("ops", [])}
    providers = tuple(
        p for p in os.environ.get(
            "BENCH_STREAM_PROVIDERS", "hdfs,rocksdb").split(",") if p
    )
    results = []
    for op in ops:
        rec = {
            "op": op,
            "state_bound": {
                "stompi": f"O(series_len): {N_SERIES} keys",
                "pack": f"O(seq_len) per (source,shard): {4 * N_SHARDS} keys",
                "hll": f"O(1) 512 registers per bucket: {N_BUCKETS} keys",
                "hdr": "O(populated idx cells, <=16/octave) per "
                       f"(key,bucket): {4 * N_BUCKETS} keys",
            }[op],
        }
        for provider in providers:
            per_op = {}
            for cpus in (8, 32):
                tmp = tempfile.mkdtemp(prefix=f"bs_{op}_{cpus}_{provider}_")
                cmd = [
                    "taskset", "-c", f"0-{cpus - 1}", sys.executable,
                    __file__, "--worker", op, str(cpus), tmp, provider,
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600,
                )
                line = [
                    l for l in out.stdout.splitlines() if l.startswith("{")
                ][-1]
                per_op[cpus] = json.loads(line)
                print(line)
            eff = (
                per_op[32]["rows_per_sec"] / per_op[8]["rows_per_sec"] / 4.0
            )
            if provider == "hdfs":  # legacy top-level fields
                rec["legs"] = [per_op[8], per_op[32]]
                rec["scaling_efficiency"] = round(eff, 3)
            rec.setdefault("providers", {})[provider] = {
                "legs": [per_op[8], per_op[32]],
                "scaling_efficiency": round(eff, 3),
            }
        results.append(rec)
    done = {r["op"] for r in results}
    results.extend(v for k, v in prior.items() if k not in done)
    out = {
        "metric": "stateful streaming throughput, replayed file stream, cold state",
        "protocol": "fresh taskset-pinned JVM per leg; 4 micro-batches "
        "(maxFilesPerTrigger=1, availableNow); identical input both levels; "
        "state-store partition count held at 32 on both legs",
        "note": "local-mode caveat: every leg commits state-store changes "
        "through ONE shared disk and replans each micro-batch on one "
        "driver, a serial cost a real cluster spreads across executors; "
        "pack/hll walls are state-commit-bound (their compute per state "
        "byte is tiny by design), so their 8-vs-32 deltas measure the "
        "STORE, not the operator — which is why each op now runs under "
        "BOTH providers (hdfs = full-snapshot commits, rocksdb = "
        "off-heap incremental changelog): the hdfs-vs-rocksdb delta at "
        "fixed cores isolates store-commit cost from operator cost. "
        "stompi is sized compute-bound (len^2/2 work per series vs len "
        "state). The north-rule >=0.8 scaling artifact is the BATCH "
        "engine (BENCH_SCALING.json); this file is the VERDICT #7 rates "
        "+ state-bound + store-provider evidence.",
        "ops": results,
    }
    with open("BENCH_STREAMING.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_STREAMING.json")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4],
               sys.argv[5] if len(sys.argv) > 5 else "hdfs")
    else:
        main()
