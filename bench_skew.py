"""Hot-source skew evidence (VERDICT r4 Next #6): the flagship packing
chain on a corpus where 90% of documents live in ONE source, with and
without the engine's skew escapes, reporting straggler-task max/median
per heavy stage.

Two escape hatches under test (both first-class operator knobs):

- ``pack_sequences(shards=N)`` — SEMANTIC sharding: the hot source's
  single doc-ordered stream becomes N deterministic independent streams,
  so the window cumsum + reassembly groupBy spread over N partitions
  (output is reproducible for fixed N — unlike physical salting).
- ``series.salted_repartition`` — PHYSICAL salting for per-row work
  (tokenize) whose upstream layout is source-partitioned: hash on
  (source, salt) spreads the hot source's rows before the map stage.

Straggler metric: per-stage task-duration max and median from the Spark
REST API (taskSummary quantiles), for the stage with the largest max —
the one a hot key pins. A skew fix is real when max/median collapses
toward 1 and the wall follows.

Run ALONE:  python bench_skew.py    → BENCH_SKEW.json (+ SCALE.md table
by hand). Env: SKEW_DOCS (default 50_000), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tsmp_spark.session import get_spark


def _api(spark, path: str):
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/{path}"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _straggler(spark, after_stage: int) -> dict:
    """Heaviest stage since after_stage (max/median task duration), plus
    the heaviest SINGLE-task stage — the hot-key signature: a skewed key
    that AQE coalesces into one task shows up here even when a balanced
    wider stage dominates the wall."""
    worst = {"max_ms": 0}
    worst_single = {"max_ms": 0}
    for st in _api(spark, "stages?status=complete"):
        # 1-task stages stay in: an AQE-coalesced hot-key stage IS the
        # extreme straggler (and AQE names every stage via its
        # CompletableFuture callsite, so names can't filter anything)
        if st["stageId"] <= after_stage or st.get("numCompleteTasks", 0) < 1:
            continue
        try:
            s = _api(
                spark,
                f"stages/{st['stageId']}/0/taskSummary?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        dur = s.get("duration") or s.get("executorRunTime")
        if not dur:
            continue
        med, mx = float(dur[0]), float(dur[-1])
        rec = {
            "stage": st["stageId"],
            "tasks": st["numCompleteTasks"],
            "median_ms": round(med, 0),
            "max_ms": round(mx, 0),
            "max_over_median": round(mx / max(med, 1.0), 1),
        }
        if mx > worst["max_ms"]:
            worst = dict(rec)
        if st["numCompleteTasks"] == 1 and mx > worst_single["max_ms"]:
            worst_single = dict(rec)
    worst["worst_single_task"] = worst_single
    return worst


def main() -> None:
    n_docs = int(os.environ.get("SKEW_DOCS", "400000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="tsmp_skew", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("WARN")

    from tsmp_spark.operators.series import salted_repartition
    from tsmp_spark.operators.tokens import pack_sequences, tokenize_documents

    # skewed corpus: 90% of docs in src0, rest across 19 sources; texts
    # drawn from the sf0.1 documents table (real vocabulary/length mix)
    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("text").limit(5000).toPandas()["text"].tolist()
    )
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        # doubled text (~110 words/doc) so the pack stage moves enough
        # tokens for a hot stream to be CPU-visible, not fixed-cost
        # noise; the doc_id suffix keeps every text DISTINCT so the
        # chain's exact-dedup stage doesn't collapse the corpus
        "text": [base[i % len(base)] + " " + base[(i + 7) % len(base)]
                 + f" doc{i}"
                 for i in range(n_docs)],
        "source": np.where(
            rng.random(n_docs) < 0.9, "src0",
            np.char.add("src", rng.integers(1, 20, n_docs).astype(str)),
        ),
    })
    docs = spark.createDataFrame(pdf).persist()
    docs.count()

    toks = tokenize_documents(
        docs, append_eos=32768,
        parallelism=spark.sparkContext.defaultParallelism,
    ).select("doc_id", "tokens", "source").persist()
    toks.count()

    results = {}

    def leg(name: str, build) -> None:
        walls = []
        for _ in range(2):
            before = max(
                (s["stageId"] for s in _api(spark, "stages?status=complete")),
                default=-1,
            )
            t0 = time.time()
            df = build()
            n = df.count()
            walls.append(time.time() - t0)
        results[name] = {
            "wall_sec": round(min(walls), 2),
            "rows": n,
            "straggler": _straggler(spark, before),
        }
        print(name, results[name])

    # pack: hot source as ONE stream vs 16 semantic shards
    leg("pack_shards1", lambda: pack_sequences(toks, seq_len=2048, shards=1))
    leg("pack_shards16", lambda: pack_sequences(toks, seq_len=2048, shards=16))

    # the FLAGSHIP chain end-to-end (dedup -> quality -> tokenize ->
    # pack) on the same skewed corpus, with and without semantic shards
    from tsmp_spark.operators.tokens import curate

    par = spark.sparkContext.defaultParallelism
    leg(
        "pipeline_e2e_shards1",
        lambda: curate(docs, quality_threshold=0.0, shards=1,
                       with_spans=False, parallelism=par),
    )
    leg(
        "pipeline_e2e_shards16",
        lambda: curate(docs, quality_threshold=0.0, shards=16,
                       with_spans=False, parallelism=par),
    )
    # salted_repartition is the PHYSICAL escape for the same hot key on
    # per-row stages whose upstream layout is source-partitioned — its
    # correctness/plan contract is pinned in tests; the semantic-shard
    # legs above are the measured skew artifact (the packing window is
    # where the hot source actually pins a task)
    _ = salted_repartition, tokenize_documents  # referenced escapes

    out = {
        "metric": "hot-source skew: straggler max/median per heavy stage, "
                  "with and without the skew escapes",
        "corpus": {"n_docs": n_docs, "hot_source_share": 0.9,
                   "n_sources": 20, "cpus": cpus},
        "legs": results,
        "read": {
            "pack": "shards=16 must collapse max/median of the pack "
                    "window/groupBy stage and cut the wall",
            "pipeline_e2e": "the full curation chain on the same skewed "
                            "corpus — the semantic shards must remove the "
                            "hot stream's single-task stage",
        },
    }
    print(json.dumps(out, indent=1))
    with open("BENCH_SKEW.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
