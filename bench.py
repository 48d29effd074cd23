"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "mp_windows_per_sec": ..., "rolled_points_per_sec": ...,
 "cpus": ...}

Headline suite (BASELINE.json metric: rolled-up points/sec +
matrix-profile windows/sec):
- ``mp_kernel_synth``: self-join MP over the deterministic synthetic
  sequences table (fixtures.generate_sequences — the input_hint shape) —
  kernel throughput, CPU-bound, scales with cores.
- ``mp_pipeline_events``: events → sequences → MPX → tier-1 + tier-2
  rollup (the flagship plan: scan → shuffle → Arrow UDF → agg).
- rollup / segmentation / dedup / ANN headliners at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_SYNTH_DOCS / BENCH_SYNTH_LEN.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_SYNTH_DOCS", "768"))
    synth_len = int(os.environ.get("BENCH_SYNTH_LEN", "4096"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from tsmp_spark.fixtures import generate_sequences
    from tsmp_spark.operators import (
        arc_count_cac,
        matrix_profile,
        minhash_lsh_pairs,
        rollup_chain,
        rollup_rollup,
        rollup_tier,
    )
    from tsmp_spark.operators.matrix_profile import (
        _explode_nested,
        matrix_profile_nested,
    )
    from tsmp_spark.operators.series import events_to_nested
    from tsmp_spark.queries import W, q_embedding_topk, q_events_rollup_gapfill
    from tsmp_spark.session import get_spark

    spark = get_spark(app_name="tsmp_bench", cpus=cpus)
    timings: dict[str, float] = {}
    warmups: dict[str, float] = {}
    extras: dict[str, float] = {}

    # BENCH_ONLY=q1,q2 runs just those queries (used by bench_scaling.py's
    # repeated kernel legs; default runs the whole suite)
    only = {q for q in os.environ.get("BENCH_ONLY", "").split(",") if q}

    def want(name):
        return not only or name in only

    # this box is shared: ambient tenant load can inflate a single timed
    # run 2-25x (a 41 s minhash outlier was observed where the steady
    # state is ~2 s). Each timed measurement is the MIN of
    # BENCH_TIMED_REPS fresh runs — interference only ever ADDS time, so
    # min is the closest observable to the unloaded steady state.
    timed_reps = int(os.environ.get("BENCH_TIMED_REPS", "2"))

    def timed(name, fn, warm=True):
        from tsmp_spark.operators.cache import release_caches

        # one untimed run of the IDENTICAL plan first: the first execution
        # pays one-time Janino codegen keyed to plan shape (~1-9 s) and
        # python-worker spin-up; the suite measures steady-state operator
        # throughput (warm-up cost is recorded separately as warm_sec)
        if warm:
            t0 = time.time()
            fn()
            warmups[name] = round(time.time() - t0, 3)
            release_caches()
        best = None
        out = None
        for _ in range(max(timed_reps, 1)):
            t0 = time.time()
            out = fn()
            el = time.time() - t0
            release_caches()  # pinned intermediates don't span queries/reps
            if best is None or el < best:
                best = el
        timings[name] = round(best, 3)
        return out

    # 1) kernel throughput on the synthetic input_hint table (CPU-bound)
    seqs = generate_sequences(spark, n_docs=n_docs, length=synth_len).cache()
    total_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]  # materialize cache

    # warm every python worker (imports + JIT) before the timed section —
    # worker spin-up is a fixed cost, not operator throughput
    matrix_profile(seqs.limit(cpus), 64, num_partitions=cpus).count()

    if want("mp_kernel_synth"):
        # nested output + sum(size(mp)): measures the kernel, not a 12M-row
        # explode (the rollup pipeline below pays the explode where it's used)
        n_windows = timed(
            "mp_kernel_synth",
            # uniform-length synthetic docs: exact-fit partitioning measured
            # faster than 2x overdecomposition (fewer Arrow batches)
            lambda: matrix_profile_nested(seqs, 64, num_partitions=cpus)
            .agg(F.sum(F.size("mp")))
            .collect()[0][0],
        )
        extras["mp_windows_per_sec"] = round(
            n_windows / timings["mp_kernel_synth"], 1
        )
        extras["synth_tokens"] = int(total_tokens)

    # 1b) training-sequence packing over the same input_hint table —
    # tokens-payload headline: one exchange moves every token once;
    # shards split the Zipf-hot sources into independent streams
    if want("pack_tokens"):
        from tsmp_spark.operators import pack_sequences

        packed_n = timed(
            "pack_tokens",
            lambda: pack_sequences(seqs, seq_len=2048, shards=8)
            .agg(F.sum("n_tok"))
            .collect()[0][0],
        )
        assert packed_n == total_tokens  # stream-conservation invariant
        extras["packed_tokens_per_sec"] = round(packed_n / timings["pack_tokens"], 1)

    # 1c) flagship rollup chain at the input_hint SERIES SHAPE (8192-token
    # sequences): profile → tier-1 → tier-2 rolled points. This is the
    # north-star metric (rolled-up points/sec) measured where the
    # pipeline is CPU-dominated like the real workload — the sf events
    # table's 167-point series make the same chain scheduling-bound, a
    # small-scale artifact, not an engine property.
    if want("mp_rollup_synth"):

        def rollup_synth():
            # Round-4 final form: tier-1 FUSED INTO THE KERNEL
            # (matrix_profile_tier1) — the profile is already a numpy
            # array inside the kernel task, so the per-bucket
            # min/argmin/seq-sum/max fold happens there and the stage is
            # a pure map: ZERO exchange above the kernel, 64× fewer rows
            # shipped than the explode→groupBy chain (which itself
            # measured 2× steady / 10× cold over the interpreted HOF
            # form — SCALE.md §9). Oracle-gated identical to the
            # relational chain (mp_tier1_fused hash-green; bit-identity
            # pinned in test_tier1_fused_equals_relational_bit_exact).
            # History: explode-chain rolled scaling measured 0.53-0.60
            # across 6 reps (exchange of 12.5M per-window rows is the
            # non-scaling tail); the fused chain's only exchange is
            # tier-2's 196k tier-1 rows.
            #
            # Tier-1 rolled points are counted in-flight with observe()
            # (one job); the observed sum(mp_avg) keeps tier-1's
            # aggregate values from being pruned by the count above.
            from pyspark.sql import Observation

            from tsmp_spark.operators.matrix_profile import matrix_profile_tier1

            t1 = matrix_profile_tier1(seqs, 64, 64, num_partitions=cpus)
            obs = Observation("t1")
            t1 = t1.observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.sum("mp_avg").alias("chk"),
                F.min("pi_argmin").alias("pi_chk"),
            )
            t2 = rollup_rollup(t1, 4)
            n2 = (
                t2.agg(
                    F.count(F.lit(1)).alias("n2"), F.sum("mp_avg").alias("chk")
                ).collect()[0]["n2"]
            )
            return obs.get["rows"] + n2

        rolled_synth = timed("mp_rollup_synth", rollup_synth)
        extras["synth_rolled_points_per_sec"] = round(
            rolled_synth / timings["mp_rollup_synth"], 1
        )

    # 2) flagship pipeline on the SF events table.
    # BENCH_EVENTS_MULT=k (default 1) replicates the events k× with a
    # disjoint user_id space per replica (broadcast range crossJoin — one
    # scan, no k-way union): per-series structure is preserved exactly,
    # rolled points scale exactly k×. Experiment knob (set it in the
    # environment, or pass extra_env to bench_scaling.run_at): the
    # 10×/50× events-shape saturation runs recorded in SCALE.md used it;
    # the checked-in bench_scaling protocol itself runs 1× events and
    # rides the synthetic 8192-token legs instead.
    ev_mult = int(os.environ.get("BENCH_EVENTS_MULT", "1"))

    def read_events():
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if ev_mult > 1:
            rep = spark.range(ev_mult).withColumnRenamed("id", "__rep")
            ev = (
                # the local sf file is ONE parquet row group (unsplittable):
                # without this explicit-count repartition (AQE-coalescing-
                # exempt) the scan, the ×k expansion, and the groupBy's
                # map-side partial aggregation all run on a single core at
                # every cluster size — a file artifact, not engine scaling.
                # A warehouse-scale scan has natural splits; repartition
                # BEFORE the crossJoin so the exchange carries the 1× rows
                # and the expansion runs parallel.
                ev.repartition(cpus)
                .crossJoin(F.broadcast(rep))
                .withColumn(
                    "user_id", F.col("user_id") + F.col("__rep") * F.lit(10_000_000)
                )
                .withColumn(
                    "event_id",
                    F.col("event_id") + F.col("__rep") * F.lit(1_000_000_000_000),
                )
                .drop("__rep")
            )
        return ev

    def pipeline():
        ev = read_events()
        sequences = events_to_nested(ev)
        # events-derived series are short: long_series_threshold=None avoids
        # the union plan's second scan of the input. Tier-1 via the
        # codegen explode→groupBy path (see rollup_synth's note —
        # measured faster than the in-array HOF form at every shape
        # tried, and pays no interpreter warm-up).
        prof = matrix_profile_nested(sequences, W, long_series_threshold=None)
        t1 = rollup_tier(_explode_nested(prof), 8).persist()  # tier-1 feeds tier-2
        t2 = rollup_rollup(t1, 4)
        n = t1.count() + t2.count()
        t1.unpersist()
        return n

    if want("mp_pipeline_events"):
        rolled = timed("mp_pipeline_events", pipeline)
        extras["rolled_points_per_sec"] = round(
            rolled / timings["mp_pipeline_events"], 1
        )
        if ev_mult > 1:
            extras["events_mult"] = ev_mult

    # 3) segmentation (relational CAC over the kernel profile)
    def seg():
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sequences = events_to_nested(ev)
        prof = matrix_profile(sequences, W, long_series_threshold=None)
        return arc_count_cac(prof, W, 0.1).count()

    if want("arc_cac"):
        timed("arc_cac", seg)

    # 4) gap-filled continuous aggregate over raw events
    if want("events_rollup_gapfill"):
        timed(
            "events_rollup_gapfill",
            lambda: q_events_rollup_gapfill(spark, sf_dir).count(),
        )

    # 5) dedup: minhash LSH candidates over documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm-up: one untimed run of the IDENTICAL plan — the first execution
    # pays ~9s of one-time Janino codegen compilation keyed by plan shape
    # (a limit()-ed warm plan does NOT warm it); steady-state is what the
    # suite measures. parallelism: the local sf file is one parquet row
    # group (unsplittable), so spread the shingle+md5 work across cores —
    # at warehouse scale the scan has natural splits and this knob stays None.
    if want("minhash_lsh"):
        timed(
            "minhash_lsh",
            lambda: minhash_lsh_pairs(
                docs, num_hashes=8, bands=4, threshold=0.25, parallelism=2 * cpus
            ).count(),
        )

    # 6) similarity: brute-force cosine top-k
    if want("embedding_topk"):
        timed("embedding_topk", lambda: q_embedding_topk(spark, sf_dir).count())

    # round-3 flagships, reported OUTSIDE the headline total so the suite
    # value stays comparable across rounds (queries_extra in the JSON)
    total = round(sum(timings.values()), 3)
    extra_q: dict[str, float] = {}
    if want("ivf_pq_ann"):
        from tsmp_spark.queries import q_ivf_pq_topk

        timed("ivf_pq_ann", lambda: q_ivf_pq_topk(spark, sf_dir).count())
        extra_q["ivf_pq_ann"] = timings.pop("ivf_pq_ann")
    if want("asof_join"):
        from tsmp_spark.queries import q_asof_join

        timed("asof_join", lambda: q_asof_join(spark, sf_dir).count())
        extra_q["asof_join"] = timings.pop("asof_join")
    if want("hll_distinct"):
        from tsmp_spark.queries import q_hll_distinct

        timed("hll_distinct", lambda: q_hll_distinct(spark, sf_dir).count())
        extra_q["hll_distinct"] = timings.pop("hll_distinct")
    if want("sliding_rollup"):
        from tsmp_spark.queries import q_sliding_rollup

        timed("sliding_rollup", lambda: q_sliding_rollup(spark, sf_dir).count())
        extra_q["sliding_rollup"] = timings.pop("sliding_rollup")
    if want("spectral_residual"):
        from tsmp_spark.queries import q_spectral_residual

        timed("spectral_residual",
              lambda: q_spectral_residual(spark, sf_dir).count())
        extra_q["spectral_residual"] = timings.pop("spectral_residual")
    if want("bloom_probe"):
        from tsmp_spark.queries import q_bloom_probe

        timed("bloom_probe", lambda: q_bloom_probe(spark, sf_dir).count())
        extra_q["bloom_probe"] = timings.pop("bloom_probe")
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (mp kernel + rollup pipeline + segmentation + dedup + ann)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_extra": extra_q,
                "warm_sec": warmups,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
