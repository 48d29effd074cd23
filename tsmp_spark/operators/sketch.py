"""Mergeable sketches for the continuous-aggregate layer: HyperLogLog
distinct-count registers and count–min frequency counters.

These are the two sketches a rollup engine needs once per-bucket state
must stay bounded at warehouse scale (TimescaleDB ships both as
hyperfunctions; Druid/Pinot likewise): ``rollup_histogram`` already
covers distributions, HLL covers COUNT(DISTINCT) and CMS covers
frequencies, and both RE-ROLL — tier k+1 merges tier-k sketches
(register-wise max / counter-wise sum) without touching raw rows.

Determinism contract (the engine-wide rule): every hashed quantity
derives from the portable md5 family (``dedup._h64`` — reproducible
bit-for-bit in ANSI SQL), every aggregate is integer-only, and the one
float output (the HLL estimate) is a single identical expression over
identical integers on both engines — no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _h64

#: HLL geometry: p=9 index bits → m=512 registers; the remaining 23
#: hash bits get a sentinel bit 2^23 so rho = trailing-zeros+1 ∈ [1,24].
HLL_M = 512
HLL_REST_BITS = 23
#: Flajolet et al. 2007 bias constant for m ≥ 128 — the LITERAL
#: expression is repeated verbatim in the SQL oracles so both engines
#: evaluate the identical double.
HLL_ALPHA_EXPR = "0.7213 / (1.0 + 1.079 / 512.0)"


def hll_register_rows(
    events: DataFrame,
    bucket_sec: int,
    item_col: str,
    ts_col: str,
) -> DataFrame:
    """(bucket, idx, rho) register observations — the shared JVM-side
    front end of batch ``hll_rollup`` and ``streaming.hll_stream`` (both
    consume IDENTICAL expressions, so stream==batch is exact).

    Integer split ONLY (``div``): DuckDB CAST(double AS BIGINT) rounds
    where Spark truncates, so float division would diverge on the
    oracle side — mirror with ``//`` there.
    """
    rows = events.select(
        F.floor(F.col(ts_col).cast("long") / bucket_sec).cast("long").alias("bucket"),
        _h64(F.col(item_col).cast("string"), 0).alias("h"),
    )
    return rows.select(
        "bucket",
        (F.col("h") % HLL_M).cast("int").alias("idx"),
        F.expr(f"(h div {HLL_M}) | {1 << HLL_REST_BITS}").alias("w"),
    ).select(
        "bucket",
        "idx",
        (F.expr("cast(round(log2(w & -w)) as int)") + 1).alias("rho"),
    )


def hll_rollup(
    events: DataFrame,
    bucket_sec: int = 3600,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """Approximate COUNT(DISTINCT item) per time bucket via HyperLogLog
    (Flajolet et al. 2007): hash each item with the portable md5 family,
    split the 32-bit hash into a register index (``h % m``) and a rank
    (``trailing-zeros(rest | 2^23) + 1``), keep ``max(rank)`` per
    register, and estimate ``alpha·m²/Σ 2^(−reg)`` with the
    linear-counting small-range correction (``m·ln(m/V)`` when the raw
    estimate ≤ 2.5·m and V registers are untouched).

    Cross-engine exactness: registers are integers; ``Σ 2^(−reg)`` is
    carried as the exact integer ``z_int = Σ 2^(24−reg)`` (zero
    registers contribute 2^24; max 512·2^24 = 2^33, no overflow), so the
    float estimate is ONE identical expression over identical integers
    on both engines. trailing-zeros is ``log2(w & −w)`` — exact on
    powers of two.

    Scale: two combinable groupBys — (bucket, idx) then (bucket) — the
    second collapses each bucket to ≤ m=512 rows, so per-bucket state is
    BOUNDED no matter how many raw rows or distinct items the bucket
    holds (the reason this exists next to the exact
    ``cohort_retention``-style distinct counts). Re-rollup to a coarser
    tier = max per (coarse bucket, idx) over tier-k registers — pytest
    ``test_hll_merge_equals_whole`` pins merge-equals-recompute.

    Output: (bucket, zeros, z_int, est) — integers plus the one float.
    """
    regs = (
        hll_register_rows(events, bucket_sec, item_col, ts_col)
        .groupBy("bucket", "idx")
        .agg(F.max("rho").alias("reg"))
    )
    agg = regs.groupBy("bucket").agg(
        (F.lit(HLL_M) - F.count("*")).cast("bigint").alias("zeros"),
        F.sum(
            F.expr(f"cast(1 as bigint) << ({HLL_REST_BITS + 1} - reg)")
        ).alias("z_present"),
    )
    z_int = (
        F.col("z_present")
        + F.col("zeros") * F.lit(1 << (HLL_REST_BITS + 1)).cast("bigint")
    ).alias("z_int")
    raw = F.expr(HLL_ALPHA_EXPR) * F.lit(float(HLL_M * HLL_M)) * F.lit(
        float(1 << (HLL_REST_BITS + 1))
    ) / F.col("z_int")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("zeros") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
    ).otherwise(raw)
    # ONE r6 rounding: the raw branch is already bit-identical (IEEE
    # ×/÷ over exact integers) but the linear-counting branch goes
    # through ln(), which java.lang.Math and libm may round 1 ulp apart.
    return (
        agg.select("bucket", "zeros", z_int)
        .select("bucket", "zeros", "z_int", F.round(est, 6).alias("est"))
    )


#: CMS geometry: d=4 independent md5 hash rows × w=256 counter columns.
CMS_D = 4
CMS_W = 256


def cms_counts(
    events: DataFrame,
    bucket_sec: int = 21600,
    item_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Count–min sketch frequency estimates per (bucket, item) (Cormode
    & Muthukrishnan 2005): d=4 portable md5 hash rows map each item to
    one of w=256 counters per row; a counter accumulates every colliding
    item's count and the estimate is the MIN over the d rows — an upper
    bound on the true count that is exact when any row is
    collision-free.

    Output rows are (bucket, item, est, cnt): the sketch estimate next
    to the exact count, so ``est - cnt`` IS the measured collision
    overestimate (always ≥ 0 — pytest-pinned). Integer-only output.

    Scale: counter state is bounded at d·w = 1024 cells per bucket
    regardless of item cardinality; the build is one combinable groupBy
    on (bucket, row, col), the probe joins each distinct (bucket, item)
    to its d cells — shuffle bounded by distinct items × d, never raw
    rows × raw rows. Counters MERGE by cell-wise sum (re-rollup /
    shard-union; pytest pins merge-equals-whole).
    """
    sel = [
        F.floor(F.col(ts_col).cast("long") / bucket_sec).cast("long").alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    ] + [
        (_h64(F.col(item_col).cast("string"), r) % CMS_W)
        .cast("int")
        .alias(f"c{r}")
        for r in range(CMS_D)
    ]
    rows = events.select(*sel)
    cells = rows.select(
        "bucket",
        F.posexplode(F.array(*[F.col(f"c{r}") for r in range(CMS_D)])).alias(
            "r", "c"
        ),
    )
    counters = cells.groupBy("bucket", "r", "c").agg(
        F.count("*").cast("bigint").alias("cell_cnt")
    )
    probes = (
        rows.groupBy("bucket", "item", *[f"c{r}" for r in range(CMS_D)])
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "bucket",
            "item",
            "cnt",
            F.posexplode(F.array(*[F.col(f"c{r}") for r in range(CMS_D)])).alias(
                "r", "c"
            ),
        )
    )
    return (
        probes.join(counters, ["bucket", "r", "c"])
        .groupBy("bucket", "item", "cnt")
        .agg(F.min("cell_cnt").alias("est"))
        .select("bucket", "item", "est", "cnt")
    )
