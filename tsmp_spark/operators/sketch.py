"""Mergeable sketches for the continuous-aggregate layer: HyperLogLog
distinct-count registers, count–min frequency counters, and a Bloom
membership filter for semi-join reduction.

These are the sketches a rollup engine needs once per-bucket state
must stay bounded at warehouse scale (TimescaleDB ships both as
hyperfunctions; Druid/Pinot likewise): ``rollup_histogram`` already
covers distributions, HLL covers COUNT(DISTINCT) and CMS covers
frequencies, and both RE-ROLL — tier k+1 merges tier-k sketches
(register-wise max / counter-wise sum) without touching raw rows.
The Bloom filter is the JOIN-side sketch: the m-bit membership bitmap
a 100 TB engine broadcasts to prune a fact scan before any shuffle
(Spark's own runtime-filter rewrite does exactly this JVM-side — here
it is a first-class, portable, oracle-checkable operator).

Determinism contract (the engine-wide rule): every hashed quantity
derives from the portable md5 family (``dedup._h64`` — reproducible
bit-for-bit in ANSI SQL), every aggregate is integer-only, and the one
float output (the HLL estimate) is a single identical expression over
identical integers on both engines — no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _h64

def _floor_div(col: str, factor: int):
    """Exact integer FLOOR division (DuckDB ``//`` semantics) for the
    tier merges: Spark's ``div`` truncates toward zero, so a pre-epoch
    (negative) bucket would silently mis-tier vs the oracle's floor.
    ``bucket - pmod(bucket, f)`` is the largest multiple of f ≤ bucket,
    and ``div`` on an exact multiple IS floor — all-integer, no float
    precision path (review: ADVICE r3, sketch.py:177)."""
    return F.expr(f"(({col}) - pmod(({col}), {factor})) div {factor}")


#: HLL geometry: p=9 index bits → m=512 registers; the remaining 23
#: hash bits get a sentinel bit 2^23 so rho = trailing-zeros+1 ∈ [1,24].
HLL_M = 512
HLL_REST_BITS = 23
#: Flajolet et al. 2007 bias constant for m ≥ 128. Evaluated in PYTHON
#: (IEEE doubles, matching DuckDB's evaluation of the same literal
#: expression in the oracles, verified equal) and injected with F.lit —
#: inside F.expr, Spark parses ``0.7213`` as DECIMAL and the raw-branch
#: estimate drifts 3e-6 (found by the join_cardinality gate; the
#: streaming op always used the Python float, so this also removes a
#: latent batch-vs-stream raw-branch disagreement).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 512.0)


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
    return _hll_estimate(regs)


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """Finish a (bucket, idx, reg) register table into (bucket, zeros,
    z_int, est) — shared by the raw rollup and the tier-merge path so
    merge==recompute is an identity over identical integers."""
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
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(
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


def hll_rerollup(
    events: DataFrame,
    fine_sec: int = 3600,
    coarse_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """The RETENTION-TIER path for the HLL column: build tier-1
    registers at ``fine_sec``, then merge them into ``coarse_sec``
    buckets by register-wise max — WITHOUT touching raw rows again —
    and finish the estimate with the shared expression.

    This is the operation that makes HLL a continuous-aggregate column
    (the north-rule tier story on a sketch): because max is associative,
    ``max over tier-1 registers == max over raw rows`` is an exact
    integer identity, and the driver oracle exploits it — the SQL side
    recomputes straight from raw events at ``coarse_sec`` (the
    hll_distinct chain) and must match the merged path hash-for-hash.

    ``coarse_sec`` must be a multiple of ``fine_sec`` (tier grids nest);
    coarse bucket = fine_bucket div (coarse/fine) for the non-negative
    epoch range (integer div, same on both engines).

    Scale: tier-k+1 reads tier-k only — the merge shuffle is bounded by
    (coarse buckets × m=512 registers), independent of raw row count.
    """
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    factor = coarse_sec // fine_sec
    fine = (
        hll_register_rows(events, fine_sec, item_col, ts_col)
        .groupBy("bucket", "idx")
        .agg(F.max("rho").alias("reg"))
    )
    coarse = (
        fine.select(
            _floor_div("bucket", factor).alias("bucket"), "idx", "reg"
        )
        .groupBy("bucket", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    return _hll_estimate(coarse)


def hll_sliding_rollup(
    events: DataFrame,
    bucket_sec: int = 86400,
    window_buckets: int = 7,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """Trailing-window distinct counts from the HLL column: for every
    observed bucket, the estimate over the last ``window_buckets``
    buckets (the "7-day active users per day" query) — computed by
    MERGING per-bucket registers, never re-reading raw rows twice.

    The sliding merge is NOT a range join (BNLJ at scale) and not a
    per-register window (a register absent from the current bucket but
    present earlier in the window would silently drop out of a
    row-based frame): each tier-1 register row EXPLODES to the ≤ W
    target buckets it contributes to (integer sequence, bounded fan-out
    W), then one combinable max-groupBy per (target, idx) and a
    broadcast semi-join against the observed-bucket set keeps only real
    buckets. Shuffle ≤ buckets × m × W rows of three ints —
    raw-row-count independent, the sliding_rollup lesson applied to a
    sketch column.

    Output: (bucket, zeros, z_int, est) — the shared estimate finisher,
    so the oracle (registers recomputed from the raw window per target
    bucket) must match exactly.
    """
    from pyspark.sql.functions import broadcast

    w = int(window_buckets)
    if w < 1:
        raise ValueError("window_buckets >= 1")
    regs = (
        hll_register_rows(events, bucket_sec, item_col, ts_col)
        .groupBy("bucket", "idx")
        .agg(F.max("rho").alias("reg"))
    )
    observed = regs.select("bucket").distinct()
    contrib = regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("off"),
        "bucket",
        "idx",
        "reg",
    ).select(
        (F.col("bucket") + F.col("off")).alias("bucket"), "idx", "reg"
    )
    merged = (
        contrib.join(broadcast(observed), "bucket", "left_semi")
        .groupBy("bucket", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    return _hll_estimate(merged)


#: CMS geometry: d=4 independent md5 hash rows × w=256 counter columns.
CMS_D = 4
CMS_W = 256


def cms_hash_rows(
    events: DataFrame, bucket_sec: int, item_col: str, ts_col: str
) -> DataFrame:
    """(bucket, item, c0..c3) hashed rows — the shared JVM-side front
    end of batch ``cms_counts``/``cms_rerollup`` and
    ``streaming.cms_stream`` (identical expressions ⇒ stream==batch is
    exact, the hll_register_rows convention)."""
    sel = [
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    ] + [
        (_h64(F.col(item_col).cast("string"), r) % CMS_W)
        .cast("int")
        .alias(f"c{r}")
        for r in range(CMS_D)
    ]
    return events.select(*sel)


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
    rows = cms_hash_rows(events, bucket_sec, item_col, ts_col)
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


#: Bloom geometry: m=4096 bits, k=4 portable md5 hashes (seeds 0..3 —
#: ONE digest per item, sliced four ways by ``_h64``).
BLOOM_M = 4096
BLOOM_K = 4


def cms_rerollup(
    events: DataFrame,
    fine_sec: int = 3600,
    coarse_sec: int = 21600,
    item_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """The RETENTION-TIER path for the CMS column: build tier-1 counter
    cells at ``fine_sec``, merge them cell-wise-sum into ``coarse_sec``
    buckets — the sketch STATE tiers without re-reading raw rows — then
    answer the per-item frequency query against the merged counters.
    (The probe side recomputes the exact counts from raw at the coarse
    grain; that is the QUERY, not the tiered state.)

    Sum-associativity makes merged counters == counters built at the
    coarse grain an exact integer identity, so the driver oracle is the
    plain coarse-grain cms_counts chain — merge==recompute, hash-gated.

    Merge shuffle bounded by coarse-buckets × d·w = 1024 cells.
    """
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    factor = coarse_sec // fine_sec

    def rows_at(bucket_sec: int) -> DataFrame:
        return cms_hash_rows(events, bucket_sec, item_col, ts_col)

    fine_cells = (
        rows_at(fine_sec)
        .select(
            "bucket",
            F.posexplode(
                F.array(*[F.col(f"c{r}") for r in range(CMS_D)])
            ).alias("r", "c"),
        )
        .groupBy("bucket", "r", "c")
        .agg(F.count("*").cast("bigint").alias("cell_cnt"))
    )
    coarse_counters = (
        fine_cells.select(
            _floor_div("bucket", factor).alias("bucket"), "r", "c", "cell_cnt"
        )
        .groupBy("bucket", "r", "c")
        .agg(F.sum("cell_cnt").alias("cell_cnt"))
    )
    probes = (
        rows_at(coarse_sec)
        .groupBy("bucket", "item", *[f"c{r}" for r in range(CMS_D)])
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "bucket",
            "item",
            "cnt",
            F.posexplode(
                F.array(*[F.col(f"c{r}") for r in range(CMS_D)])
            ).alias("r", "c"),
        )
    )
    return (
        probes.join(coarse_counters, ["bucket", "r", "c"])
        .groupBy("bucket", "item", "cnt")
        .agg(F.min("cell_cnt").alias("est"))
        .select("bucket", "item", "est", "cnt")
    )


def bloom_probe_stats(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
) -> DataFrame:
    """Bloom-filter semi-join probe (Bloom 1970): hash every build-side
    key into ``k=4`` of ``m=4096`` bit positions, then test each probe
    key — a key is a *maybe-member* iff all k of its positions are set.
    Emitted next to the EXACT membership flag, so ``hit=1, actual=0``
    rows ARE the measured false positives (the k/m trade made visible;
    false negatives are impossible and pytest-pinned).

    Why a first-class operator: at 100 TB the bitmap (m bits, here ≤
    4096 distinct set positions) is the thing you BROADCAST to prune a
    fact-table scan before the shuffle — the portable re-derivation of
    Spark's own InjectRuntimeFilter bloom rewrite, but engine-checkable
    (the same md5 chain replays in ANSI SQL) and mergeable (bitmap OR =
    set-union of positions, pytest-pinned merge-equals-whole).

    Plan: build side collapses to ≤ m distinct positions (two combinable
    groupBys, broadcast both here and in the exact-membership join —
    the build side is the SMALL relation by contract, it is the side
    you would bloom at scale). Probe side: ONE groupBy on the probe key
    (bounded by distinct keys); the k-position explode preserves that
    hash partitioning, so the per-key match count groupBy REUSES the
    exchange — one shuffle total on the big side, plan-pinned.

    Output (item, probes, hit, actual) — integer-only, hash-stable.
    """
    from pyspark.sql.functions import broadcast

    build_keys = build.select(
        F.col(build_col).cast("string").alias("bitem")
    ).distinct()
    build_pos = (
        build_keys.select(
            F.explode(
                F.array(
                    *[(_h64(F.col("bitem"), r) % BLOOM_M).cast("int")
                      for r in range(BLOOM_K)]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe_items = probe.groupBy(
        F.col(probe_col).cast("string").alias("item")
    ).agg(F.count("*").cast("bigint").alias("probes"))
    probe_long = probe_items.select(
        "item",
        "probes",
        F.explode(
            F.array(
                *[(_h64(F.col("item"), r) % BLOOM_M).cast("int")
                  for r in range(BLOOM_K)]
            )
        ).alias("pos"),
    )
    marked = probe_long.join(
        broadcast(build_pos.withColumn("set_", F.lit(1))), "pos", "left"
    )
    hit = (
        marked.groupBy("item", "probes")
        .agg(F.sum(F.coalesce(F.col("set_"), F.lit(0))).alias("set_cnt"))
        .select(
            "item",
            "probes",
            F.when(F.col("set_cnt") == BLOOM_K, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("hit"),
        )
    )
    return hit.join(
        broadcast(build_keys.withColumnRenamed("bitem", "item")
                  .withColumn("actual", F.lit(1))),
        "item",
        "left",
    ).select(
        "item",
        "probes",
        "hit",
        F.coalesce(F.col("actual"), F.lit(0)).cast("int").alias("actual"),
    )


def hll_overlap_estimate(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Join-cardinality estimation from HLL sketches (the planner's
    question answered without touching either table twice): distinct
    estimates for each key column, their UNION via register-wise max,
    and the inclusion–exclusion intersection estimate ``|A| + |B| −
    |A∪B|`` — what a CBO uses to size a join before running it.

    All three estimates come from the SAME register chain as
    ``hll_rollup`` (exact integer z_int per sketch, ONE r6 float each);
    the intersection is their r6 difference (floored at 0). Output is a
    single row: (est_left, est_right, est_union, est_intersection).

    Scale: each side collapses to ≤ m=512 register rows map-side; the
    merge is a 512-row max. Nothing else moves.
    """
    def regs(df: DataFrame, col: str, tag: int) -> DataFrame:
        # reuse the SHARED register derivation (hll_register_rows) with a
        # constant pseudo-timestamp so the bucket collapses to the tag —
        # one chain for batch, stream, and overlap (review finding: a
        # verbatim copy here would drift exactly like the alpha bug)
        tagged = df.select(
            F.lit(tag).cast("long").alias("_ts"),
            F.col(col).cast("string").alias("_item"),
        )
        return (
            hll_register_rows(tagged, 1, "_item", "_ts")
            .groupBy("bucket", "idx")
            .agg(F.max("rho").alias("reg"))
        )

    ra = regs(left, left_col, 0)
    rb = regs(right, right_col, 1)
    union = (
        ra.select(F.lit(2).cast("long").alias("bucket"), "idx", "reg")
        .union(rb.select(F.lit(2).cast("long").alias("bucket"), "idx", "reg"))
        .groupBy("bucket", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    ests = _hll_estimate(ra.union(rb).union(union)).select("bucket", "est")
    # Ungrouped conditional aggregates, NOT groupBy().pivot(): pivot
    # returns ZERO rows on empty input while the oracle's ungrouped
    # max(CASE WHEN bucket=k ...) always returns one (all-NULL) row —
    # this form matches the oracle's shape exactly, degenerate input
    # included (an empty side legitimately yields a NULL estimate on
    # BOTH engines).
    def pick(k: int):
        return F.max(F.when(F.col("bucket") == k, F.col("est")))

    return ests.agg(
        pick(0).alias("est_left"),
        pick(1).alias("est_right"),
        pick(2).alias("est_union"),
        F.greatest(
            F.round(pick(0) + pick(1) - pick(2), 6), F.lit(0.0)
        ).alias("est_intersection"),
    )


#: KMV geometry: keep the k=64 smallest 32-bit hashes per group. The
#: estimator constant (k-1)·2^32 is exact in double (63·2^32 < 2^38).
KMV_K = 64
KMV_RANGE = 4294967296  # 2^32: _h64 yields 8 hex chars -> [0, 2^32)


def kmv_kept_rows(
    events: DataFrame,
    bucket_sec: int,
    item_col: str,
    ts_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """(bucket, h, rn) — the k smallest DISTINCT item hashes per time
    bucket: the KMV / bottom-k theta sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007). Shared front end of :func:`kmv_distinct`,
    :func:`kmv_rerollup` and :func:`kmv_overlap` so batch, tier-merge
    and set-op paths consume IDENTICAL hash rows.

    Determinism: hashes are the portable md5 family (``dedup._h64``,
    replayable bit-for-bit in ANSI SQL); the kept set is defined purely
    by integer order over DISTINCT hashes, so ``row_number`` needs no
    tie-break.

    Scale shape: the distinct is one combinable groupBy on
    ``(bucket, h)``; the per-bucket bottom-k is ``row_number() <= k``,
    which Spark rewrites to WindowGroupLimit — every map task keeps at
    most k rows per bucket BEFORE the window exchange, so the sort
    never sees more than k·tasks rows per bucket no matter how many
    distinct items the bucket holds.
    """
    from pyspark.sql.window import Window

    hashed = events.select(
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        _h64(F.col(item_col).cast("string"), 0).alias("h"),
    ).distinct()
    w = Window.partitionBy("bucket").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def _kmv_estimate(kept: DataFrame, k: int) -> DataFrame:
    """Finish (bucket, h, rn) kept rows into (bucket, n_kept, h_k, est).

    est = (k-1)·2^32 / h_k when the bucket saturated the sketch
    (n_kept = k), else the EXACT distinct count (a sketch that never
    filled holds the whole distinct set). Both branches are single
    ×/÷ expressions over exact integers — bit-identical across engines
    with no rounding (the ``holt`` raw-double convention).
    """
    agg = kept.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * KMV_RANGE)) / F.col("h_k").cast("double")
    )
    return agg.select(
        "bucket",
        "n_kept",
        F.coalesce(F.col("h_k"), F.lit(KMV_RANGE)).cast("bigint").alias("h_k"),
        est.alias("est"),
    )


def kmv_distinct(
    events: DataFrame,
    bucket_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
    k: int = KMV_K,
) -> DataFrame:
    """Approximate COUNT(DISTINCT item) per time bucket via the KMV
    bottom-k sketch: keep the k smallest distinct md5 hashes, estimate
    (k-1)/U_(k) with U the k-th minimum normalized to [0,1) (Beyer et
    al. 2007 unbiased form), exact below k.

    Why next to HLL: the kept set IS the sketch — mergeable by "union
    then re-take bottom-k" with an EXACT identity (the k smallest of a
    coarse bucket are necessarily among the k smallest of their fine
    bucket), and two sketches support set operations (see
    :func:`kmv_overlap`) that HLL registers cannot express without
    inclusion–exclusion error stacking.

    Output: (bucket, n_kept, h_k, est) — integers plus one raw float
    that is a single ×/÷ over exact integers (h_k = 2^32 sentinel when
    the sketch never filled).
    """
    return _kmv_estimate(kmv_kept_rows(events, bucket_sec, item_col, ts_col, k), k)


def kmv_rerollup(
    events: DataFrame,
    fine_sec: int = 3600,
    coarse_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
    k: int = KMV_K,
) -> DataFrame:
    """RETENTION-TIER path for the KMV column: build tier-1 kept sets at
    ``fine_sec``, merge them into ``coarse_sec`` buckets by
    union-distinct + re-take-bottom-k — WITHOUT touching raw rows again
    — and estimate. EXACT identity with recomputing at ``coarse_sec``
    (any hash among a coarse bucket's k smallest is among the k
    smallest of its fine bucket — pytest-pinned merge==recompute, every
    column), the KMV analogue of the HLL register-max re-rollup.

    Scale: tier-1 ships ≤ k rows per fine bucket; the merge is a
    distinct + WindowGroupLimit bottom-k over ≤ k·(coarse/fine) rows
    per coarse bucket. Raw rows never move twice.
    """
    from pyspark.sql.window import Window

    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    factor = coarse_sec // fine_sec
    fine = kmv_kept_rows(events, fine_sec, item_col, ts_col, k)
    merged = (
        fine.select(_floor_div("bucket", factor).alias("bucket"), "h")
        .distinct()
    )
    w = Window.partitionBy("bucket").orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return _kmv_estimate(kept, k)


def kmv_overlap(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Theta-sketch set operations over two KMV kept sets (the
    DataSketches theta union/intersection, Dasgupta et al. 2016): with
    theta = min(theta_A, theta_B), every kept hash below theta is a
    uniform sample of the union, so

        est_intersection = |{h in A_kept ∩ B_kept : h < theta}| · 2^32 / theta

    — a DIRECT intersection estimate (HLL can only do inclusion–
    exclusion, whose error stacks three estimates). Sides that never
    filled (n < k) carry theta = 2^32, making their contribution EXACT;
    when both sides are exact the intersection estimate IS the exact
    intersection count.

    Output one row: (n_a, n_b, theta_h, n_common, est_a, est_b,
    est_intersection, est_union, jaccard_est) — integers plus raw
    floats, each a fixed-shape expression over exact integers
    (est_union = est_a + est_b − est_intersection evaluated in that
    literal order on both engines; jaccard = est_intersection /
    est_union, NULL when the union estimate is 0).

    Scale: each side collapses to ≤ k rows before anything joins; the
    set ops are k-row sorted-set operations. Nothing else moves.
    """
    def kept(df: DataFrame, col: str) -> DataFrame:
        tagged = df.select(
            F.lit(0).cast("long").alias("_ts"),
            F.col(col).cast("string").alias("_item"),
        )
        return kmv_kept_rows(tagged, 1, "_item", "_ts", k)

    ka = kept(left, left_col).select("h", "rn")
    kb = kept(right, right_col).select("h", "rn")

    def side_stats(kdf: DataFrame):
        return kdf.agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(
                F.max(F.when(F.col("rn") == k, F.col("h"))),
                F.lit(KMV_RANGE).cast("bigint"),
            ).alias("theta"),
        )

    sa = side_stats(ka).select(
        F.col("n").alias("n_a"), F.col("theta").alias("theta_a")
    )
    sb = side_stats(kb).select(
        F.col("n").alias("n_b"), F.col("theta").alias("theta_b")
    )
    stats = sa.crossJoin(sb).select(
        "n_a",
        "n_b",
        "theta_a",
        "theta_b",
        F.least(F.col("theta_a"), F.col("theta_b")).alias("theta_h"),
    )
    common = (
        ka.select("h")
        .join(kb.select("h"), "h")
        .crossJoin(F.broadcast(stats.select("theta_h")))
        .filter(F.col("h") < F.col("theta_h"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    out = stats.crossJoin(F.broadcast(common))

    def side_est(n: str, theta: str):
        return F.when(
            F.col(n) < k, F.col(n).cast("double")
        ).otherwise(
            F.lit(float((k - 1) * KMV_RANGE)) / F.col(theta).cast("double")
        )

    est_a = side_est("n_a", "theta_a")
    est_b = side_est("n_b", "theta_b")
    est_i = (
        F.col("n_common").cast("double")
        * F.lit(float(KMV_RANGE))
        / F.col("theta_h").cast("double")
    )
    est_u = est_a + est_b - est_i
    return out.select(
        "n_a",
        "n_b",
        F.col("theta_h").cast("bigint").alias("theta_h"),
        "n_common",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_i.alias("est_intersection"),
        est_u.alias("est_union"),
        F.when(est_u > 0, est_i / est_u).alias("jaccard_est"),
    )


#: HDR sub-bucket resolution: 2^5 = 32 sub-bucket labels per
#: power-of-two octave (the upper 16 are populated: sub = m >> (w−5)
#: ∈ [16, 31]), so bucket width / lower bound ≤ 1/16 and midpoint
#: estimates carry ≤ ~3% relative error — the HdrHistogram
#: "5 significant bits" configuration.
HDR_SUB = 1 << 5


def _hdr_index(cu_name: str):
    """Signed exponential bucket index of a centi-unit BIGINT column —
    the HdrHistogram / Prometheus-native-histogram indexing scheme
    (octave = bit length, sub-bucket = top 5 mantissa bits), computed
    with EXACT integer/string ops only (integer-literal F.expr, the
    house bitwise-form exception).

    Why no logarithms: DDSketch's ceil(ln x / ln γ) index (Masson et
    al., VLDB 2019) is float — Spark's Math.log and DuckDB's libm log
    can disagree by 1 ulp exactly at a bucket boundary and silently
    flip an index. ``length(bin(m))`` is the exact floor(log2 m)+1 on
    BOTH engines (minimal binary string), and the sub-bucket is a pure
    right-shift, so the index is deterministic by construction — the
    same reason the moments sketch carries decimal power sums instead
    of float moments.

    Layout (m = |cu|): cu = 0 → 0; m < 32 → ±m (small values are
    singleton buckets, exact); else ±(w·32 + (m >> (w−5))) with
    w = length(bin(m)). Strictly monotone in the signed value, so
    ordering idx orders values; negatives mirror to −index (DDSketch's
    negative store flattened onto one ordered axis).
    """
    c, m = cu_name, f"abs({cu_name})"
    body = (
        f"CASE WHEN {m} < {HDR_SUB} THEN {m} "
        f"ELSE length(bin({m})) * {HDR_SUB} "
        f"+ shiftright({m}, cast(length(bin({m})) - 5 as int)) END"
    )
    return F.expr(
        f"CAST(CASE WHEN {c} = 0 THEN 0 "
        f"WHEN {c} < 0 THEN -({body}) ELSE {body} END AS BIGINT)"
    )


def _hdr_estimate(idx_name: str):
    """Representative value (original units) of an HDR bucket index:
    the integer midpoint of the bucket's centi-unit range, ÷ 100.

    m = |idx| < 32 → the exact centi-unit value m; else the bucket
    covers [r·2^(w−5), (r+1)·2^(w−5)) with w = m div 32, r = m mod 32,
    and the midpoint is ((lb + ub) >> 1) — all-integer shifts. The only
    float ops are one exact-integer → double conversion and one ÷ 100.0
    (F.lit python float, never an F.expr decimal) — bit-identical
    across engines by IEEE correct rounding, no rounding step (the holt
    raw-double convention).
    """
    i, m = idx_name, f"abs({idx_name})"
    sh = f"cast({m} div {HDR_SUB} - 5 as int)"
    mid = (
        f"CASE WHEN {m} < {HDR_SUB} THEN {m} "
        f"ELSE shiftright(shiftleft({m} % {HDR_SUB}, {sh}) "
        f"+ shiftleft({m} % {HDR_SUB} + 1, {sh}) - 1, 1) END"
    )
    signed = (
        f"CAST(CASE WHEN {i} < 0 THEN -({mid}) ELSE ({mid}) END AS DOUBLE)"
    )
    return F.expr(signed) / F.lit(100.0)


def hdr_index_rows(
    events: DataFrame,
    bucket_sec: int,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """(key, bucket, idx) — one row per event, JVM-side index
    expressions only: the shared front end of batch :func:`hdr_rollup`
    and ``streaming.hdr_stream`` (IDENTICAL expressions, so
    stream==batch is exact — the hll_register_rows convention)."""
    return events.select(
        F.col(key_col).alias("key"),
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("cu"),
    ).select("key", "bucket", _hdr_index("cu").alias("idx"))


def hdr_rollup(
    events: DataFrame,
    bucket_sec: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
) -> DataFrame:
    """Exponential-bucket (HdrHistogram-style) value sketch per
    (key, time bucket): the mergeable relative-error quantile state a
    retention-tier store keeps where ``rollup_percentiles`` would need
    every raw row again (TimescaleDB ships the same role as
    uddsketch/tdigest hyperfunctions; Prometheus native histograms are
    this exact layout).

    State is (idx, cnt) pairs — ≤ 16 populated sub-buckets per octave,
    so a few hundred rows per (key, bucket) no matter how many raw rows
    or distinct values the bucket holds, and tier k+1 merges tier k by
    summing cnt per idx (:func:`hdr_rerollup` — merge == recompute is
    an exact integer identity). Values are centi-units
    (round(value·100), the moments-sketch convention); the index is
    log-free exact integer arithmetic (:func:`_hdr_index`).

    Scale: ONE combinable groupBy — partial aggregation collapses each
    map task to the bucket count before the exchange.

    Output: (key, bucket, idx, cnt, est_v) where est_v is the bucket's
    deterministic midpoint representative (:func:`_hdr_estimate`).
    """
    rows = hdr_index_rows(events, bucket_sec, key_col, ts_col, value_col)
    return (
        rows.groupBy("key", "bucket", "idx")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            F.col("key"),
            "bucket",
            "idx",
            "cnt",
            _hdr_estimate("idx").alias("est_v"),
        )
    )


def hdr_rerollup(
    events: DataFrame,
    fine_sec: int = 3600,
    coarse_sec: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
) -> DataFrame:
    """Retention-tier merge of the HDR sketch: fine-tier (idx, cnt)
    rows summed into the coarse tier — tier k+1 reads tier k ONLY,
    never raw rows. Counts are integers and addition is associative,
    so merge == recompute exactly (the oracle IS the direct coarse
    recompute; pytest pins bit-identity incl. est_v)."""
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    factor = coarse_sec // fine_sec
    fine = hdr_rollup(events, fine_sec, key_col, ts_col, value_col)
    return (
        fine.select(
            "key", _floor_div("bucket", factor).alias("bucket"), "idx", "cnt"
        )
        .groupBy("key", "bucket", "idx")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .select(
            "key", "bucket", "idx", "cnt", _hdr_estimate("idx").alias("est_v")
        )
    )


def hdr_quantiles(
    events: DataFrame,
    bucket_sec: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
) -> DataFrame:
    """p50 / p90 / p99 per (key, time bucket) read off the HDR sketch:
    cumulative counts in index order, quantile q = the representative
    of the first bucket whose cumulative count reaches the EXACT
    integer rank ceil(q·n) — rank arithmetic is all-integer
    ((n+1) div 2, (9n+9) div 10, (99n+99) div 100), so no float
    literal ever meets a row count (the 0.9·n double-vs-decimal ceil
    trap). idx is unique per partition after the sketch groupBy, so
    the cumsum window needs no tie-break (the sessionize total-order
    rule is satisfied by construction).

    Scale: the raw-row groupBy is the only full exchange; the window +
    final groupBy run over SKETCH rows (bounded per key·bucket) and
    share one small (key, bucket)-hash exchange — the same
    sketch-then-finish shape as hll_rollup.

    Output: (key, bucket, n, p50_est, p90_est, p99_est).
    """
    from pyspark.sql.window import Window

    sk = hdr_rollup(events, bucket_sec, key_col, ts_col, value_col)
    wcum = (
        Window.partitionBy("key", "bucket")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("key", "bucket")
    cum = sk.select(
        "key",
        "bucket",
        "idx",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    picks = cum.groupBy("key", "bucket").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("idx"))
        ).alias("i50"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n * 9 + 9) div 10"), F.col("idx"))
        ).alias("i90"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 99 + 99) div 100"), F.col("idx")
            )
        ).alias("i99"),
    )
    return picks.select(
        "key",
        "bucket",
        "n",
        _hdr_estimate("i50").alias("p50_est"),
        _hdr_estimate("i90").alias("p90_est"),
        _hdr_estimate("i99").alias("p99_est"),
    )


def mg_summary(
    events: DataFrame,
    bucket_sec: int = 21600,
    item_col: str = "user_id",
    ts_col: str = "sec",
    k: int = 8,
) -> DataFrame:
    """Misra–Gries heavy-hitter summary per time bucket: at most ``k``
    (item, counter) pairs with the one-sided guarantee

        true_count - n/(k+1)  <=  est  <=  true_count

    (Misra & Gries 1982; the mergeable-summaries form of Agarwal et
    al., PODS 2012 §2). The canonical batch construction: exact counts
    per (bucket, item), theta = the (k+1)-th largest count in the
    bucket (0 when the bucket holds <= k distinct items), keep
    ``est = count - theta`` where positive. At most k items can exceed
    the (k+1)-th largest count, so the summary is k-bounded by
    construction; boundary ties (count == theta) drop to 0 and are
    pruned, which keeps the output deterministic with NO tie-break
    dependence — theta is the value at a fixed position of the sorted
    count MULTISET, identical under any ordering of equal counts.

    Why next to the exact :func:`~tsmp_spark.operators.rollup.heavy_hitters`
    and CMS: the exact top-N is not mergeable (a coarse bucket's top-N
    is not derivable from fine top-Ns), and CMS answers point queries
    but cannot enumerate its heavy items without a candidate set. The
    MG summary is both k-bounded AND mergeable (:func:`mg_rerollup`),
    the shape a retention tier actually stores.

    Integer-only output (bucket, item, est, theta, n) — n is the bucket
    total so the n/(k+1) error bound is checkable row-locally.

    Scale: one combinable (bucket, item) groupBy absorbs hot keys
    map-side; theta and n come from windows over the AGGREGATED rows
    (cardinality = distinct items per bucket, never raw rows) reusing
    the same bucket exchange; output <= k rows per bucket.
    """
    return _mg_finish(_mg_counts(events, bucket_sec, item_col, ts_col), k)


def _mg_counts(
    events: DataFrame, bucket_sec: int, item_col: str, ts_col: str
) -> DataFrame:
    """Exact (bucket, item, cnt) counters — the single raw-row pass both
    the fine summary and the tier merge's exact-n metadata derive from."""
    return (
        events.select(
            F.floor(F.col(ts_col).cast("long") / bucket_sec)
            .cast("long")
            .alias("bucket"),
            F.col(item_col).cast("bigint").alias("item"),
        )
        .groupBy("bucket", "item")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def _mg_finish(counts: DataFrame, k: int) -> DataFrame:
    """(bucket, item, cnt) exact-or-partial counters -> the k-bounded
    MG summary (bucket, item, est, theta, n). theta = (k+1)-th largest
    counter per bucket, taken from a ``row_number() <= k+1`` filter so
    Spark's WindowGroupLimit pushes a PARTIAL top-(k+1) below the
    exchange (plan-pinned) — a bucket with millions of distinct items
    never becomes a single-task full sort, each map task forwards at
    most k+1 rows per bucket. Every survivor (cnt > theta) is by
    definition among the top k, so the limited window is lossless.
    n = one combinable long-sum per bucket over the same counts
    exchange (ReusedExchange, not a second raw scan); theta/n join back
    onto <= k rows per bucket — all post-aggregation shuffles are
    k-bounded."""
    from pyspark.sql.window import Window

    wrank = Window.partitionBy("bucket").orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    top = counts.withColumn("rnk", F.row_number().over(wrank)).filter(
        F.col("rnk") <= k + 1
    )
    theta = top.groupBy("bucket").agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == k + 1, F.col("cnt"))),
            F.lit(0).cast("bigint"),
        ).alias("theta")
    )
    ns = counts.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    return (
        top.filter(F.col("rnk") <= k)
        .join(theta, "bucket")
        .filter(F.col("cnt") > F.col("theta"))
        .join(ns, "bucket")
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("item").cast("bigint").alias("item"),
            (F.col("cnt") - F.col("theta")).cast("bigint").alias("est"),
            F.col("theta").cast("bigint").alias("theta"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def mg_rerollup(
    events: DataFrame,
    fine_sec: int = 21600,
    coarse_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
    k: int = 8,
) -> DataFrame:
    """RETENTION-TIER merge for MG summaries: build tier-1 summaries at
    ``fine_sec``, merge into ``coarse_sec`` buckets by summing
    surviving counters per item and re-applying the (k+1)-th-largest
    subtraction (the Agarwal et al. PODS 2012 §2.1 MERGE — sum
    counter vectors, subtract the (k+1)-th largest, prune) — raw rows
    are never rescanned. Unlike the KMV/HLL/moments tiers this merge is
    NOT identical to recomputing (MG is a lossy summary; errors add),
    but the merged summary provably keeps the one-sided guarantee
    ``true - n/(k+1) <= est <= true`` over the COARSE bucket's total n:
    each subtraction of a (k+1)-th-largest theta removes >= (k+1)·theta
    of counter mass, total removed mass <= n, so
    sum(fine thetas) + merge theta <= n/(k+1). The pytest pins both
    bounds against exact coarse counts, and the oracle replays the
    merge chain itself.

    The merged ``n`` column is the EXACT coarse-bucket total. It comes
    from the fine count aggregate, not from surviving summary rows —
    per-bucket ``n`` is metadata a tier store keeps alongside the
    counters, and a fine bucket whose counters ALL prune (all-unique
    traffic with > k items makes theta == every count) materialises
    zero rows, so summing surviving-row ns would silently under-count
    the coarse n and void the n/(k+1) bound exactly when traffic is
    flattest.

    Scale: the counter sums tier-2 reads are k-bounded per fine bucket;
    the n metadata is one combinable long-sum per coarse bucket off the
    same fine count aggregate — <= k·(coarse/fine) + 1 inputs per
    coarse bucket into one groupBy + the k-bounded finish.
    """
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    factor = coarse_sec // fine_sec
    counts = _mg_counts(events, fine_sec, item_col, ts_col)
    fine = _mg_finish(counts, k)
    ns = (
        counts.select(_floor_div("bucket", factor).alias("bucket"), "cnt")
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("bigint").alias("n_total"))
    )
    merged = (
        fine.select(
            _floor_div("bucket", factor).alias("bucket"), "item", "est"
        )
        .groupBy("bucket", "item")
        .agg(F.sum("est").cast("bigint").alias("cnt"))
    )
    out = _mg_finish(merged, k)
    return (
        out.drop("n")
        .join(ns, "bucket")
        .select(
            "bucket",
            "item",
            "est",
            "theta",
            F.col("n_total").cast("bigint").alias("n"),
        )
    )


#: AMS geometry: 64 ±1 counters = 4 groups × 16, signs from the two
#: 32-bit halves of ONE 'f2:'-salted md5 digest per item.
AMS_K = 64
AMS_G = 4
AMS_PER_G = AMS_K // AMS_G


def _ams_sign(half: str, bit: int):
    """±1 sign from bit ``bit`` of a 32-bit hash half — the identical
    integer expression on both engines: 1 - 2·((h >> bit) & 1)."""
    return F.lit(1) - F.lit(2) * F.shiftright(F.col(half), bit).bitwiseAND(
        F.lit(1)
    ).cast("long")


def ams_hash_rows(
    events: DataFrame,
    bucket_sec: int,
    item_col: str,
    ts_col: str,
) -> DataFrame:
    """(bucket, item, h0, h1) hashed rows — the shared JVM-side front
    end of batch ``ams_f2``/``ams_rerollup`` and
    ``streaming.ams_stream`` (the hll_register_rows convention: the
    stream's Python state function only folds, never re-derives)."""
    return events.select(
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    ).withColumn(
        "h0",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f2:"), F.col("item"))), 1, 8),
            16, 10,
        ).cast("long"),
    ).withColumn(
        "h1",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f2:"), F.col("item"))), 9, 8),
            16, 10,
        ).cast("long"),
    )


def ams_f2(
    events: DataFrame,
    bucket_sec: int = 21600,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """AMS second-frequency-moment (self-join size) sketch per bucket
    (Alon, Matias & Szegedy 1996 "tug-of-war"): 64 ±1-signed counters
    c_j = Σ_rows sign_j(item); each group of 16 estimates F2 = Σ cnt²
    as Σ c_j² (x16), the output takes the LOWER MEDIAN of the 4 group
    sums — everything integer until one exact dyadic ÷16.

    F2 is the repeat-heaviness of the bucket (self-join cardinality,
    skew diagnostic, join-size planning input). Output per bucket:
    ``est_x16`` (lower-median group sum, bigint), ``est``
    (= est_x16/16.0, exact dyadic double), ``f2_exact`` (Σ cnt² over
    true per-item counts, bigint — so ``est/f2_exact`` IS the measured
    sketch error), ``n`` rows.

    Scale: the counter pass is ONE map-side-combinable groupBy(bucket)
    with 64 conditional integer sums over projected hash halves — no
    explode, state 64 longs per bucket; the exact-F2 pass is the
    (bucket,item) count groupBy (the only cardinality-bound shuffle;
    at unbounded item cardinality drop f2_exact and the sketch leg
    alone is the operator). Counters MERGE by element-wise sum
    (linearity of c_j in the multiset ⇒ merge == recompute EXACTLY —
    the identity `ams_rerollup`'s oracle rides)."""
    rows = ams_hash_rows(events, bucket_sec, item_col, ts_col)
    counters = rows.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            F.sum(_ams_sign("h0" if j < 32 else "h1", j % 32))
            .cast("bigint")
            .alias(f"c{j}")
            for j in range(AMS_K)
        ],
    )
    gsums = [
        sum(
            F.col(f"c{j}") * F.col(f"c{j}")
            for j in range(g * AMS_PER_G, (g + 1) * AMS_PER_G)
        ).alias(f"g{g}")
        for g in range(AMS_G)
    ]
    est = counters.select("bucket", "n", *gsums).select(
        "bucket",
        "n",
        F.sort_array(F.array(*[F.col(f"g{g}") for g in range(AMS_G)]))[1]
        .cast("bigint")
        .alias("est_x16"),
    )
    exact = (
        events.select(
            F.floor(F.col(ts_col).cast("long") / bucket_sec)
            .cast("long")
            .alias("bucket"),
            F.col(item_col).cast("string").alias("item"),
        )
        .groupBy("bucket", "item")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .groupBy("bucket")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("f2_exact"))
    )
    return est.join(exact, "bucket").select(
        "bucket",
        "est_x16",
        (F.col("est_x16") / F.lit(float(AMS_PER_G))).alias("est"),
        "f2_exact",
        "n",
    )


def ams_rerollup(
    events: DataFrame,
    fine_sec: int = 21600,
    coarse_sec: int = 86400,
    item_col: str = "user_id",
    ts_col: str = "sec",
) -> DataFrame:
    """AMS retention-tier merge: fine-bucket counters summed element-
    wise into coarse buckets READING TIER-1 ONLY, then the estimate
    recomputed from merged counters. c_j is linear in the multiset, so
    merge == recompute EXACTLY and the oracle is the direct coarse
    recompute (the state_rerollup/hll_rerollup identity convention).

    Merge shuffle is coarse-buckets × 64 longs — independent of raw
    row count, the tiered-store property."""
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    rows = ams_hash_rows(events, fine_sec, item_col, ts_col)
    fine = rows.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            F.sum(_ams_sign("h0" if j < 32 else "h1", j % 32))
            .cast("bigint")
            .alias(f"c{j}")
            for j in range(AMS_K)
        ],
    )
    factor = coarse_sec // fine_sec
    merged = fine.groupBy(_floor_div("bucket", factor).alias("bucket")).agg(
        F.sum("n").cast("bigint").alias("n"),
        *[F.sum(f"c{j}").cast("bigint").alias(f"c{j}") for j in range(AMS_K)],
    )
    gsums = [
        sum(
            F.col(f"c{j}") * F.col(f"c{j}")
            for j in range(g * AMS_PER_G, (g + 1) * AMS_PER_G)
        ).alias(f"g{g}")
        for g in range(AMS_G)
    ]
    return merged.select("bucket", "n", *gsums).select(
        "bucket",
        F.sort_array(F.array(*[F.col(f"g{g}") for g in range(AMS_G)]))[1]
        .cast("bigint")
        .alias("est_x16"),
        F.col("n"),
    )


# --- DGIM exponential histogram: sliding-window bit counting -----------------

#: max digit levels for the DGIM closed form — 2^30 ones per key bound.
DGIM_LEVELS = 30


def dgim_buckets(
    events: DataFrame,
    bit_col,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """DGIM exponential-histogram buckets (Datar, Gionis, Indyk, Motwani,
    SICOMP 2002 — the classic sliding-window bit-counting sketch with
    O(log^2 N) state) in CLOSED FORM.

    The key identity that makes this a one-pass relational operator
    instead of a sequential replay: with the ≤2-buckets-per-size
    invariant, the multiset of DGIM bucket sizes after ``c`` ones is the
    UNIQUE representation of ``c`` as ``Σ d_i·2^i`` with digits
    ``d_i ∈ {1,2}`` (merging the two oldest same-size buckets preserves
    exactly this canonical form), and the buckets partition the ones
    into contiguous rank ranges, sizes ascending from newest.  So the
    full bucket list — sizes AND timestamps — is a deterministic
    function of (c, the ranked one-positions): no state machine, no
    Python, one shuffle by key.

    ``bit_col``: boolean Column marking the 1-bits. Position = rank of
    the event in the key's total (ts, id) order (DGIM windows are over
    POSITIONS). Returns one row per bucket:
    ``key, c_ones, n_pos, bucket_idx (0 = newest), size, pos``
    (pos = position of the newest one inside the bucket).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    base = events.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        bit_col.cast("int").alias("bit"),
    )
    ones = base.where(F.col("bit") == 1)
    wr = Window.partitionBy("key").orderBy(F.col("pos").desc())
    ranked = ones.select(
        "key", "pos", F.row_number().over(wr).cast("bigint").alias("rnk")
    )
    totals = base.groupBy("key").agg(
        F.max("pos").alias("n_pos"), F.sum("bit").cast("bigint").alias("c_ones")
    )
    # digits of c in the {1,2} base-2 representation, newest (size 1) first:
    # fold over DGIM_LEVELS steps carrying (rem, size, sizes[]).
    zero = F.named_struct(
        F.lit("rem"), F.col("c_ones"),
        F.lit("sz"), F.lit(1).cast("bigint"),
        F.lit("sizes"), F.array().cast("array<bigint>"),
    )

    def _step(acc, _i):
        rem, sz, sizes = acc["rem"], acc["sz"], acc["sizes"]
        d = (
            F.when(rem == 0, F.lit(0))
            .when(rem % 2 == 1, F.lit(1))
            .otherwise(F.lit(2))
            .cast("bigint")
        )
        appended = (
            F.when(d == 0, sizes)
            .when(d == 1, F.concat(sizes, F.array(sz)))
            .otherwise(F.concat(sizes, F.array(sz, sz)))
        )
        return F.named_struct(
            F.lit("rem"), ((rem - d) / F.lit(2)).cast("bigint"),
            F.lit("sz"), sz * 2,
            F.lit("sizes"), appended,
        )

    sized = totals.select(
        "key", "n_pos", "c_ones",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(DGIM_LEVELS)), zero, _step
        )["sizes"].alias("sizes"),
    )
    # bucket k (0-based, newest first) covers ranks (Σ_{j<k} size_j, Σ_{j≤k}];
    # its timestamp is the position of its newest one: rank Σ_{j<k}+1.
    b = sized.select(
        "key", "n_pos", "c_ones",
        F.posexplode("sizes").alias("bucket_idx", "size"),
        F.col("sizes"),
    ).select(
        "key", "n_pos", "c_ones", "bucket_idx", "size",
        (
            F.aggregate(
                F.slice(F.col("sizes"), 1, F.col("bucket_idx")),
                F.lit(0).cast("bigint"),
                lambda a, s: a + s,
            )
            + 1
        ).alias("head_rank"),
    )
    r = ranked.select(
        F.col("key").alias("rkey"), F.col("rnk").alias("head_rank"), "pos"
    )
    return b.join(
        r, (b["key"] == r["rkey"]) & (b["head_rank"] == r["head_rank"])
    ).select(b["key"], "n_pos", "c_ones", "bucket_idx", "size", "pos")


def dgim_estimate(
    events: DataFrame,
    bit_col,
    window_sizes: tuple[int, ...] = (8, 32, 128, 512),
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """DGIM count estimate over the last ``N`` positions per key, one row
    per (key, N): classic rule — sum the sizes of in-window buckets and
    halve the oldest.  Emitted in DOUBLED integer units (``est2`` =
    2·estimate) so the halving never leaves the integers; ``exact`` is
    the true in-window one-count (the ≤50 % relative-error bound is a
    pytest property, not a hashed float).

    Scale: ONE shuffle by key for the position ranking, then everything
    is per-key O(log² N) bucket rows; the windows table is a literal
    broadcast. State at 100 TB = ~60 bucket rows per key, not raw bits.
    """
    spark = events.sparkSession
    b = dgim_buckets(events, bit_col, key_col, ts_col, id_col)
    wins = spark.createDataFrame(
        [(int(n),) for n in window_sizes], "n_window bigint"
    )
    inw = (
        b.crossJoin(F.broadcast(wins))
        .where(F.col("pos") >= F.col("n_pos") - F.col("n_window") + 1)
        .groupBy("key", "n_window")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            (2 * F.sum("size") - F.max("size")).cast("bigint").alias("est2"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    base = events.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        bit_col.cast("int").alias("bit"),
    )
    npos = base.groupBy("key").agg(F.max("pos").alias("n_pos"))
    exact = (
        base.join(npos, "key")
        .crossJoin(F.broadcast(wins))
        .where(F.col("pos") >= F.col("n_pos") - F.col("n_window") + 1)
        .groupBy("key", "n_window")
        .agg(F.sum("bit").cast("bigint").alias("exact"))
    )
    return (
        exact.join(inw, ["key", "n_window"], "left")
        .select(
            "key",
            "n_window",
            F.coalesce("n_buckets", F.lit(0)).cast("bigint").alias("n_buckets"),
            F.coalesce("est2", F.lit(0)).cast("bigint").alias("est2"),
            "exact",
        )
    )


# --- count-sketch: signed frequency estimation --------------------------------

#: count-sketch geometry: d=4 rows x w=256 signed counters; column hashes
#: from md5 digest 's2:' (seeds 8..11), sign hashes from 's3:' (12..15).
CS_D = 4
CS_W = 256


def cs_hash_rows(
    events: DataFrame, bucket_sec: int, item_col: str, ts_col: str
) -> DataFrame:
    """(bucket, item, k0..k3, g0..g3) hashed rows — column index and ±1
    sign per count-sketch row, all from the portable md5 family
    (`dedup._h64`), reproducible bit-for-bit in ANSI SQL."""
    sel = [
        F.floor(F.col(ts_col).cast("long") / bucket_sec)
        .cast("long")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    ]
    item = F.col(item_col).cast("string")
    sel += [
        (_h64(item, 8 + r) % CS_W).cast("int").alias(f"k{r}") for r in range(CS_D)
    ]
    sel += [
        ((_h64(item, 12 + r) % 2) * 2 - 1).cast("int").alias(f"g{r}")
        for r in range(CS_D)
    ]
    return events.select(*sel)


def count_sketch(
    events: DataFrame,
    bucket_sec: int = 21600,
    item_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Count-sketch frequency estimates per (bucket, item) (Charikar,
    Chen & Farach-Colton, ICALP 2002): where count-min's unsigned
    counters only ever OVER-estimate, count-sketch counters accumulate
    ±1-signed counts so collisions cancel in expectation — the estimator
    ``median_r(g_r(x)·C[r, k_r(x)])`` is unbiased, the sketch behind
    heavy-hitter recovery in one pass over adversarial skew.

    Deterministic median: with d=4 the LOWER MEDIAN (2nd smallest) is
    taken — a fixed position of the value multiset, so engines cannot
    disagree on ties (the ams_f2 convention). Integer-only output
    ``(bucket, item, est, cnt)`` with the exact count alongside; unlike
    CMS, ``est`` may be below OR above ``cnt``.

    Scale: state is d·w = 1024 signed cells per bucket regardless of
    item cardinality; one combinable groupBy builds cells, the probe
    joins distinct items × d — the cms_counts plan shape exactly.
    Counters merge by cell-wise SUM (linearity), so retention tiers
    re-roll without raw rows (`cs_rerollup`).
    """
    rows = cs_hash_rows(events, bucket_sec, item_col, ts_col)
    cells = rows.select(
        "bucket",
        F.posexplode(
            F.array(
                *[
                    F.struct(F.col(f"k{r}").alias("c"), F.col(f"g{r}").alias("g"))
                    for r in range(CS_D)
                ]
            )
        ).alias("r", "kg"),
    ).select("bucket", "r", F.col("kg.c").alias("c"), F.col("kg.g").alias("g"))
    counters = cells.groupBy("bucket", "r", "c").agg(
        F.sum("g").cast("bigint").alias("cell")
    )
    probes = (
        rows.groupBy(
            "bucket", "item",
            *[f"k{r}" for r in range(CS_D)],
            *[f"g{r}" for r in range(CS_D)],
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "bucket",
            "item",
            "cnt",
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"k{r}").alias("c"), F.col(f"g{r}").alias("g")
                        )
                        for r in range(CS_D)
                    ]
                )
            ).alias("r", "kg"),
        )
        .select(
            "bucket", "item", "cnt", "r",
            F.col("kg.c").alias("c"), F.col("kg.g").alias("g"),
        )
    )
    return (
        probes.join(counters, ["bucket", "r", "c"])
        .groupBy("bucket", "item", "cnt")
        .agg(
            F.sort_array(F.collect_list(F.col("g") * F.col("cell")))[1]
            .cast("bigint")
            .alias("est")
        )
        .select("bucket", "item", "est", "cnt")
    )


def cs_rerollup(
    events: DataFrame,
    fine_sec: int = 3600,
    coarse_sec: int = 21600,
    item_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Retention-tier path for the count-sketch column: tier-1 signed
    cells at ``fine_sec`` merged cell-wise-sum into ``coarse_sec``
    buckets (tier k+1 reads tier k only — counter linearity makes
    merged == rebuilt-at-coarse an exact integer identity, which is
    what the driver oracle gates), then the per-item estimate answered
    against the merged counters."""
    if coarse_sec % fine_sec != 0:
        raise ValueError("coarse_sec must be a multiple of fine_sec")
    rows = cs_hash_rows(events, fine_sec, item_col, ts_col)
    fine = (
        rows.select(
            "bucket",
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"k{r}").alias("c"), F.col(f"g{r}").alias("g")
                        )
                        for r in range(CS_D)
                    ]
                )
            ).alias("r", "kg"),
        )
        .select("bucket", "r", F.col("kg.c").alias("c"), F.col("kg.g").alias("g"))
        .groupBy("bucket", "r", "c")
        .agg(F.sum("g").cast("bigint").alias("cell"))
    )
    factor = coarse_sec // fine_sec
    merged = fine.groupBy(
        _floor_div("bucket", factor).alias("bucket"), "r", "c"
    ).agg(F.sum("cell").cast("bigint").alias("cell"))
    probes = (
        cs_hash_rows(events, coarse_sec, item_col, ts_col)
        .groupBy(
            "bucket", "item",
            *[f"k{r}" for r in range(CS_D)],
            *[f"g{r}" for r in range(CS_D)],
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "bucket", "item", "cnt",
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"k{r}").alias("c"), F.col(f"g{r}").alias("g")
                        )
                        for r in range(CS_D)
                    ]
                )
            ).alias("r", "kg"),
        )
        .select(
            "bucket", "item", "cnt", "r",
            F.col("kg.c").alias("c"), F.col("kg.g").alias("g"),
        )
    )
    return (
        probes.join(merged, ["bucket", "r", "c"])
        .groupBy("bucket", "item", "cnt")
        .agg(
            F.sort_array(F.collect_list(F.col("g") * F.col("cell")))[1]
            .cast("bigint")
            .alias("est")
        )
        .select("bucket", "item", "est", "cnt")
    )


def kmv_difference(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Theta-sketch A-NOT-B (the DataSketches AnotB operation,
    Dasgupta et al. 2016) over two KMV kept sets: with
    theta = min(theta_A, theta_B), A's kept hashes below theta are a
    uniform sample of A AND B's kept set records EVERY B-hash below
    theta, so membership tests against it are exact there —

        est_|A\\B| = |{h in A_kept : h < theta, h not in B_kept}| . 2^32 / theta

    (and symmetrically for B\\A). Inclusion-exclusion with HLL stacks
    three estimator errors; this is ONE sampled count. Sides that never
    filled carry theta = 2^32, so two unfilled sides make both
    difference estimates EXACT set-difference counts.

    Output one row: (n_a, n_b, theta_h, n_a_only, n_b_only,
    est_a_not_b, est_b_not_a) — integers plus two fixed-shape doubles.
    Scale: each side collapses to <= k rows before the anti-joins;
    nothing else moves (the kmv_overlap plan shape).
    """

    def kept(df: DataFrame, col: str) -> DataFrame:
        tagged = df.select(
            F.lit(0).cast("long").alias("_ts"),
            F.col(col).cast("string").alias("_item"),
        )
        return kmv_kept_rows(tagged, 1, "_item", "_ts", k)

    ka = kept(left, left_col).select("h", "rn")
    kb = kept(right, right_col).select("h", "rn")

    def side_stats(kdf: DataFrame):
        return kdf.agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(
                F.max(F.when(F.col("rn") == k, F.col("h"))),
                F.lit(KMV_RANGE).cast("bigint"),
            ).alias("theta"),
        )

    sa = side_stats(ka).select(
        F.col("n").alias("n_a"), F.col("theta").alias("theta_a")
    )
    sb = side_stats(kb).select(
        F.col("n").alias("n_b"), F.col("theta").alias("theta_b")
    )
    stats = sa.crossJoin(sb).select(
        "n_a", "n_b",
        F.least(F.col("theta_a"), F.col("theta_b")).alias("theta_h"),
    )
    a_only = (
        ka.select("h")
        .join(kb.select("h"), "h", "left_anti")
        .crossJoin(F.broadcast(stats.select("theta_h")))
        .filter(F.col("h") < F.col("theta_h"))
        .agg(F.count("*").cast("bigint").alias("n_a_only"))
    )
    b_only = (
        kb.select("h")
        .join(ka.select("h"), "h", "left_anti")
        .crossJoin(F.broadcast(stats.select("theta_h")))
        .filter(F.col("h") < F.col("theta_h"))
        .agg(F.count("*").cast("bigint").alias("n_b_only"))
    )
    out = stats.crossJoin(F.broadcast(a_only)).crossJoin(F.broadcast(b_only))
    scale = F.lit(float(KMV_RANGE)) / F.col("theta_h").cast("double")
    return out.select(
        "n_a", "n_b",
        F.col("theta_h").cast("bigint").alias("theta_h"),
        "n_a_only", "n_b_only",
        (F.col("n_a_only").cast("double") * scale).alias("est_a_not_b"),
        (F.col("n_b_only").cast("double") * scale).alias("est_b_not_a"),
    )


def presence_slot_rows(
    events: DataFrame,
    bucket_sec: int,
    slots: int,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """(key, bucket, slot) — the JVM-side front end shared by batch
    :func:`presence_rollup` and ``streaming.presence_stream`` (both
    consume IDENTICAL expressions, so stream==batch is exact)."""
    sec = F.col(ts_col).cast("long")
    slot_w = int(bucket_sec) // int(slots)
    return events.select(
        F.col(key_col).alias("key"),
        F.floor(sec / bucket_sec).cast("long").alias("bucket"),
        ((sec % bucket_sec) / F.lit(int(slot_w))).cast("int").alias("slot"),
    )


def presence_rollup(
    events: DataFrame,
    bucket_sec: int = 3600,
    slots: int = 60,
    factor: int = 4,
    key_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Presence-bitmap continuous aggregate + retention-tier merge — the
    observability store's uptime primitive (a roaring-bitmap-shaped
    answer to "WHICH sub-intervals had activity", where hll answers
    "how many distinct"): tier 1 packs each bucket's ``slots``
    sub-interval activity flags into ONE bigint mask
    (``bit_or(1 << slot)``); tier 2 merges ``factor`` fine buckets into
    a coarse mask whose bit b says "fine bucket b was non-empty" —
    derived PURELY from tier-1 output, the mergeable-sketch contract
    (tier-2 never re-reads raw events).

    Everything is integer/bitwise — bit_or is commutative and
    order-free, so there is NO rounding convention anywhere and the
    hash gate compares raw bigints.

    Scale: tier 1 is one combinable (key, bucket) groupBy with
    map-side partial bit_or; tier 2 is a second groupBy over
    tier-1-bounded rows whose key extends the same hash prefix.

    Output: (key, tier ∈ {1, 2}, bucket, mask, n_active).
    """
    if slots > 63 or factor > 63:
        raise ValueError("presence_rollup: mask bits must fit a bigint")
    t1 = (
        presence_slot_rows(events, bucket_sec, slots, key_col, ts_col)
        .select(
            "key",
            "bucket",
            F.expr("shiftleft(cast(1 as bigint), slot)").alias("bit"),
        )
        .groupBy("key", "bucket")
        .agg(F.bit_or("bit").cast("bigint").alias("mask"))
    )
    t2 = (
        t1.select(
            "key",
            F.floor(F.col("bucket") / factor).cast("long").alias("cb"),
            (F.col("bucket") % factor).cast("int").alias("fb"),
        )
        .select(
            "key", F.col("cb").alias("bucket"),
            F.expr("shiftleft(cast(1 as bigint), fb)").alias("bit"),
        )
        .groupBy("key", "bucket")
        .agg(F.bit_or("bit").cast("bigint").alias("mask"))
    )
    out1 = t1.select(
        "key", F.lit(1).cast("int").alias("tier"), "bucket", "mask",
        F.bit_count("mask").cast("int").alias("n_active"),
    )
    out2 = t2.select(
        "key", F.lit(2).cast("int").alias("tier"), "bucket", "mask",
        F.bit_count("mask").cast("int").alias("n_active"),
    )
    return out1.unionByName(out2)


def hdr_accuracy_audit(
    events: DataFrame,
    bucket_sec: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "sec",
    value_col: str = "value",
) -> DataFrame:
    """Sketch-accuracy audit for the HDR quantile sketch: the sketch's
    p50/p90/p99 estimates vs the EXACT nearest-rank centi-unit
    percentiles, with per-quantile relative error — the
    "measure, don't model" evidence for the tiered quantile store (HDR
    guarantees bounded RELATIVE value error by construction; this makes
    the realized error a gated number instead of a cited one).

    Exactness: exact percentiles are centi-unit BIGINTs at the same
    integer ranks the sketch reader uses ((n+1) div 2, …); estimates
    come from the identical hdr_quantiles chain; each relative error is
    a fixed-shape expression |est − exact| / |exact| over those — no
    accumulation, no rounding convention.

    Scale contract: exact percentiles need the bucket's raw values in a
    task (the rollup_percentiles caveat) — the audit runs on the
    bucket grid, the sketch runs everywhere.

    Output: (key, bucket, n, p50_c, p50_est, rel50, p90_c, p90_est,
    rel90, p99_c, p99_est, rel99).
    """
    from pyspark.sql.window import Window

    est = hdr_quantiles(events, bucket_sec, key_col, ts_col, value_col)
    rows = events.select(
        F.col(key_col).alias("key"),
        F.floor(F.col(ts_col).cast("long") / bucket_sec).cast("long").alias("bucket"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("cu"),
    )
    w = Window.partitionBy("key", "bucket").orderBy("cu")
    wall = Window.partitionBy("key", "bucket")
    r = rows.select(
        "key",
        "bucket",
        "cu",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("nn"),
    )
    exact = r.groupBy("key", "bucket").agg(
        F.min(F.when(F.col("rn") == F.expr("(nn + 1) div 2"), F.col("cu")))
        .cast("bigint")
        .alias("p50_c"),
        F.min(F.when(F.col("rn") == F.expr("(nn * 9 + 9) div 10"), F.col("cu")))
        .cast("bigint")
        .alias("p90_c"),
        F.min(F.when(F.col("rn") == F.expr("(nn * 99 + 99) div 100"), F.col("cu")))
        .cast("bigint")
        .alias("p99_c"),
    )

    def rel(est_col: str, exact_col: str):
        ev = F.col(exact_col).cast("double") / F.lit(100.0)
        return (
            F.abs(F.col(est_col) - ev) / F.nullif(F.abs(ev), F.lit(0.0))
            + F.lit(0.0)
        )

    return (
        est.join(exact, ["key", "bucket"])
        .select(
            "key",
            "bucket",
            "n",
            "p50_c",
            "p50_est",
            rel("p50_est", "p50_c").alias("rel50"),
            "p90_c",
            "p90_est",
            rel("p90_est", "p90_c").alias("rel90"),
            "p99_c",
            "p99_est",
            rel("p99_est", "p99_c").alias("rel99"),
        )
    )
