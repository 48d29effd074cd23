"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, heuristic language ID, document fingerprinting.

Everything is built-in Spark SQL expressions (codegen'd) with exact DuckDB
oracle equivalents — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tiny marker-word lists per language for the n-gram/stopword heuristic —
#: deliberately small and deterministic (this is a scoring operator, not a
#: model); extendable per deployment.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _words(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_words(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish token count: regex word-pieces — letter runs, digit runs,
    single non-space punctuation (an upper bound on BPE merges)."""
    return F.size(
        F.regexp_extract_all(F.lower(text_col), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1)
    )


def quality_features(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features: length, token count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio — the standard
    cheap quality-filter signals."""
    t = F.col(text_col)
    words = _words(t)
    n_tokens = F.size(words)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"]", ""))
    upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace(t, r"\s", "")) / F.greatest(n_tokens, F.lit(1))).alias(
            "mean_word_len"
        ),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def soundex_code(col: Column) -> Column:
    """American Soundex phonetic code (Russell/Odell 1918; the
    record-linkage BLOCKING key predating every minhash) — simplified
    variant treating h/w as vowels (the h/w same-code bridge rule is
    deliberately out of scope, documented), which keeps the whole
    algorithm a chain of translate/regexp ops with identical
    Java-regex/RE2 semantics (run collapsing is per-digit ``d{2,}``
    replaces — RE2 has no backreferences).

    Steps: strip non-alpha, map every letter through the class table
    (vowels+h/w/y → 0), collapse adjacent equal codes (covers the
    second-letter-same-class drop), drop the first position and all
    zeros, emit first letter + first three digits zero-padded. NULL
    for strings with no letters.
    """
    nm = F.regexp_replace(F.lower(col), "[^a-z]", "")
    codes = F.translate(
        nm, "abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"
    )
    collapsed = codes
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, d + "{2,}", d)
    tail = F.regexp_replace(F.substring(collapsed, 2, 1_000_000), "0", "")
    return F.when(
        F.length(nm) > 0,
        F.concat(
            F.upper(F.substring(nm, 1, 1)),
            F.rpad(F.substring(tail, 1, 3), 3, "0"),
        ),
    )


def rake_word_scores(
    documents: DataFrame,
    text_col: str = "text",
    min_phrase_len: int = 1,
) -> DataFrame:
    """RAKE keyword scoring (Rose, Engel, Cramer & Cowley 2010 — Rapid
    Automatic Keyword Extraction): candidate phrases are maximal runs
    of content words between STOPWORD/non-alpha delimiters; each
    word's ``freq`` counts its occurrences in phrases, ``degree`` sums
    the lengths of the phrases containing it (co-occurrence incl.
    self), and the RAKE score is ``degree/freq`` — words that appear
    inside LONG multi-word phrases outrank equally-frequent words that
    stand alone.

    Per-WORD emission (corpus level): freq and degree are exact
    integers; the score is ONE division (bit-stable). Phrase-sum
    scores are deliberately not emitted — they would be unordered
    float sums (the mi_contingency argument).

    Phrase derivation is relational and total-ordered: posexplode the
    word array, mark delimiters (stopword OR non-``[a-z]+`` token),
    phrase_id = running delimiter count per doc (the sessionize
    cumsum), then one (doc, phrase) groupBy for lengths and one word
    groupBy for the totals. One doc-keyed exchange + two combinable
    groupBys.
    """
    words = _words(F.col(text_col))
    toks = documents.select(
        F.col("doc_id").alias("doc_id"),
        F.posexplode(words).alias("pos", "w"),
    )
    is_delim = (~F.col("w").rlike(r"^[a-z]+$")) | F.col("w").isin(*STOPWORDS)
    from pyspark.sql.window import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    marked = toks.withColumn("d", is_delim.cast("int")).withColumn(
        "phrase_id",
        F.sum("d").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    content = marked.filter(F.col("d") == 0)
    plen = content.groupBy("doc_id", "phrase_id").agg(
        F.count("*").cast("bigint").alias("plen")
    ).filter(F.col("plen") >= int(min_phrase_len))
    occ = content.join(plen, ["doc_id", "phrase_id"])
    agg = occ.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    score = F.col("degree").cast("double") / F.col("freq").cast("double")
    return agg.select(
        F.col("w").alias("word"), "freq", "degree",
        (score + F.lit(0.0)).alias("score"),
    )


def tokenizer_fertility(
    documents: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source tokenizer fertility audit — the "how many tokens does
    this corpus cost" planning statistic (fertility = tokens per word,
    the standard tokenizer-quality metric; bytes per token is the
    compression-ratio companion the scaling-law bookkeeping wants).

    INTEGER-exact: per source, total docs / whitespace words /
    BPE-ish regex tokens (:func:`bpe_ish_token_count`) / UTF-8 bytes,
    then milli-unit ratios by floor division of exact bigints —
    ``fertility_milli = 1000·tokens // words`` and
    ``bytes_per_token_milli = 1000·bytes // tokens`` (NULL on empty
    denominators, no float anywhere).

    Scale: per-row JVM expressions into ONE map-side-combinable
    source groupBy — a single bounded shuffle at 100 TB.
    """
    t = F.col(text_col)
    n_words = F.size(F.filter(_words(t), lambda w: F.length(w) > 0))
    per = documents.select(
        F.col(source_col).alias("source"),
        n_words.cast("bigint").alias("w"),
        bpe_ish_token_count(t).cast("bigint").alias("tk"),
        F.octet_length(t).cast("bigint").alias("by"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("n_words"),
        F.sum("tk").cast("bigint").alias("n_tokens"),
        F.sum("by").cast("bigint").alias("n_bytes"),
    )
    return agg.select(
        "source", "n_docs", "n_words", "n_tokens", "n_bytes",
        F.when(
            F.col("n_words") > 0,
            F.expr("(1000 * n_tokens) div n_words").cast("bigint"),
        ).alias("fertility_milli"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(1000 * n_bytes) div n_tokens").cast("bigint"),
        ).alias("bytes_per_token_milli"),
    )


def readability_scores(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975) — the classic readability quality signals a
    curation layer ranks prose by.

    Heuristic, deterministic counting contract (identical Java-regex /
    RE2 semantics — plain character classes only): words = non-empty
    whitespace splits, sentences = runs of ``[.!?]``, syllables =
    vowel-ish runs ``[aeiouy]+`` of the lowercased text (the standard
    vowel-group approximation; no dictionary).

    Both scores are FIXED-SHAPE float expressions over three exact
    integer counts — words/sentence and syllables/word are each ONE
    IEEE division, then literal·double products in a pinned order —
    so the doubles gate raw cross-engine (the emd convention). NULL
    when a doc has no sentence terminator or no words.

    Scale: per-row JVM expressions, ZERO exchange — map-only at 100 TB.
    """
    t = F.col(text_col)
    n_words = F.size(
        F.filter(_words(t), lambda w: F.length(w) > 0)
    ).cast("bigint")
    n_sents = F.regexp_count(t, F.lit(r"[.!?]+")).cast("bigint")
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("bigint")
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    )
    wps = F.col("n_words").cast("double") / F.nullif(
        F.col("n_sents").cast("double"), F.lit(0.0)
    )
    spw = F.col("n_syll").cast("double") / F.nullif(
        F.col("n_words").cast("double"), F.lit(0.0)
    )
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return base.select(
        "doc_id", "n_words", "n_sents", "n_syll",
        flesch.alias("flesch"), fk.alias("fk_grade"),
    )


def quality_score(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scalar quality score in [0,1]: combines the features with fixed
    weights (deterministic, documented; not learned)."""
    f = quality_features(documents, text_col, id_col)
    length_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.3)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.01, 1.0).otherwise(0.6)
    return f.select(
        "doc_id",
        ((length_ok * 0.5 + punct_ok * 0.25 + stop_ok * 0.25)).alias("quality"),
    )


def lang_scores(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: marker-word hit rate per language, argmax
    wins (ties → lexicographically *last* language, from max over
    (score, lang) struct ordering — the oracle tie-breaks identically).
    Output: (doc_id, lang_pred, lang_score)."""
    words = _words(F.col(text_col))
    n = F.greatest(F.size(words), F.lit(1))
    scores = [
        (F.size(F.filter(words, lambda w: w.isin(*marks))) / n).alias(f"s_{lang}")
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    scored = documents.select(F.col(id_col).alias("doc_id"), *scores)
    langs = sorted(LANG_MARKERS)
    structs = F.array(
        *[F.struct(F.col(f"s_{l}").alias("score"), F.lit(l).alias("lang")) for l in langs]
    )
    best = F.array_max(structs)
    return scored.select(
        "doc_id", best.getField("lang").alias("lang_pred"), best.getField("score").alias("lang_score")
    )


def _word_ngrams(words: Column, k: int) -> Column:
    """Word k-grams as array<string> (duplicates KEPT — repetition is the
    signal here, unlike dedup's distinct shingles)."""
    n = F.size(words) - (k - 1)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    re-derived): fraction of duplicate words / 2-grams / 3-grams, and the
    share of the document taken by its single most frequent word and
    2-gram. Everything is per-row higher-order expressions — zero
    shuffles, zero Python — so the operator composes with a parquet scan
    at any scale (the top-gram scan is O(k²) per row in the distinct-gram
    count, CPU-local).

    Output: (doc_id, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
    top_word_frac, top_2gram_frac). ``parallelism`` spreads the per-row
    expression CPU when the input has too few natural splits (the local
    single-row-group parquet case; keep None at warehouse scale)."""
    from .dedup import _spread

    documents = _spread(documents, parallelism)
    words = _words(F.col(text_col))
    g2 = _word_ngrams(words, 2)
    g3 = _word_ngrams(words, 3)

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0, (n - F.size(F.array_distinct(arr))) / n
        ).otherwise(F.lit(0.0))

    def top_frac(arr: Column) -> Column:
        # max multiplicity = longest run in the SORTED array — one linear
        # aggregate. (The naive transform(distinct, g -> count(filter))
        # nests lambdas, and Spark re-evaluates the full array expression
        # per element: measured 30 s for 500 docs vs 0.3 s for this.)
        n = F.size(arr)
        srt = F.array_sort(arr)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        top = F.aggregate(srt, init, step, lambda acc: acc["best"])
        return F.when(n > 0, top / n).otherwise(F.lit(0.0))

    return documents.select(
        F.col(id_col).alias("doc_id"),
        dup_frac(words).alias("dup_word_frac"),
        dup_frac(g2).alias("dup_2gram_frac"),
        dup_frac(g3).alias("dup_3gram_frac"),
        top_frac(words).alias("top_word_frac"),
        top_frac(g2).alias("top_2gram_frac"),
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (the GPT-3 13-gram
    rule, re-derived): a training doc is contaminated by a benchmark doc
    when they share >= ``min_hits`` word n-grams.

    Scale shape: the benchmark side is SMALL by construction (eval sets),
    so its distinct shingles broadcast; the training side streams through
    a broadcast-hash semi-join at scan speed — no all-pairs, no shuffle
    of the corpus. Output: (doc_id, bench_id, n_hits) for contaminated
    pairs only."""
    from .dedup import shingle_table

    # shingle_table drops the [''] padded shingle of blank docs — ONE
    # place owns that guard (the SQL oracles filter len(shingle) > 0)
    doc_sh = shingle_table(documents, text_col, id_col, n)
    bench_sh = shingle_table(benchmark, text_col, bench_id_col, n).withColumnRenamed(
        "doc_id", "bench_id"
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


#: PII patterns — deliberately simple, engine-portable regexes (Java
#: regex and RE2 agree on these constructs: classes, quantifiers, \d/\b).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[- .]\d{3}[- .]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """PII detection + redaction signals: per-doc counts of email /
    phone / IPv4 matches and the length of the text after replacing
    each match class with a ``<TYPE>`` placeholder. Counts-and-length
    output keeps the oracle exact while the redacted text itself stays
    available via :func:`pii_redact`.

    Pure per-row regex expressions (codegen'd, zero shuffle) — the scan
    is the plan. Patterns are the portable subset both Java regex and
    RE2 (DuckDB) interpret identically."""
    from .dedup import _spread

    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    return _spread(documents, parallelism).select(
        F.col(id_col).alias("doc_id"),
        *counts,
        F.length(pii_redact(t)).cast("long").alias("clean_len"),
    )


def pii_redact(text_col: Column) -> Column:
    """Replace each PII match with ``<TYPE>`` (email → ``<EMAIL>`` …),
    applied in deterministic pattern order."""
    out = text_col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def doc_fingerprint(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: minimum md5-derived hash over word
    n-gram shingles (a 1-hash MinHash — cheap near-dup blocking key)."""
    from .dedup import _h64, shingle_table

    sh = shingle_table(documents, text_col, id_col, n)
    return sh.groupBy("doc_id").agg(F.min(_h64(F.col("shingle"), 0)).alias("fingerprint"))


def hashed_ngram_buckets(
    text_col: Column, n_buckets: int, ngram: int = 2
) -> Column:
    """Hashed bag-of-ngrams features: word unigrams + bigrams mapped to
    ``md5 % n_buckets`` (duplicates kept — counts are the feature)."""
    words = _words(text_col)
    grams = F.concat(words, _word_ngrams(words, ngram))
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), g)), 1, 7), 16, 10)
            .cast("long")
            % n_buckets
        ).cast("int"),
    )


def dsir_weights(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    ngram: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
) -> DataFrame:
    """Importance weights for domain-targeted data selection (the DSIR
    recipe — hashed-n-gram bag features, add-one-smoothed target vs raw
    unigram models, per-doc log importance ratio — re-derived
    relationally): ``logw(d) = Σ_b c_d(b)·(ln p_t(b) − ln p_r(b))``
    with ``p(b) = (c(b)+1)/(N+B)``. High-weight docs look like the
    target domain; resample/top-k by weight to build a targeted mix.

    Scale shape: featurization is per-row expressions; both LMs are one
    map-side-combinable groupBy(bucket) — bucket-bounded (B rows), so
    the model join BROADCASTS; the per-doc weight is one groupBy(doc)
    over (doc, bucket) counts. The corpus is scanned once for features,
    once for weights (the feature table is pinned).

    Output: (doc_id, logw). Rank on ROUNDED logw when a deterministic
    cross-engine order is needed (float sums differ at ~1e-12 by
    summation order)."""
    from .cache import pin

    feats = pin(
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(hashed_ngram_buckets(F.col(text_col), n_buckets, ngram)).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    tfeat = target.select(
        F.explode(
            hashed_ngram_buckets(F.col(target_text_col or text_col), n_buckets, ngram)
        ).alias("bucket")
    ).groupBy("bucket").agg(F.count("*").alias("ct"))
    rfeat = feats.groupBy("bucket").agg(F.sum("c").alias("cr"))
    # totals reaggregate from the bucket counts — no second featurization
    # scan of either corpus
    nt = tfeat.agg(F.sum("ct").cast("double").alias("nt"))
    nr = feats.agg(F.sum("c").cast("double").alias("nr"))
    buckets = (
        rfeat.join(tfeat, "bucket", "full_outer")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("nt") + n_buckets))
                - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1) / (F.col("nr") + n_buckets))
            ).alias("llr"),
        )
    )
    return (
        feats.join(F.broadcast(buckets), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("llr")).alias("logw"))
    )


#: neutral placeholder blocklist for the C4-style document gate — real
#: deployments substitute their own list (the rule shape is what matters).
C4_BAD_WORDS: tuple[str, ...] = ("badword", "blockedterm")


def c4_line_filters(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    require_terminal_punct: bool = True,
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
) -> DataFrame:
    """C4-style heuristic line + document cleaning (Raffel et al. 2020,
    arXiv:1910.10683 §2.2 — the classic web-corpus curation recipe).

    Line rules (a line survives iff ALL hold):
      * at least ``min_words_per_line`` whitespace words,
      * ends in a terminal punctuation mark (``. ! ? "``) when
        ``require_terminal_punct``,
      * does not mention ``javascript`` (case-insensitive).
    Document rules (on the CLEANED text):
      * at least ``min_kept_lines`` surviving lines,
      * no ``lorem ipsum`` (case-insensitive), no ``{`` (code page),
      * no word from ``bad_words`` (word-boundary match).

    Zero-shuffle: one per-row projection — lines never leave their row
    (array filter, not explode), so the operator adds no Exchange at any
    scale. The lambda eval is interpreted (no codegen), but the per-line
    work is regex matching, which dominates either way.

    Returns ``id_col, n_lines, n_kept, keep, clean_text``.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _line_ok(line: Column) -> Column:
        ok = F.size(F.split(F.trim(line), r"\s+")) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & F.trim(line).rlike(r'[.!?"]$')
        return ok & ~F.lower(line).contains("javascript")

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(kept, "\n")
    keep = (
        (F.size(kept) >= min_kept_lines)
        & ~F.lower(clean).contains("lorem ipsum")
        & ~clean.contains("{")
    )
    if bad_words:
        keep = keep & ~F.lower(clean).rlike(r"\b(" + "|".join(bad_words) + r")\b")
    return documents.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        keep.alias("keep"),
        clean.alias("clean_text"),
    )


#: the Gopher "stop word" presence list (Rae et al. 2021 appendix A1.1) —
#: a document must contain at least two of these to survive.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filters(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-rules document quality filtering (Rae et al. 2021,
    arXiv:2112.11446 appendix A1.1 — the MassiveText curation recipe,
    the other classic web-corpus filter next to C4's).

    A document survives iff ALL hold (every sub-decision exposed as an
    integer column so the gate hashes exactly, no float ratios):
      * word count in ``[min_words, max_words]``,
      * mean word length in [3, 10]    → ``3·n_words ≤ Σlen ≤ 10·n_words``,
      * symbol-to-word ratio < 0.1 (``#`` chars + ``...`` runs)
                                       → ``10·n_sym < n_words``,
      * < 90% of lines start with a ``- `` bullet → ``10·n_bullet < 9·n_lines``,
      * < 30% of lines end with ``...``           → ``10·n_ellipsis < 3·n_lines``,
      * ≥ 80% of words contain an alphabetic char → ``5·n_alpha ≥ 4·n_words``,
      * ≥ ``min_stopwords`` DISTINCT Gopher stop words present.

    Zero-shuffle: one per-row projection, lines/words never leave their
    row (array filter + aggregate, not explode) — adds no Exchange at any
    scale; at 100 TB this is a map-only scan. The lambda eval is
    interpreted (no codegen), dominated by the per-word regex either way.

    Returns ``id_col, n_words, n_chars, n_alpha, n_stop, n_sym, n_lines,
    n_bullet, n_ellipsis, keep`` (all bigint except ``keep`` int).
    """
    t = F.col(text_col)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    lines = F.split(t, "\n")
    n_words = F.size(words).cast("bigint")
    n_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("bigint")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    ).cast("bigint")
    hash_cnt = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ell_cnt = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_sym = (hash_cnt + ell_cnt).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("bigint")
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("bigint")

    d = documents.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"),
        n_sym.alias("n_sym"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet"),
        n_ellipsis.alias("n_ellipsis"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.lit(3) * F.col("n_words") <= F.col("n_chars"))
        & (F.col("n_chars") <= F.lit(10) * F.col("n_words"))
        & (F.lit(10) * F.col("n_sym") < F.col("n_words"))
        & (F.lit(10) * F.col("n_bullet") < F.lit(9) * F.col("n_lines"))
        & (F.lit(10) * F.col("n_ellipsis") < F.lit(3) * F.col("n_lines"))
        & (F.lit(5) * F.col("n_alpha") >= F.lit(4) * F.col("n_words"))
        & (F.col("n_stop") >= min_stopwords)
    )
    return d.withColumn("keep", keep.cast("int"))


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents per query (Robertson &
    Zaragoza 2009, the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf form).

    Scale shape: the query set is small by contract and is BROADCAST
    (never shuffles the corpus on anything but its own term groupBy);
    document length is carried through the term aggregation as a grouping
    key (functionally dependent on the doc — no second corpus scan or
    doc-keyed join); per-term document frequency comes from a window over
    the already-restricted (doc × query-term) rows, so the df aggregation
    is bounded by |docs containing a query term|, never the full vocab.

    Ranks on the r4-ROUNDED score with doc-id tie-break so knife-edge fp
    sums cannot flip picks across engines (dsir convention).

    Returns ``query_id, doc_id, bm25, rank`` (rank 1..k per query).
    """
    words = _words(F.col(text_col))
    toks = documents.select(
        F.col(id_col),
        F.size(words).alias("dl"),
        F.explode(words).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))

    qwords = _words(F.col(query_text_col))
    qterms = (
        queries.select(F.col(query_id_col).alias("query_id"), F.explode(qwords).alias("term"))
        .filter(F.length("term") > 0)
        .distinct()
    )
    stats = documents.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum(F.size(words)) / F.count("*")).alias("avgdl"),
    )

    from pyspark.sql import Window

    g = tf.join(F.broadcast(qterms.select("term").distinct()), "term").withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        g.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.sum(contrib).alias("score"))
    )
    ranked = scored.select(
        "query_id",
        id_col,
        F.round("score", 4).alias("bm25"),
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.desc(F.round("score", 4)), F.asc(id_col)
            )
        )
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= k)


def tfidf_topk_terms(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document (the smoothed sklearn
    form: ``idf = ln((N+1)/(df+1)) + 1``, score = tf·idf) — the classic
    per-doc keyword extraction that sits between raw ``token_counts``
    and query-side ``bm25_topk``.

    Ranking determinism: rank on the r6-ROUNDED score with term
    tie-break (the dsir/bm25 convention) — ln() may differ 1 ulp across
    engines, so the raw product is not a stable sort key.

    Scale shape: tf is one (doc, term) combinable groupBy; df is one
    vocab-bounded distinct-doc groupBy; the doc count is a broadcast
    scalar; the tf⇄df join is term-keyed (AQE decides broadcast vs
    shuffle, the lm_perplexity convention); the per-doc top-k is a rank
    window with WindowGroupLimit partial pushdown, so the final shuffle
    moves O(docs·k), not every (doc, term) row.

    Output (doc_id, term, tf, df, score, rank), rank 1..k per doc.
    """
    from pyspark.sql.window import Window

    words = _words(F.col(text_col))
    toks = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("bigint").alias("tf"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    n_docs = documents.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score",
                F.col("rank").cast("bigint").alias("rank"))
    )


def hashed_bow_vectors(
    documents: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009)
    bag-of-words vectors: each word hashes to a bucket ``h % dim`` with
    sign ``±1`` from the next hash bit, and the doc's component is the
    SIGNED count sum — the collision-unbiased sparse vectorizer that
    needs no vocabulary table at all (the property that matters at
    100 TB: zero model state, zero extra shuffle beyond one combinable
    (doc, dim) groupBy).

    Output is LONG form ``(doc_id, dim, value)`` with INTEGER values —
    exact on both engines — ready to feed ``random_projection`` / LSH /
    IVF as the dense-ification front end (docs with no words emit no
    rows; downstream treats absent components as 0).

    One md5 digest per word: bucket = ``h % dim``, sign from the next
    bit ``(h div dim) % 2`` (0 → +1, 1 → −1).
    """
    from .dedup import _h64

    words = _words(F.col(text_col))
    toks = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("term")
    ).filter(F.length("term") > 0)
    hashed = toks.select("doc_id", _h64(F.col("term"), 8).alias("h"))
    signed = hashed.select(
        "doc_id",
        (F.col("h") % dim).cast("int").alias("dim"),
        (F.lit(1) - F.lit(2) * (F.expr(f"(h div {dim}) % 2").cast("int")))
        .cast("bigint")
        .alias("sign"),
    )
    return (
        signed.groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("value"))
        .select("doc_id", "dim", F.col("value").cast("bigint").alias("value"))
    )


def fuzzy_vocab_pairs(
    documents: DataFrame,
    max_word_len: int = 24,
    max_variant_freq: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Edit-distance-1 vocabulary pairs via the SymSpell symmetric-
    delete trick (Garbe): every word emits itself plus its |word|
    single-deletion variants; two words with Levenshtein distance ≤ 1
    MUST share a variant key (substitution → common deletion at the
    differing position; insertion/deletion → one side's deletion equals
    the other word), so candidates come from a variant EQUI-join —
    vocab-bounded, never |vocab|² — and each candidate is verified with
    the built-in ``levenshtein``. The typo-clustering primitive of a
    corpus-curation layer (fold "recieve" into "receive" by count).

    Contract: ASCII ``[a-z0-9]+`` words of length 3..``max_word_len``
    only — identical per-char semantics on both engines (Spark's
    levenshtein counts UTF-16 units, DuckDB's counts codepoints; they
    agree on ASCII), and short/huge tokens are typo-join noise anyway.
    ``max_variant_freq`` is the hot-key cap knob (the simhash
    ``max_band_freq`` convention): variant keys shared by more VOCAB
    ENTRIES (distinct words — not documents; the vocab table has one
    row per word) than the cap are dropped from candidate generation
    (recall trade, documented; None = exact).

    Output (word_a, word_b, cnt_a, cnt_b, dist) with word_a < word_b.

    Scale: vocab = one combinable groupBy; the variant explode is
    ≤ len+1 rows per vocab entry; the candidate join shuffles
    (vocab × avg_len) keyed rows. Corpus size only enters through the
    vocab counts.
    """
    words = _words(F.col(text_col))
    vocab = (
        documents.select(F.explode(words).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .filter(
            (F.length("word") >= 3) & (F.length("word") <= max_word_len)
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    variants = vocab.select(
        "word",
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(0, length(word)), i -> "
                "CASE WHEN i = 0 THEN word "
                "ELSE concat(substring(word, 1, i - 1), substring(word, i + 1)) "
                "END)"
            )
        ).alias("variant"),
    )
    if max_variant_freq is not None:
        from pyspark.sql.window import Window

        # The cap counts DISTINCT vocab entries per variant key, so dedup
        # (word, variant) first — words with repeated letters emit the
        # same deletion variant once per occurrence ("aaa" -> "aa" x3)
        # and a raw row count would over-prune. Uncapped path skips the
        # dedup exchange; the trailing .distinct() already absorbs the
        # duplicate candidate pairs.
        wf = Window.partitionBy("variant")
        variants = (
            variants.dropDuplicates(["word", "variant"])
            .withColumn("_f", F.count("*").over(wf))
            .filter(F.col("_f") <= max_variant_freq)
            .drop("_f")
        )
    a = variants.select(
        F.col("word").alias("word_a"), F.col("cnt").alias("cnt_a"), "variant"
    )
    b = variants.select(
        F.col("word").alias("word_b"), F.col("cnt").alias("cnt_b"), "variant"
    )
    return (
        a.join(b, "variant")
        .filter(F.col("word_a") < F.col("word_b"))
        .select(
            "word_a", "word_b", "cnt_a", "cnt_b",
            F.levenshtein("word_a", "word_b").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .distinct()
    )


def rrf_hybrid_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k_leg: int = 50,
    rrf_k: int = 60,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009): fuse a LEXICAL ranking (BM25, :func:`bm25_topk`)
    with a VECTOR ranking (cosine over :func:`hashed_bow_vectors`
    feature-hashed embeddings) as

        rrf(d) = 1/(rrf_k + rank_bm25(d)) + 1/(rrf_k + rank_cos(d))

    with a missing leg contributing 0 — the standard two-retriever
    hybrid-search shape (what OpenSearch/Vespa call "hybrid query"),
    composed entirely from two already-oracle-gated legs.

    Determinism: BM25 ranks on the r4-rounded score with doc-id
    tie-break (its own contract); the cosine leg ranks on
    ``dot / sqrt(norm_q · norm_d)`` where dot and both norms are EXACT
    integers (signed hashed-BOW counts), so the ranking double is one
    IEEE ÷/sqrt over exact integers — bit-identical cross-engine; rrf
    itself is a fixed-order sum of two exact reciprocals of integers.
    Final rank breaks rrf ties on doc_id.

    Scale: the query set is small by contract (broadcast both legs);
    the cosine leg is one combinable (doc, dim) groupBy + a dim-keyed
    join against ≤ |queries|·dim vector rows; fusion is a per-query
    outer join of two ≤ k_leg lists. The corpus shuffles once per leg.

    Returns ``query_id, doc_id, rank_bm25, rank_cos, rrf, rank``
    (rank 1..k per query; leg ranks NULL where the leg missed the doc).
    """
    from pyspark.sql.window import Window

    lex = bm25_topk(
        documents,
        queries,
        k=k_leg,
        text_col=text_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col("doc_id"),
        F.col("rank").alias("rank_bm25"),
    )

    dvec = hashed_bow_vectors(documents, dim=dim, text_col=text_col, id_col=id_col)
    qvec = hashed_bow_vectors(
        queries.select(
            F.col(query_id_col).alias("doc_id"),
            F.col(query_text_col).alias("text"),
        ),
        dim=dim,
    ).withColumnRenamed("doc_id", "query_id")
    dnorm = dvec.groupBy("doc_id").agg(
        F.sum(F.col("value") * F.col("value")).cast("bigint").alias("norm_d")
    )
    qnorm = qvec.groupBy("query_id").agg(
        F.sum(F.col("value") * F.col("value")).cast("bigint").alias("norm_q")
    )
    dots = (
        dvec.join(
            F.broadcast(qvec.withColumnRenamed("value", "qvalue")), "dim"
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("value") * F.col("qvalue")).cast("bigint").alias("dot"))
    )
    cos = (
        dots.join(dnorm, "doc_id")
        .join(F.broadcast(qnorm), "query_id")
        .filter((F.col("norm_d") > 0) & (F.col("norm_q") > 0))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("norm_q") * F.col("norm_d")).cast("double"))
            ).alias("cosine"),
        )
    )
    wcos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    )
    vec = (
        cos.withColumn("rank_cos", F.row_number().over(wcos))
        .filter(F.col("rank_cos") <= k_leg)
        .select("query_id", "doc_id", "rank_cos")
    )

    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "rank_bm25",
        "rank_cos",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_bm25")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_cos")).cast("double"),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("rank_bm25").cast("bigint").alias("rank_bm25"),
            F.col("rank_cos").cast("bigint").alias("rank_cos"),
            "rrf",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def phrase_search(
    documents: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a positional inverted index.

    ``phrases``: small ``(query_id, phrase_text)`` table. A phrase of k
    words matches at document position ``a`` when word ``a+s`` equals
    phrase slot ``s`` for every ``s < k`` (consecutive, ordered — the
    classic positional-postings AND; Manning et al., IIR §2.4.2).

    Physical shape: the corpus explodes ONCE into positional postings
    ``(doc_id, pos, term)``; the phrase table explodes into ``(query_id,
    slot, term)`` and is BROADCAST, so the only corpus-wide movement is
    one exchange of the term-matched postings keyed (query_id, doc_id,
    anchor) — matched-term volume, not corpus volume, and the term
    equi-join prunes every posting whose term appears in no phrase.
    Overlapping matches count separately (anchors differ); repeated
    phrase terms are handled because each (posting, slot) pair
    contributes one distinct row to the anchor count.

    Returns one row per (query_id, matching doc): ``n_matches``,
    ``first_pos`` (smallest anchor), and ``rank`` by (n_matches DESC,
    doc_id) per query.
    """
    from pyspark.sql.window import Window

    words = _words(F.col(text_col))
    toks = documents.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.posexplode(words).alias("pos", "term"),
    ).filter(F.length("term") > 0)

    pw = _words(F.col("phrase_text"))
    slots = phrases.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.posexplode(pw).alias("slot", "term"),
    ).filter(F.length("term") > 0)
    slots = slots.join(
        slots.groupBy("query_id").agg(F.count("*").alias("k")), "query_id"
    )

    hits = (
        toks.join(F.broadcast(slots), "term")
        .select(
            "query_id",
            "doc_id",
            (F.col("pos") - F.col("slot")).alias("anchor"),
            "k",
        )
        .filter(F.col("anchor") >= 0)
    )
    occurrences = (
        hits.groupBy("query_id", "doc_id", "anchor")
        .agg(F.count("*").alias("n_slots"), F.max("k").alias("k"))
        .filter(F.col("n_slots") == F.col("k"))
    )
    per_doc = occurrences.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_matches"), F.min("anchor").alias("first_pos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_matches"), F.asc("doc_id")
    )
    return per_doc.select(
        "query_id",
        "doc_id",
        F.col("n_matches").cast("bigint").alias("n_matches"),
        F.col("first_pos").cast("bigint").alias("first_pos"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )
