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


def doc_fingerprint(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: minimum md5-derived hash over word
    n-gram shingles (a 1-hash MinHash — cheap near-dup blocking key)."""
    from .dedup import _h64, word_shingles

    sh = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    return sh.groupBy("doc_id").agg(F.min(_h64(F.col("shingle"), 0)).alias("fingerprint"))
