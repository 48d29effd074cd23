from .dedup import (
    connected_components,
    dedup_groups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from .matrix_profile import matrix_profile, matrix_profile_join
from .multimodal import extract_features, frame_sample
from .rollup import (
    arc_count_cac,
    gap_fill,
    retention_expire,
    rollup_rollup,
    rollup_tier,
    rollup_tier_nested,
)
from .series import events_to_long, long_to_nested, nested_to_long, salted_repartition
from .similarity import cosine_topk, lsh_bucket_topk
from .text import (
    decontaminate,
    doc_fingerprint,
    lang_scores,
    quality_features,
    quality_score,
    repetition_stats,
    token_count,
)

__all__ = [
    "connected_components",
    "decontaminate",
    "dedup_groups",
    "repetition_stats",
    "arc_count_cac",
    "cosine_topk",
    "doc_fingerprint",
    "events_to_long",
    "exact_dedup",
    "extract_features",
    "frame_sample",
    "gap_fill",
    "lang_scores",
    "long_to_nested",
    "lsh_bucket_topk",
    "matrix_profile",
    "matrix_profile_join",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "nested_to_long",
    "ngram_jaccard_pairs",
    "quality_features",
    "quality_score",
    "retention_expire",
    "rollup_rollup",
    "rollup_tier",
    "rollup_tier_nested",
    "salted_repartition",
    "simhash64",
    "token_count",
]
