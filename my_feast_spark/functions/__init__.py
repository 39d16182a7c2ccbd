from my_feast_spark.functions.scalar import (
    floor_round,
    hour_bucket,
    priority_collapse,
)
from my_feast_spark.functions.urls import (
    url_canonicalize,
    load_public_suffix_list,
    registered_domain,
    url_host,
)
from my_feast_spark.functions.text import (
    chunk_count,
    chunk_token_array,
    chunk_tokens,
    doc_fingerprint,
    normalize_text,
    lang_id,
    lang_scores,
    let,
    quality_features,
    redact_pii,
    repetition_features,
    repetition_features_arr,
    tokens,
)

__all__ = [
    "priority_collapse",
    "hour_bucket",
    "floor_round",
    "url_canonicalize",
    "url_host",
    "registered_domain",
    "load_public_suffix_list",
    "tokens",
    "let",
    "doc_fingerprint",
    "normalize_text",
    "quality_features",
    "lang_scores",
    "lang_id",
    "chunk_tokens",
    "chunk_token_array",
    "chunk_count",
    "repetition_features",
    "repetition_features_arr",
    "redact_pii",
]
