from my_feast_spark.functions.scalar import hour_bucket, priority_collapse
from my_feast_spark.functions.text import (
    doc_fingerprint,
    lang_scores,
    quality_features,
    tokens,
)

__all__ = [
    "priority_collapse",
    "hour_bucket",
    "tokens",
    "doc_fingerprint",
    "quality_features",
    "lang_scores",
]
