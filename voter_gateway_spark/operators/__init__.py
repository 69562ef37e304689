from voter_gateway_spark.operators import (
    dedup_ops,
    fuzzy,
    lm,
    paragraphs,
    similarity,
    text,
)

__all__ = ["dedup_ops", "fuzzy", "lm", "paragraphs", "similarity", "text"]
