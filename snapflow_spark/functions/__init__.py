from snapflow_spark.functions.text import (
    lang_id_expr,
    quality_score_expr,
    simhash_udf,
    token_count_udf,
    tokens_expr,
)
from snapflow_spark.functions.vectors import cosine_similarity, l2_norm

__all__ = [
    "token_count_udf",
    "tokens_expr",
    "lang_id_expr",
    "quality_score_expr",
    "simhash_udf",
    "cosine_similarity",
    "l2_norm",
]
