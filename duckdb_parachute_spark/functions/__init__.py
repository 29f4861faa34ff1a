from duckdb_parachute_spark.functions.vector import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
)
from duckdb_parachute_spark.functions.scalar import time_bucket
from duckdb_parachute_spark.functions.textfns import (
    ngram_shingles,
    punct_ratio,
    stopword_ratio,
    token_count,
    word_shingles,
)

__all__ = [
    "array_cosine_similarity",
    "array_distance",
    "array_inner_product",
    "time_bucket",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "word_shingles",
    "ngram_shingles",
]
