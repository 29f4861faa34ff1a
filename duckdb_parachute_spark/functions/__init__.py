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


def register_udfs(spark) -> None:
    """Register the Python-backed gap functions for SQL use (SURVEY §2.11 —
    the reference's con.create_function surface, pyconnection.cpp:136):
    after this, spark.sql / sqlx.sql can call them by name."""
    from duckdb_parachute_spark.functions.metrics import (
        damerau_levenshtein,
        jaro_winkler_similarity,
    )

    spark.udf.register("jaro_winkler_similarity", jaro_winkler_similarity)
    spark.udf.register("damerau_levenshtein", damerau_levenshtein)
