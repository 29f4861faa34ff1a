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
        duckdb_typeof_name,
        gamma_fn,
        jaro_similarity,
        jaro_winkler_similarity,
        lgamma_fn,
        nextafter,
        nfc_normalize,
        strip_accents_udf,
    )

    spark.udf.register("jaro_winkler_similarity", jaro_winkler_similarity)
    spark.udf.register("jaro_similarity", jaro_similarity)
    spark.udf.register("damerau_levenshtein", damerau_levenshtein)
    spark.udf.register("nfc_normalize", nfc_normalize)
    spark.udf.register("strip_accents", strip_accents_udf)
    spark.udf.register("nextafter", nextafter)
    spark.udf.register("gamma", gamma_fn)
    spark.udf.register("lgamma", lgamma_fn)
    spark.udf.register("duckdb_typeof_name", duckdb_typeof_name)
    from duckdb_parachute_spark.functions.jsonfns import register_json_udfs

    register_json_udfs(spark)


def register_udtfs(spark) -> None:
    """Register Python UDTFs (SURVEY §2.2 PhysicalTableInOutFunction /
    §2.11 UDTF surface — the reference's table-in-out functions,
    physical_tableinout_function.cpp). Spark 3.5+ Python UDTFs run
    row-at-a-time through Python: right for low-volume lateral expansion;
    for corpus-scale transforms use mapInPandas (Arrow-batched) instead."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string")
    class TokenizePositions:
        """One row per whitespace token with its 1-based position."""

        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split(" ")):
                yield i + 1, t

    spark.udtf.register("tokenize_positions", TokenizePositions)
