"""Similarity-search workload queries (extension goal, SURVEY M5).

Vector math mirrors the reference's list functions
(extension/core_functions/scalar/list/functions.json list_cosine_similarity /
list_inner_product / list_distance); both engines accumulate in double in the
same element order, so rounded values hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.functions.vector import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
)
from duckdb_parachute_spark.workload import query


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
    LIMIT 10
    """,
)
def sim_topk_bruteforce(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0: scan + TakeOrdered —
    the exact baseline every ANN variant is property-tested against."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.where(F.col("vec_id") == 0).select("embedding").head()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    sim = array_cosine_similarity(F.col("embedding"), q)
    return (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("__s"))
        .orderBy(F.desc("__s"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("__s", 6).alias("cosine"))
    )


@query(
    "sim_vector_ops",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS dot,
           round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS dist,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 40
    """,
)
def sim_vector_ops(spark, sf_dir):
    """Vector function parity: inner product / euclidean distance / cosine on
    adjacent-id pairs (reference list_* functions)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1")).where(F.col("id1") < 40)
    b = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    return a.join(b, b.id2 == a.id1 + 1).select(
        "id1",
        "id2",
        F.round(array_inner_product(F.col("v1"), F.col("v2")), 6).alias("dot"),
        F.round(array_distance(F.col("v1"), F.col("v2")), 6).alias("dist"),
        F.round(array_cosine_similarity(F.col("v1"), F.col("v2")), 6).alias("cosine"),
    )


@query(
    "sim_centroid_per_label",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(list_inner_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))), 6) AS avg_sq_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_centroid_per_label(spark, sf_dir):
    """Per-label vector statistics (IVF-style cluster summary: the reduce
    stage of centroid maintenance)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = array_inner_product(F.col("embedding"), F.col("embedding"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(sq), 6).alias("avg_sq_norm"),
    )


@query("sim_lsh_topk", oracle=None)
def sim_lsh_topk(spark, sf_dir):
    """Sign-LSH approximate top-k for vec_id=0 (rows-only check; recall vs
    brute force is asserted in tests/test_similarity.py)."""
    from duckdb_parachute_spark.similarity import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    return lsh_topk(e.where(F.col("vec_id") != 0), qvec, 10, num_planes=4)


@query("sim_ivf_topk", oracle=None)
def sim_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (extension goal, the scale path beside LSH):
    distributed Lloyd's k-means coarse quantizer + nprobe-list exact rerank
    (similarity/__init__.py ivf_build_centroids / ivf_topk). Iterative
    training is not SQL-expressible → rows-only driver check; unit tests
    bound recall ≥ 0.6 vs brute force (tests/test_operators.py)."""
    from duckdb_parachute_spark.similarity import ivf_build_centroids, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where(F.col("vec_id") == 7).head().embedding]
    cents = ivf_build_centroids(e, n_centroids=8, iters=2)
    return ivf_topk(e, cents, qv, 10, nprobe=3)
