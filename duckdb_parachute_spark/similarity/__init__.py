"""Similarity search over embedding columns (extension goal, SURVEY M5).

Brute-force cosine top-k as the correctness baseline; sign-LSH bucketing as
the scale path (restricts candidate generation to matching buckets — at 100 TB
the bucket join replaces the all-pairs scan; recall is tunable via number of
hyperplanes / probe multiplicity and is property-tested against brute force).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.functions.vector import array_cosine_similarity


def brute_force_topk(
    df: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k against one query vector: a single scan + TopK
    (Catalyst plans TakeOrderedAndProject — no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = array_cosine_similarity(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def sign_lsh_bucket(vec: Column, num_planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane (sign) LSH bucket id in [0, 2^num_planes).

    Hyperplane components are pseudo-random ±1 derived from
    xxhash64(seed, plane, dim) — deterministic, no stored model, computable
    row-local at any scale; dot products run as one higher-order
    expression per plane (two denser
    formulations were measured slower in round 7: per-element hash-bit
    sharing duplicated the traversal per plane, and an array-accumulator
    single pass paid an array allocation per element — the bottleneck was
    scan parallelism, fixed in lsh_topk, not hashing)."""
    def plane_bit(p: Column) -> Column:
        signed = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, j: x.cast("double")
                * (F.pmod(F.xxhash64(F.lit(seed), p, j), F.lit(2)).cast("double") * 2 - 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(signed >= 0, F.lit(1)).otherwise(F.lit(0))

    bits = F.transform(F.sequence(F.lit(0), F.lit(num_planes - 1)), plane_bit)
    return F.aggregate(bits, F.lit(0), lambda acc, bit: acc * 2 + bit)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket with the
    query in at least one of ``num_tables`` independent tables
    (OR-amplification — the banding construction every production LSH
    deployment uses; one table has near-zero recall when neighbors are not
    dramatically closer than the bulk).

    Recall/cost dial: more tables → higher recall, larger candidate set. On
    near-uniform random embeddings the candidate fraction is inherently large
    (neighbors barely beat the bulk in cosine); on real clustered embeddings
    the same setting prunes hard. At scale, write-side: persist the per-table
    bucket ids as cluster columns so probes prune files; here computed on the
    fly — the probe is one scan whatever the table count."""
    # The bucketing expressions are the probe's cost; a small embeddings
    # parquet arrives as ONE row-group split, serializing them onto a single
    # core. Spread to cluster parallelism only when the scan is narrower
    # than the core count — at real scale file count >> cores and this is a
    # no-op (no shuffle inserted).
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores)
    qdf = df.sparkSession.createDataFrame([(query_vec,)], f"{vec_col}: array<double>")
    # ONE local job computes the query's bucket id in every table (round 7:
    # the per-table head() loop cost num_tables driver jobs — ~0.5 s of
    # scheduling floor each — and dominated the probe's wall clock).
    qb_row = qdf.select(
        *[
            sign_lsh_bucket(F.col(vec_col), num_planes, seed=7 + t).alias(f"b{t}")
            for t in range(num_tables)
        ]
    ).head()
    hit = None
    for t in range(num_tables):
        c = sign_lsh_bucket(F.col(vec_col), num_planes, seed=7 + t) == F.lit(qb_row[t])
        hit = c if hit is None else (hit | c)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = array_cosine_similarity(F.col(vec_col), q)
    return (
        df.where(hit)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def pairwise_knn(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    allow_bruteforce: bool = False,
) -> DataFrame:
    """k nearest neighbors for every vector (within optional buckets).

    Without a bucket column this is the O(n²) brute-force building block, so
    the unbucketed form must be requested explicitly with
    ``allow_bruteforce=True`` — callers at scale must provide bucketing
    (LSH/IVF partition) instead of silently cross-joining the corpus."""
    if bucket_col is None and not allow_bruteforce:
        raise ValueError(
            "pairwise_knn without bucket_col is O(n²); pass a bucket_col "
            "(LSH bucket / IVF centroid) or opt in explicitly with "
            "allow_bruteforce=True on small inputs"
        )
    keys = [bucket_col] if bucket_col else []
    a = df.select(*keys, F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    b = df.select(*keys, F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    joined = (a.join(b, keys) if keys else a.crossJoin(b)).where(F.col("id1") != F.col("id2"))
    sim = array_cosine_similarity(F.col("__v1"), F.col("__v2")).alias("cosine")
    w = Window.partitionBy("id1").orderBy(F.desc("cosine"), F.col("id2"))
    return (
        joined.select("id1", "id2", sim)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_build_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: distributed Lloyd's k-means over the embedding
    column, entirely in DataFrame ops (no driver-side vector math).

    - init: the n_centroids vectors with the smallest md5(id) — deterministic,
      sample-free, engine-independent;
    - assign: broadcast centroids, argmin cosine via max_by;
    - update: element-wise mean via posexplode → groupBy(centroid, dim) →
      avg → re-assemble with array_agg sorted by dim.
    Each iteration is one broadcast join + one (rows × dims) shuffle —
    at 100 TB with dim≤1k this is the standard IVF training shape (train on a
    sample in practice; the plumbing is identical).
    Returns (centroid_id, centroid: array<double>)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), vec_d.alias("__v"))
    # Seed enumeration happens DRIVER-side: collect the ≤ n_centroids smallest
    # md5(id) rows (TakeOrderedAndProject — bounded driver metadata, the same
    # class as the pivot-value probe) and number them in Python. Round 8: this
    # replaces a WindowExec over a constant partition key — Catalyst
    # constant-folds `partitionBy(lit(0))` away, so that plan still logged
    # "No Partition Defined" warnings despite the bounded input
    # (BENCH_r07 tail, VERDICT r7 nit #1).
    seed_rows = (
        base.withColumn("__h", F.md5(F.col("__id").cast("string")))
        .orderBy("__h")
        .limit(n_centroids)
        .select("__v")
        .collect()
    )
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(i + 1, list(r["__v"])) for i, r in enumerate(seed_rows)],
        "centroid_id int, centroid array<double>",
    )
    for _ in range(iters):
        assigned = _assign_nearest(base, cents)
        cents = (
            assigned.select("centroid_id", F.posexplode("__v").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("__dm"))
            .select("centroid_id", F.transform("__dm", lambda s: s.getField("m")).alias("centroid"))
        )
    return cents


def _assign_nearest(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast centroids,
    max_by over the joined candidates — one narrow shuffle on the group)."""
    sim = array_cosine_similarity(F.col("__v"), F.col("centroid"))
    return (
        base.crossJoin(F.broadcast(cents))
        .select("__id", "__v", "centroid_id", sim.alias("__sim"))
        .groupBy("__id")
        .agg(
            F.max_by("centroid_id", F.struct("__sim", (-F.col("centroid_id")).alias("t"))).alias("centroid_id"),
            F.first("__v").alias("__v"),
        )
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, scan only the
    vectors assigned to the nprobe closest lists, exact-rerank those.

    At scale the assignment is precomputed and used as a partition/cluster
    column so the probe reads nprobe/n_centroids of the data; here it is
    derived on the fly (same plan shape, minus the file pruning)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), vec_d.alias("__v"))
    assigned = _assign_nearest(base, centroids)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r.centroid_id
        for r in centroids.select(
            "centroid_id", array_cosine_similarity(F.col("centroid"), q).alias("s")
        )
        .orderBy(F.desc("s"), "centroid_id")
        .limit(nprobe)
        .collect()
    ]
    sim = array_cosine_similarity(F.col("__v"), q)
    return (
        assigned.where(F.col("centroid_id").isin(probe_ids))
        .select(F.col("__id").alias(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


# -- persisted (file-pruning) indexes ----------------------------------------


def write_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF assignment as a PARTITION column: one parquet
    directory per inverted list. A probe filtering on centroid_id then prunes
    whole directories at planning time — it reads nprobe/n_centroids of the
    files, which is the difference between an index and a scan at 100 TB.
    (Write-side analogue of the reference's row-group zonemap skipping,
    src/storage/table/column_data.cpp:386 — made explicit as layout.)"""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), vec_d.alias("__v"))
    assigned = _assign_nearest(base, centroids).select(
        F.col("__id").alias(id_col), F.col("__v").alias(vec_col), "centroid_id"
    )
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: rank centroids by query cosine, read ONLY
    the nprobe closest lists' partitions (Catalyst partition pruning — the
    isin filter never touches the other directories), exact-rerank inside."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r.centroid_id
        for r in centroids.select(
            "centroid_id", array_cosine_similarity(F.col("centroid"), q).alias("s")
        )
        .orderBy(F.desc("s"), "centroid_id")
        .limit(nprobe)
        .collect()
    ]
    idx = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    sim = array_cosine_similarity(F.col(vec_col), q)
    return (
        idx.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def write_lsh_index(
    df: DataFrame,
    path: str,
    num_planes: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist sign-LSH bucket ids as a partition column (2^num_planes
    directories); bucket-equality probes prune to one directory per table."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(
        F.col(id_col),
        vec_d.alias(vec_col),
        sign_lsh_bucket(vec_d, num_planes, seed).alias("lsh_bucket"),
    )
    out.write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int,
    num_planes: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted LSH index: compute the query's bucket, read only
    that partition directory, exact-rerank inside it."""
    qdf = spark.createDataFrame([(list(map(float, query_vec)),)], f"{vec_col}: array<double>")
    qb = qdf.select(sign_lsh_bucket(F.col(vec_col), num_planes, seed).alias("b")).head().b
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path).where(F.col("lsh_bucket") == F.lit(int(qb)))
    sim = array_cosine_similarity(F.col(vec_col), q)
    return (
        idx.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )
