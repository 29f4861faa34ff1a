"""Similarity search over embedding columns (extension goal, SURVEY M5).

Brute-force cosine top-k as the correctness baseline; sign-LSH bucketing as
the scale path (restricts candidate generation to matching buckets — at 100 TB
the bucket join replaces the all-pairs scan; recall is tunable via number of
hyperplanes / probe multiplicity and is property-tested against brute force).
"""

from __future__ import annotations

import pandas as pd  # module-scope so pandas_udf type hints resolve
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
    """Random-hyperplane (sign) LSH bucket id in [0, 2^num_planes) as a pure
    Catalyst expression — kept for callers that need a no-Python plan (e.g.
    a SQL-only pipeline), but NO LONGER the probe path: round 9 measured the
    interpreted higher-order evaluation at tables × planes × dim expression
    nodes per row and moved lsh_topk / write_lsh_index / lsh_topk_indexed to
    the Arrow-batched matmul family (lsh_buckets_udf — different hyperplane
    derivation, so the two families' bucket ids are NOT interchangeable).

    Hyperplane components are pseudo-random ±1 derived from
    xxhash64(seed, plane, dim) — deterministic, no stored model, computable
    row-local at any scale; dot products run as one higher-order
    expression per plane."""
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


def _lsh_sign_matrix(dim: int, num_planes: int, seed: int):
    """Deterministic ±1 hyperplane matrix (dim × num_planes), derived from
    sha256 of (seed, plane, counter) — stable across machines, Python and
    numpy versions forever (unlike numpy Generator streams, which NEP 19
    allows to change), so persisted LSH indexes written years apart agree."""
    import hashlib

    import numpy as np

    cols = []
    need = (dim + 7) // 8
    for p in range(num_planes):
        buf = b""
        ctr = 0
        while len(buf) < need:
            buf += hashlib.sha256(f"lsh:{seed}:{p}:{ctr}".encode()).digest()
            ctr += 1
        bits = np.unpackbits(np.frombuffer(buf[:need], dtype=np.uint8))[:dim]
        cols.append(bits.astype(np.float64) * 2.0 - 1.0)
    return np.stack(cols, axis=1)


def _lsh_stacked_matrix(dim: int, num_tables: int, num_planes: int, seed: int):
    import numpy as np

    return np.concatenate(
        [_lsh_sign_matrix(dim, num_planes, seed + t) for t in range(num_tables)], axis=1
    )


def lsh_query_buckets(
    query_vec: list[float], num_tables: int, num_planes: int, seed: int = 7
) -> list[int]:
    """The query's bucket id in every table — pure numpy, NO Spark job (the
    round-7 version scheduled a driver job just to hash one vector)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    bits = (q @ _lsh_stacked_matrix(len(q), num_tables, num_planes, seed)) >= 0
    w = (2 ** np.arange(num_planes - 1, -1, -1)).astype(np.int64)
    return [int(b) for b in bits.reshape(num_tables, num_planes).astype(np.int64) @ w]


def lsh_buckets_udf(num_tables: int, num_planes: int, seed: int = 7):
    """Arrow-batched bucket computation: ONE numpy matmul per batch yields
    every table's bucket id for every row (array<int>, position = table).

    This is the measured exception to "stay JVM-side": the Catalyst
    higher-order spelling (sign_lsh_bucket) evaluates
    tables × planes × dim interpreted expression nodes PER ROW — ~4096 for
    the default 16×4×64 probe, 3.9 s over sf0.1 embeddings — while the
    Arrow batch path is a single (batch × dim) @ (dim × tables·planes)
    BLAS call (~0.2 s same data). Hyperplanes come from the sha256 family
    above, shared with lsh_query_buckets, so probe and corpus can never
    disagree."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        import numpy as np

        if v.empty:
            return pd.Series([], dtype=object)
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        S = _lsh_stacked_matrix(X.shape[1], num_tables, num_planes, seed)
        bits = (X @ S >= 0).reshape(len(v), num_tables, num_planes)
        w = (2 ** np.arange(num_planes - 1, -1, -1)).astype(np.int64)
        ids = bits.astype(np.int64) @ w
        return pd.Series([row.astype("int32").tolist() for row in ids])

    return buckets


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
    # Query buckets: pure numpy, zero Spark jobs; corpus buckets: ONE
    # Arrow-batched matmul per batch computing all tables at once
    # (lsh_buckets_udf docstring has the measured JVM-vs-Arrow comparison).
    qb = lsh_query_buckets(query_vec, num_tables, num_planes, seed=7)
    bks = lsh_buckets_udf(num_tables, num_planes, seed=7)(F.col(vec_col))
    qarr = F.array(*[F.lit(int(b)) for b in qb])
    hit = F.exists(F.zip_with(bks, qarr, lambda x, y: x == y), lambda m: m)
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
    dim: int | None = None,
) -> DataFrame:
    """k nearest neighbors for every vector (within optional buckets).

    Without a bucket column this is the O(n²) brute-force building block, so
    the unbucketed form must be requested explicitly with
    ``allow_bruteforce=True`` — callers at scale must provide bucketing
    (LSH/IVF partition) instead of silently cross-joining the corpus.

    ``dim`` (round 17): optional fixed vector width — unrolls the per-pair
    dot product and per-row norms to codegen (functions.vector.dot_product,
    bit-identical fold order; other-width rows fall back to the interpreted
    form)."""
    if bucket_col is None and not allow_bruteforce:
        raise ValueError(
            "pairwise_knn without bucket_col is O(n²); pass a bucket_col "
            "(LSH bucket / IVF centroid) or opt in explicitly with "
            "allow_bruteforce=True on small inputs"
        )
    # Per-row norm hoist (round 16, same as embedding_neardup_pairs): the
    # cosine's two norms move below the join so each row's norm is computed
    # once, not once per pair — cosine_from_norms (one shared helper,
    # ADVICE r16) applies the same operation order, so the value stays
    # bit-identical.
    from duckdb_parachute_spark.functions.vector import cosine_from_norms, row_norm

    keys = [bucket_col] if bucket_col else []
    a = df.select(
        *keys,
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("__v1"),
        row_norm(F.col(vec_col), dim).alias("__n1"),
    )
    b = df.select(
        *keys,
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("__v2"),
        row_norm(F.col(vec_col), dim).alias("__n2"),
    )
    # merge-hint the bucketed self-join for the same reason as
    # embedding_neardup_pairs (round 17): both sides are the corpus, and a
    # locally-estimated broadcast join would serialize the pair work onto
    # the streamed side's (often single) input partition.
    joined = (a.join(b.hint("merge"), keys) if keys else a.crossJoin(b)).where(
        F.col("id1") != F.col("id2")
    )
    sim = cosine_from_norms(
        F.col("__v1"), F.col("__v2"), F.col("__n1"), F.col("__n2"), dim
    ).alias("cosine")
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
    directories); bucket-equality probes prune to one directory per table.
    Buckets come from the same sha256 hyperplane family as lsh_topk /
    lsh_query_buckets (Arrow-batched matmul), so a flyweight probe and an
    index probe with the same (num_planes, seed) always agree."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(F.col(id_col), vec_d.alias(vec_col)).withColumn(
        "lsh_bucket",
        lsh_buckets_udf(1, num_planes, seed)(F.col(vec_col)).getItem(0),
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
    """Probe a persisted LSH index: compute the query's bucket (pure numpy,
    no Spark job scheduled), read only that partition directory,
    exact-rerank inside it."""
    qb = lsh_query_buckets(list(map(float, query_vec)), 1, num_planes, seed)[0]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path).where(F.col("lsh_bucket") == F.lit(int(qb)))
    sim = array_cosine_similarity(F.col(vec_col), q)
    return (
        idx.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def quantize_int8(vec: Column, scale_out: str = "scale") -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: (scale, int8 codes).

    codes[i] = floor(x[i] / scale * 127 + 0.5), scale = max(|x|) (1.0 for an
    all-zero vector). At 100 TB this is the embedding-storage workhorse —
    4x smaller vectors mean 4x smaller shuffles and broadcast blocks for
    every ANN stage, with dot products reconstructable as
    (a.scale/127)*(b.scale/127)*int_dot. floor(x+0.5) instead of round():
    the two engines' round() disagree on negative halves, floor is exact and
    identical everywhere. All arithmetic in DOUBLE (float32 inputs widen
    exactly), so codes are bit-reproducible cross-engine."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax == 0.0, F.lit(1.0)).otherwise(absmax)
    codes = F.transform(
        vec, lambda x: F.floor(x.cast("double") / scale * 127 + F.lit(0.5)).cast("int")
    )
    return scale.alias(scale_out), codes
