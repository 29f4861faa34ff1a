"""Dedup workload queries (extension goal, SURVEY M5). Every signature is
md5-based by construction (MinHash and SimHash both), so each query carries a
full DuckDB value oracle — no rows-only checks in this family."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.dedup import (
    decontaminate,
    minhash_lsh_overflow,
    minhash_lsh_pairs,
    ngram_jaccard,
)
from duckdb_parachute_spark.operators import distinct_on
from duckdb_parachute_spark.workload import query


@query(
    "dedup_exact_prefix",
    oracle="""
    SELECT prefix, CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS group_size
    FROM (SELECT doc_id,
                 array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS prefix
          FROM documents)
    GROUP BY prefix
    """,
)
def dedup_exact_prefix(spark, sf_dir):
    """Exact dedup by derived key (first 3 words): hash-groupBy, keeping the
    min doc_id per group — one shuffle, the canonical exact-dedup shape."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))
    return (
        d.select("doc_id", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


# The MinHash signature is md5-based so the oracle can compute the identical
# signature in DuckDB SQL (list_transform + list_min over shingles).
_MINHASH_ORACLE = """
WITH sh AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           ) AS shingles
    FROM documents
), sig AS (
    SELECT doc_id,
           list_transform(generate_series(0, 11),
               p -> list_min(list_transform(shingles, s -> md5(CAST(p AS VARCHAR) || '|' || s)))
           ) AS signature
    FROM sh
), bands AS (
    SELECT doc_id, b,
           CAST(b AS VARCHAR) || '#' || md5(array_to_string(list_slice(signature, b*3 + 1, b*3 + 3), '|')) AS band_key
    FROM sig, generate_series(0, 3) t(b)
)
SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


@query("dedup_minhash_pairs", oracle=_MINHASH_ORACLE)
def dedup_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (12 perms, 4 bands × 3 rows,
    3-word shingles). Shuffle-on-band-key candidate generation — never O(n²).
    The DuckDB oracle computes the identical md5-based signature."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", num_perm=12, bands=4, shingle_k=3)


# Capped variant of the MinHash bucket pipeline: buckets over the size cap
# are excluded from pair generation (the hot-bucket OOM guard) and reported
# through the overflow side-channel instead.
_MINHASH_BANDS_CTE = """
WITH sh AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           ) AS shingles
    FROM documents
), sig AS (
    SELECT doc_id,
           list_transform(generate_series(0, 11),
               p -> list_min(list_transform(shingles, s -> md5(CAST(p AS VARCHAR) || '|' || s)))
           ) AS signature
    FROM sh
), bands AS (
    SELECT doc_id, b,
           CAST(b AS VARCHAR) || '#' || md5(array_to_string(list_slice(signature, b*3 + 1, b*3 + 3), '|')) AS band_key
    FROM sig, generate_series(0, 3) t(b)
)
"""


@query(
    "dedup_hot_bucket_cap",
    oracle=_MINHASH_BANDS_CTE
    + """
    SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE a.band_key IN (
        SELECT band_key FROM bands GROUP BY band_key HAVING count(*) BETWEEN 2 AND 2
    )
    """,
)
def dedup_hot_bucket_cap(spark, sf_dir):
    """MinHash+LSH pairs with the hot-bucket cap active (max 2 members):
    over-cap buckets emit NO pairs — the guard that bounds the k·(k-1)/2
    per-bucket pair blowup on boilerplate-heavy corpora. Cap 2 is
    deliberately tiny so the sf0.01 corpus exercises the capped branch."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=12, bands=4, shingle_k=3, max_bucket_size=2
    )


@query(
    "dedup_hot_bucket_overflow",
    join_arrays=["id_sample"],
    oracle=_MINHASH_BANDS_CTE
    + """
    SELECT band_key, CAST(count(*) AS BIGINT) AS bucket_size,
           list_slice(list_sort(list(doc_id)), 1, 5) AS id_sample
    FROM bands GROUP BY band_key HAVING count(*) > 2
    """,
)
def dedup_hot_bucket_overflow(spark, sf_dir):
    """The overflow side-channel for the capped MinHash run: one row per
    over-cap bucket with its size and a bounded id sample — what a pipeline
    routes to exact-dedup / boilerplate filtering instead of pair expansion."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_overflow(
        d, "doc_id", "text", num_perm=12, bands=4, shingle_k=3, max_bucket_size=2
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(length(substr(text, 1, 60)) - 2, 1)),
                   i -> substr(substr(text, 1, 60), i, 3))) AS grams
        FROM documents WHERE doc_id < 60
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1), 6) AS jaccard
    FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Character-3-gram Jaccard similarity on adjacent-doc 60-char prefixes —
    the exact-verification stage of a near-dup pipeline."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    pre = d.select("doc_id", F.substring("text", 1, 60).alias("t"))
    a = pre.select(F.col("doc_id").alias("id1"), F.col("t").alias("t1"))
    b = pre.select(F.col("doc_id").alias("id2"), F.col("t").alias("t2"))
    pairs = a.join(b, b.id2 == a.id1 + 1)
    return pairs.select(
        "id1", "id2", F.round(ngram_jaccard(F.col("t1"), F.col("t2"), 3), 6).alias("jaccard")
    )


# The md5-bit SimHash signature is engine-independent (see dedup.simhash_bits),
# so the oracle rebuilds the identical 64-char bit string in DuckDB SQL and
# the pair set hash-matches — upgraded from the rows-only check simhash64's
# xxhash64 bits forced.
_SIMHASH_ORACLE = """
WITH sh AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
           ) AS shingles
    FROM documents WHERE doc_id < 100
), tok AS (
    SELECT doc_id, md5(unnest(shingles)) AS h FROM sh
), bits AS (
    SELECT doc_id, k,
           ((ascii(substr(h, k // 4 + 1, 1))
             - CASE WHEN ascii(substr(h, k // 4 + 1, 1)) >= 97 THEN 87 ELSE 48 END)
            // ([8, 4, 2, 1])[(k % 4) + 1]) % 2 AS bit
    FROM tok, generate_series(0, 63) t(k)
), votes AS (
    SELECT doc_id, k, sum(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, k
), sig AS (
    SELECT doc_id,
           string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY k) AS s
    FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(hamming(a.s, b.s) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON b.doc_id > a.doc_id
WHERE hamming(a.s, b.s) <= 24
"""


@query("dedup_simhash_clusters", oracle=_SIMHASH_ORACLE)
def dedup_simhash_clusters(spark, sf_dir):
    """SimHash near-dup: 64-bit md5-based signatures (dedup.simhash_bits —
    one Catalyst fold per doc, no shuffle until the pair join), pairs within
    hamming distance 24. Signature computed per-partition; the only shuffle
    is the (tiny) signature self-join."""
    from duckdb_parachute_spark.dedup import simhash_bits
    from duckdb_parachute_spark.functions.metrics import hamming_str

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    sigs = d.select("doc_id", simhash_bits(F.col("text"), 2).alias("sig"))
    a = sigs.select(F.col("doc_id").alias("id1"), F.col("sig").alias("s1"))
    b = sigs.select(F.col("doc_id").alias("id2"), F.col("sig").alias("s2"))
    return (
        a.join(b, b.id2 > a.id1)
        .withColumn("hamming", hamming_str(F.col("s1"), F.col("s2")).cast("bigint"))
        .where(F.col("hamming") <= 24)
        .select("id1", "id2", "hamming")
    )


@query(
    "dedup_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id < 120 AND b.vec_id < 120
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.8
    """,
)
def dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label buckets (the bucketed
    self-join is the 100 TB shape; label stands in for an LSH bucket)."""
    from duckdb_parachute_spark.dedup import embedding_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120)
    pairs = embedding_neardup_pairs(e, "vec_id", "embedding", 0.8, bucket_col="label")
    return pairs.select("id1", "id2", F.round("cosine", 6).alias("cosine"))


@query(
    "text_decontaminate",
    oracle="""
    WITH ev AS (
        SELECT DISTINCT s AS shingle FROM (
            SELECT unnest(list_transform(
                generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
                i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
            )) AS s
            FROM documents WHERE doc_id % 50 = 0
        ) WHERE s <> ''
    ),
    corp AS (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
            i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
        )) AS shingle
        FROM documents WHERE doc_id % 50 <> 0
    )
    SELECT c.doc_id, CAST(count(DISTINCT c.shingle) AS BIGINT) AS n_hits
    FROM corp c JOIN ev e ON c.shingle = e.shingle
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (dedup.decontaminate): corpus docs sharing
    any 3-word shingle with the eval slice (doc_id % 50 = 0) are flagged
    with their distinct contaminated-shingle count. Broadcast semi-join —
    the corpus is never shuffled at its own size."""
    d = load_table(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 50 == 0)
    corp = d.where(F.col("doc_id") % 50 != 0)
    return decontaminate(corp, ev, "doc_id", "text", k=3).orderBy("doc_id")


# Connected components over the MinHash candidate pairs: the cluster
# assignment step of a real dedup pipeline (pairs alone don't say which
# documents to drop). The oracle computes the same components by min-label
# reachability in a recursive CTE over the IDENTICAL md5-derived pair set.
_CLUSTER_ORACLE = """
WITH RECURSIVE sh AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           ) AS shingles
    FROM documents
), sig AS (
    SELECT doc_id,
           list_transform(generate_series(0, 11),
               p -> list_min(list_transform(shingles, s -> md5(CAST(p AS VARCHAR) || '|' || s)))
           ) AS signature
    FROM sh
), bands AS (
    SELECT doc_id, b,
           CAST(b AS VARCHAR) || '#' || md5(array_to_string(list_slice(signature, b*3 + 1, b*3 + 3), '|')) AS band_key
    FROM sig, generate_series(0, 3) t(b)
), pairs AS (
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
), edges AS (
    SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(node, comp) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
    UNION
    SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


@query("dedup_cluster_canonical", oracle=_CLUSTER_ORACLE)
def dedup_cluster_canonical(spark, sf_dir):
    """Near-dup CLUSTER assignment: MinHash+LSH pairs → alternating
    large-star/small-star connected components (Kiveris et al., SoCC 2014)
    → (doc_id, cluster_id=min id of the component). The canonical survivor
    per cluster is cluster_id itself; a full dedup keeps
    ``WHERE doc_id = cluster_id OR doc_id NOT IN pairs``. O(log^2 n) rounds
    of groupBy-min + co-partitioned join — no per-node neighborhood
    materialization, so boilerplate-document hot nodes cannot OOM a task."""
    from duckdb_parachute_spark.dedup.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_perm=12, bands=4, shingle_k=3)
    cc = connected_components(pairs, "id1", "id2")
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    ).orderBy("doc_id")


# The actual DEDUP output: keep each cluster's canonical doc (its min id)
# plus every doc that never entered a candidate pair — corpus minus dropped
# near-dups. Completes pairs → clusters → survivors.
_KEEP_ORACLE = _CLUSTER_ORACLE.replace(
    """SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id""",
    """SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM (
    SELECT d.doc_id,
           CASE WHEN cc.doc_id IS NULL THEN TRUE ELSE cc.cluster_id = d.doc_id END AS keep
    FROM documents d
    LEFT JOIN (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node) cc
      ON cc.doc_id = d.doc_id
)""",
)


@query("dedup_keep_canonical", oracle=_KEEP_ORACLE)
def dedup_keep_canonical(spark, sf_dir):
    """End-to-end near-dup dedup: MinHash pairs → connected components →
    keep one canonical doc (the cluster min) per cluster, keep all docs
    outside any pair. Returns the kept/dropped counts (the corpus-level
    contract a 100 TB dedup job reports). The drop set is an anti-join of
    the corpus against the non-canonical cluster members — broadcastable
    when the near-dup fraction is small, shuffle-safe otherwise."""
    from duckdb_parachute_spark.dedup.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_perm=12, bands=4, shingle_k=3)
    cc = connected_components(pairs, "id1", "id2")
    dropped = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = d.join(dropped, "doc_id", "left_anti")
    return kept.agg(F.count(F.lit(1)).alias("n_kept")).crossJoin(
        dropped.agg(F.count(F.lit(1)).alias("n_dropped"))
    )


@query(
    "dedup_semantic_pairs",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centroid
        FROM embeddings WHERE vec_id < 6
    ),
    assigned AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
                                c.centroid_id
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2, a.centroid_id AS cluster_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.85
    ORDER BY id1, id2
    """,
)
def dedup_semantic_pairs(spark, sf_dir):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster-assign every embedding to its nearest centroid (broadcast
    crossJoin + per-row argmax — no corpus shuffle), then cosine pairs ≥
    threshold WITHIN clusters only, so the quadratic search is bounded by
    cluster size, never corpus size. Centroids here are the deterministic
    seed set vec_id < 6 (k-means iterations are not SQL-expressible; the
    IVF trainer in similarity/ provides them in production) so the oracle
    replays assignment AND pair search exactly."""
    from duckdb_parachute_spark.dedup import semantic_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    pairs = semantic_dup_pairs(e, cents, "vec_id", "embedding", 0.85)
    return pairs.select(
        "id1", "id2", F.col("centroid_id").alias("cluster_id"), F.round("cosine", 6).alias("cosine")
    ).orderBy("id1", "id2")


@query(
    "dedup_semantic_probes",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centroid
        FROM embeddings WHERE vec_id < 6
    ),
    assigned AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
                                c.centroid_id
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn <= 2
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2, a.centroid_id AS cluster_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.8
    ORDER BY id1, id2, cluster_id
    """,
)
def dedup_semantic_probes(spark, sf_dir):
    """SemDeDup MULTI-PROBE assignment (round 11; Abbas et al. 2023 §recall
    — near-dup pairs that straddle a cluster boundary are the single-probe
    recall loss): every embedding lands in its top-2 clusters, the pair
    search still runs per-cluster. The assignment stays the zero-exchange
    broadcast argmax with one extra explode (row growth exactly ×2 by
    design, never a shuffle); the oracle replays it as a rn <= 2 window.
    A pair sharing both probed clusters appears once per shared cluster in
    both engines."""
    from duckdb_parachute_spark.dedup import semantic_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    pairs = semantic_dup_pairs(e, cents, "vec_id", "embedding", 0.8, probes=2)
    return pairs.select(
        "id1", "id2", F.col("centroid_id").alias("cluster_id"), F.round("cosine", 6).alias("cosine")
    ).orderBy("id1", "id2", "cluster_id")
