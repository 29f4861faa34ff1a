"""Unit tests for composite operators on tiny literal frames (FIXTURES.md §5
micro-fixture shapes), asserting against hand-computed expectations and the
DuckDB oracle where the semantics are subtle (asof edge cases)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_parachute_spark.operators import (
    asof_join,
    distinct_on,
    limit_percent,
    positional_join,
    recursive_cte,
    sample_deterministic,
    top_n,
)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 1, 100.0), ("A", 5, 101.0), ("A", 10, 102.0), ("B", 3, 50.0), ("C", 2, 7.0)],
        "sym string, t int, price double",
    )
    quotes = spark.createDataFrame(
        [("A", 1, 99.0), ("A", 4, 99.5), ("A", 11, 100.5), ("B", 5, 49.0)],
        "sym string, t int, bid double",
    )
    return trades, quotes


def test_asof_backward_matches_duckdb(trades_quotes, spark):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on="t", by=["sym"]).toPandas()
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    exp = con.sql(
        """SELECT t.sym, t.t, t.price, q.bid AS bid, q.t AS t_right
           FROM trades t ASOF LEFT JOIN quotes q ON t.sym = q.sym AND t.t >= q.t"""
    ).df()
    g = got.sort_values(["sym", "t"]).reset_index(drop=True)
    e = exp.sort_values(["sym", "t"]).reset_index(drop=True)[g.columns]
    assert g.astype(str).equals(e.astype(str)), f"\n{g}\nvs\n{e}"


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    got = {
        (r["sym"], r["t"]): r["t_right"]
        for r in asof_join(trades, quotes, on="t", by=["sym"], direction="forward").collect()
    }
    # forward: least quote t >= trade t
    assert got[("A", 1)] == 1
    assert got[("A", 5)] == 11
    assert got[("A", 10)] == 11
    assert got[("B", 3)] == 5
    assert got[("C", 2)] is None


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    got = {
        (r["sym"], r["t"]): r["t_right"]
        for r in asof_join(trades, quotes, on="t", by=["sym"], tolerance=2).collect()
    }
    assert got[("A", 5)] == 4      # within 2
    assert got[("A", 10)] is None  # last quote at 4 is 6 away
    assert got[("A", 1)] == 1


def test_asof_inner(trades_quotes):
    trades, quotes = trades_quotes
    rows = asof_join(trades, quotes, on="t", by=["sym"], how="inner").collect()
    assert {(r["sym"], r["t"]) for r in rows} == {("A", 1), ("A", 5), ("A", 10)}


def test_distinct_on(spark):
    df = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 5), (2, "c", 1)], "k int, v string, o int"
    )
    rows = distinct_on(df, ["k"], [F.col("o").desc()]).collect()
    assert {(r["k"], r["v"]) for r in rows} == {(1, "b"), (2, "c")}


def test_positional_join_padding(spark):
    a = spark.createDataFrame([("x",), ("y",), ("z",)], "a string")
    b = spark.createDataFrame([(1,), (2,)], "b int")
    rows = positional_join(a, b, [F.col("a")], [F.col("b")]).collect()
    pairs = {(r["a"], r["b"]) for r in rows}
    assert pairs == {("x", 1), ("y", 2), ("z", None)}


def test_recursive_cte_factorial(spark):
    base = spark.createDataFrame([(1, 1)], "n int, f int")
    out = recursive_cte(
        base,
        lambda prev: prev.where(F.col("n") < 6).select(
            (F.col("n") + 1).alias("n"), (F.col("f") * (F.col("n") + 1)).alias("f")
        ),
        union_all=True,
    )
    assert {(r["n"], r["f"]) for r in out.collect()} == {
        (1, 1), (2, 2), (3, 6), (4, 24), (5, 120), (6, 720)
    }


def test_recursive_cte_union_dedup_terminates(spark):
    # cyclic graph: 0->1->2->0 ; UNION semantics must converge
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src int, dst int")
    base = spark.createDataFrame([(0,)], "node int")

    def step(prev):
        return edges.join(prev, edges.src == prev.node).select(F.col("dst").alias("node"))

    out = recursive_cte(base, step, union_all=False, max_iterations=10)
    assert {r["node"] for r in out.collect()} == {0, 1, 2}


def test_recursive_prefilter_is_delta_sized(spark):
    # Structural pin for the round-6 semi-join prefilter (replaces the
    # load-sensitive wall-clock ratio the round-6 advisor flagged): the
    # history rows reaching the exceptAll exchange are exactly the hash
    # collisions with the candidate set — O(|delta|), independent of |acc|.
    from duckdb_parachute_spark.operators.recursive import _prefilter_history

    acc = spark.range(10_000).select(F.col("id").cast("int").alias("node"))
    # one candidate already in history, one new -> exactly 1 surviving row
    cand = spark.createDataFrame([(7,), (123_456,)], "node int")
    survivors = _prefilter_history(acc, cand)
    assert survivors.count() == 1
    assert survivors.head()["node"] == 7
    # disjoint candidates -> the whole 10k-row history is filtered to zero
    assert _prefilter_history(acc, spark.createDataFrame([(-5,)], "node int")).count() == 0


def test_recursive_cte_deep_union_plan_stays_flat(spark):
    # Deep UNION recursion: the periodic localCheckpoint must truncate
    # lineage so the final plan is O(checkpoint_every), NOT O(iterations).
    # Structural (plan-size) invariant — deterministic, unlike wall clock:
    # without checkpointing, the 120-deep plan would be ~3x the 40-deep one.
    base = spark.createDataFrame([(0,)], "node int")

    def run(n):
        def step(prev):
            return prev.where(F.col("node") < n).select((F.col("node") + 1).alias("node"))

        out = recursive_cte(base, step, union_all=False, max_iterations=n + 20)
        assert out.count() == n + 1
        return len(out._jdf.queryExecution().analyzed().toString())

    p40 = run(40)
    p120 = run(120)
    assert p120 < 1.5 * p40, (
        f"3x deeper recursion grew the analyzed plan {p120 / p40:.1f}x "
        f"({p40} -> {p120} chars) — lineage truncation regressed"
    )


def test_recursive_cte_odd_max_iterations_tail(spark):
    # The round-9 two-step unroll has an odd-tail branch (single step +
    # solo probe when one step of budget remains); pin that a recursion
    # converging exactly AT an odd max_iterations still returns, and one
    # needing more still raises.
    base = spark.createDataFrame([(0,)], "n int")

    def step(prev):
        return prev.where(F.col("n") < 5).select((F.col("n") + 1).alias("n"))

    out = recursive_cte(base, step, union_all=False, max_iterations=7)
    assert {r["n"] for r in out.collect()} == {0, 1, 2, 3, 4, 5}
    with pytest.raises(RuntimeError, match="did not converge"):
        recursive_cte(base, step, union_all=False, max_iterations=3)


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    # reliable=True routes lineage truncation through checkpoint() against
    # a configured dir (fault-tolerant at cluster scale — VERDICT r8
    # "What's wrong" #1). Results must be identical to the local path for
    # both recursive_cte and global_row_number (range-boundary determinism
    # survives the switch), and the knob must refuse to run without a dir.
    from duckdb_parachute_spark.functions.scalar import global_row_number

    base = spark.createDataFrame([(0,)], "n int")

    def step(prev):
        return prev.where(F.col("n") < 9).select((F.col("n") + 1).alias("n"))

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None or "parachute_ckpt" in sc.getCheckpointDir()
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint dir"):
            recursive_cte(base, step, reliable=True)
    sc.setCheckpointDir(str(tmp_path / "parachute_ckpt"))
    rel = {r["n"] for r in recursive_cte(base, step, reliable=True).collect()}
    loc = {r["n"] for r in recursive_cte(base, step, reliable=False).collect()}
    assert rel == loc == set(range(10))

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("v"), F.col("id").cast("int").alias("id")
    )
    a = sorted(
        (r["v"], r["id"], r["rn"])
        for r in global_row_number(df, ["v", "id"], reliable=True).collect()
    )
    b = sorted(
        (r["v"], r["id"], r["rn"])
        for r in global_row_number(df, ["v", "id"], reliable=False).collect()
    )
    assert a == b


def test_top_n_and_limit_percent(spark):
    df = spark.range(100).withColumnRenamed("id", "x")
    assert [r["x"] for r in top_n(df, [F.col("x").desc()], 3).collect()] == [99, 98, 97]
    assert limit_percent(df, 10).count() == 10


def test_sample_deterministic_stable(spark):
    df = spark.range(1000)
    a = sorted(r["id"] for r in sample_deterministic(df, F.col("id"), 10).collect())
    b = sorted(r["id"] for r in sample_deterministic(df, F.col("id"), 10).collect())
    assert a == b and 50 <= len(a) <= 200


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from duckdb_parachute_spark.catalog import load_table
    from duckdb_parachute_spark.similarity import (
        brute_force_topk,
        ivf_build_centroids,
        ivf_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where(F.col("vec_id") == 7).head().embedding]
    cents = ivf_build_centroids(e, n_centroids=8, iters=2)
    approx = {r.vec_id for r in ivf_topk(e, cents, qv, 10, nprobe=3).collect()}
    exact = {r.vec_id for r in brute_force_topk(e, qv, 10).collect()}
    assert len(approx & exact) / 10 >= 0.6
    # probing every list must recover brute force exactly
    full = [r.vec_id for r in ivf_topk(e, cents, qv, 10, nprobe=8).collect()]
    assert full == [r.vec_id for r in brute_force_topk(e, qv, 10).collect()]


def test_salted_join_equals_plain_join(spark, sf_dir):
    from duckdb_parachute_spark.catalog import load_table
    from duckdb_parachute_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
    dim = li.select("l_returnflag").distinct().withColumn("tag", F.concat(F.lit("t-"), "l_returnflag"))
    salted = salted_join(li, dim, on="l_returnflag", hot_keys=["R"], salt=4)
    plain = li.join(dim, "l_returnflag")
    assert salted.count() == plain.count()
    s = salted.groupBy("l_returnflag", "tag").count().collect()
    p = plain.groupBy("l_returnflag", "tag").count().collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, p))


def test_salted_join_all_keys_and_left(spark, sf_dir):
    from duckdb_parachute_spark.catalog import load_table
    from duckdb_parachute_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type").limit(500)
    dim = ev.select("event_type").distinct().where(F.col("event_type") != "click")
    out = salted_join(ev, dim.withColumn("known", F.lit(True)), on="event_type", how="left")
    got = {r.event_type: r.known for r in out.select("event_type", "known").distinct().collect()}
    assert got["click"] is None and got.get("view") is True


def test_register_udfs_for_sql(spark):
    from duckdb_parachute_spark.functions import register_udfs

    register_udfs(spark)
    row = spark.sql(
        "SELECT jaro_winkler_similarity('martha', 'marhta') AS jw, "
        "damerau_levenshtein('ca', 'abc') AS dl"
    ).head()
    assert abs(row.jw - 0.9611111111111111) < 1e-12
    assert row.dl == 2


def test_format_bytes_matches_duckdb(spark):
    # grouping separators must NOT appear: DuckDB prints '1022.9 KiB', not '1,022.9 KiB'
    import duckdb

    from duckdb_parachute_spark.functions import metrics as M

    ns = [0, 999, 1023, 1024, 1047276, 10**6, 123456789, 1022 * 1024 + 950, 5 * 1024**4]
    got = {
        r.n: r.fb
        for r in spark.createDataFrame([(n,) for n in ns], "n long")
        .select("n", M.format_bytes(F.col("n")).alias("fb"))
        .collect()
    }
    con = duckdb.connect()
    for n in ns:
        want = con.execute(f"SELECT format_bytes({n})").fetchone()[0]
        assert got[n] == want, (n, got[n], want)


def test_reservoir_sample_properties(spark):
    # exactly k rows; same sample under any partitioning/arrival order;
    # different seed -> (almost surely) different sample; k >= n -> all rows.
    from duckdb_parachute_spark.operators.misc import reservoir_sample

    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)], "id long, v string")
    s1 = sorted(r.id for r in reservoir_sample(df, 50, "id", seed=7).collect())
    assert len(s1) == 50
    s2 = sorted(r.id for r in reservoir_sample(df.repartition(17), 50, "id", seed=7).collect())
    assert s1 == s2
    s3 = sorted(r.id for r in reservoir_sample(df, 50, "id", seed=8).collect())
    assert s1 != s3
    assert len(reservoir_sample(df, 1000, "id").collect()) == 500


def test_pivot_dynamic_matches_explicit(spark):
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.operators.misc import pivot_dynamic

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "z", 4), ("a", None, 9)],
        "g string, p string, v long",
    )
    dyn = pivot_dynamic(df, ["g"], "p", F.sum("v"))
    exp = df.groupBy("g").pivot("p", ["x", "y", "z"]).agg(F.sum("v"))
    # discovered columns are the sorted non-null distinct values
    assert dyn.columns == ["g", "x", "y", "z"]
    assert sorted(map(tuple, dyn.collect())) == sorted(map(tuple, exp.collect()))
    # wider than max_values must raise, never silently truncate
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct values"):
        pivot_dynamic(df, ["g"], "p", F.sum("v"), max_values=2)


def test_lsh_hot_bucket_cap(spark):
    # Cap semantics: capped pairs ⊆ uncapped pairs; disabling the cap (None)
    # or setting it above every bucket is identical to uncapped; the overflow
    # side-channel reports exactly the over-cap buckets with bounded samples.
    from duckdb_parachute_spark.dedup import minhash_lsh_overflow, minhash_lsh_pairs

    boiler = [(i, "lorem ipsum dolor sit amet common boilerplate text") for i in range(8)]
    uniq = [
        # identical pair -> shares every band, survives any cap >= 2
        (10, "alpha beta gamma delta epsilon zeta"),
        (11, "alpha beta gamma delta epsilon zeta"),
        (12, "totally unrelated words appear here instead"),
    ]
    df = spark.createDataFrame(boiler + uniq, "doc_id long, text string")

    def pairset(cap):
        return {
            (r.id1, r.id2)
            for r in minhash_lsh_pairs(
                df, "doc_id", "text", num_perm=12, bands=4, shingle_k=3, max_bucket_size=cap
            ).collect()
        }

    uncapped = pairset(None)
    capped = pairset(4)
    assert capped <= uncapped
    # the 8-member boilerplate bucket is excluded; the 2-member near-dup kept
    assert (10, 11) in capped
    assert not any(a < 8 and b < 8 for a, b in capped)
    assert pairset(100) == uncapped
    over = minhash_lsh_overflow(
        df, "doc_id", "text", num_perm=12, bands=4, shingle_k=3, max_bucket_size=4
    ).collect()
    assert over and all(r.bucket_size == 8 and len(r.id_sample) == 5 for r in over)


def test_bruteforce_guards_raise(spark):
    import pytest as _pytest

    from duckdb_parachute_spark.dedup import embedding_neardup_pairs
    from duckdb_parachute_spark.similarity import pairwise_knn

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="O\\(n²\\)"):
        embedding_neardup_pairs(df, "vec_id", "embedding", 0.5)
    with _pytest.raises(ValueError, match="O\\(n²\\)"):
        pairwise_knn(df, 1)
    # explicit opt-in still works
    assert embedding_neardup_pairs(
        df, "vec_id", "embedding", -1.0, allow_bruteforce=True
    ).count() == 1
    assert pairwise_knn(df, 1, allow_bruteforce=True).count() == 2


def test_unrolled_dot_bit_identical_to_fold(spark):
    """Round 17 (VERDICT r16 next #2): dot_product/row_norm with a dim hint
    unroll to codegen'd arithmetic; the value must be BIT-identical to the
    interpreted zip_with/aggregate fold (same products, same left-to-right
    order) — the oracle hash of every cosine consumer depends on it. Rows
    whose width differs from the hint (and null arrays) must take the fold
    fallback."""
    from duckdb_parachute_spark.functions.vector import (
        _dots,
        _norm,
        dot_product,
        row_norm,
    )

    df = spark.range(0, 50).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.sin(F.col("id") * (i + 1)) * 1e3).cast("float"),
        ).alias("v"),
    )
    a = df.select(F.col("id").alias("i1"), F.col("v").alias("v1"))
    b = df.select(F.col("id").alias("i2"), F.col("v").alias("v2"))
    p = a.crossJoin(b).where(F.col("i1") < F.col("i2"))
    bad = p.where(
        (_dots(F.col("v1"), F.col("v2")) != dot_product(F.col("v1"), F.col("v2"), 16))
        | (_norm(F.col("v1")) != row_norm(F.col("v1"), 16))
    ).count()
    assert bad == 0
    # wrong-width rows route through the fold (guard false), same value
    short = df.select(F.slice("v", 1, 7).alias("v"))
    assert short.where(_norm(F.col("v")) != row_norm(F.col("v"), 16)).count() == 0
    # null array stays null
    n = spark.sql("SELECT CAST(NULL AS array<float>) AS v")
    assert n.select(dot_product(F.col("v"), F.col("v"), 16).alias("d")).collect()[0]["d"] is None


def test_neardup_pairs_dim_hint_matches_fold(spark):
    """Round 17: embedding_neardup_pairs with a dim hint (unrolled cosine
    behind the evaluate_once barrier, merge-hinted self-join) must return
    exactly the rows and cosines of the dim-less fold plan."""
    from duckdb_parachute_spark.dedup import embedding_neardup_pairs

    df = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: (F.cos(F.col("id") + i * 2) + 1.0).cast("float"),
        ).alias("embedding"),
    )
    kw = dict(bucket_col="label", on_overflow="ignore")
    fast = embedding_neardup_pairs(df, "vec_id", "embedding", 0.9, dim=8, **kw)
    slow = embedding_neardup_pairs(df, "vec_id", "embedding", 0.9, **kw)
    got_f = sorted(map(tuple, fast.collect()))
    got_s = sorted(map(tuple, slow.collect()))
    assert got_f == got_s and len(got_f) > 0
    # the threshold filter must sit ABOVE the join, not inside its
    # condition (the barrier's whole purpose)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan


def test_cluster_assign_unrolled_matches_packed(spark):
    """Round 17: the unrolled literal-arithmetic argmax must agree with the
    packed higher-order fallback row-for-row (single-probe and multi-probe),
    and mixed-width centroid sets must still route to the packed plan."""
    from duckdb_parachute_spark import dedup as D

    df = spark.range(0, 120).select(
        F.col("id").alias("vid"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double"),
            (F.col("id") % 3 + 1).cast("double"),
        ).alias("emb"),
    )
    cents_df = spark.createDataFrame(
        [(0, [1.0, 0.5, 0.0]), (1, [0.0, 1.0, 0.25]), (2, [0.5, 0.0, 1.0])],
        "centroid_id long, centroid array<double>",
    )
    cents = D._collect_centroids(cents_df)
    for probes in (1, 2):
        unrolled = D._cluster_assign(df, cents, "vid", "emb", probes=probes)
        import unittest.mock as _mock

        with _mock.patch.object(D, "_MAX_ASSIGN_UNROLL", 0):
            packed = D._cluster_assign(df, cents, "vid", "emb", probes=probes)
        got_u = sorted((r["vid"], r["centroid_id"]) for r in unrolled.collect())
        got_p = sorted((r["vid"], r["centroid_id"]) for r in packed.collect())
        assert got_u == got_p
    # mixed widths -> no common dim -> packed fallback plan (join present)
    mixed = cents + [(9, [1.0, 2.0], 2.23606797749979)]
    plan = D._cluster_assign(df, mixed, "vid", "emb")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_simhash_bits_portable(spark):
    from duckdb_parachute_spark.dedup import simhash_bits
    from duckdb_parachute_spark.functions.metrics import hamming_str

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different sentence with other words entirely"),
        ],
        "id long, text string",
    ).select("id", simhash_bits(F.col("text"), 2).alias("sig"))
    rows = {r.id: r.sig for r in df.collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in rows.values())
    assert rows[1] == rows[2]  # identical text -> identical signature
    d = (
        spark.createDataFrame([(rows[1], rows[3])], "a string, b string")
        .select(hamming_str(F.col("a"), F.col("b")).alias("h"))
        .head()
        .h
    )
    assert d > 0


def test_point_in_interval_join_bounds(spark):
    from duckdb_parachute_spark.operators.rangejoin import point_in_interval_join

    pts = spark.createDataFrame(
        [("u", 0.0), ("u", 5.0), ("u", 10.0), ("u", 17.0), ("v", 5.0)],
        "k string, t double",
    )
    iv = spark.createDataFrame([("u", 5.0, 10.0)], "k string, lo double, hi double")
    got = lambda **kw: sorted(  # noqa: E731
        r.t for r in point_in_interval_join(pts, iv, "t", "lo", "hi", 4.0, by=["k"], **kw).collect()
    )
    assert got() == [5.0, 10.0]                       # closed-closed
    assert got(lo_open=True) == [10.0]                # (lo, hi]
    assert got(hi_open=True) == [5.0]                 # [lo, hi)
    assert got(lo_open=True, hi_open=True) == []      # open-open
    # bin width smaller than the interval still finds every match
    wide = point_in_interval_join(pts, iv, "t", "lo", "hi", 1.5, by=["k"])
    assert sorted(r.t for r in wide.collect()) == [5.0, 10.0]


def test_sql_macros_scalar_and_table(spark):
    from duckdb_parachute_spark.functions import macros

    macros.create_scalar_macro(spark, "t_add_pct", "x DOUBLE, pct DOUBLE", "DOUBLE", "x * (1.0 + pct / 100.0)")
    assert spark.sql("SELECT t_add_pct(200.0, 50.0) AS v").head().v == 300.0

    spark.range(6).selectExpr("id", "id * id AS sq").createOrReplaceTempView("t_macro_src")
    macros.create_table_macro(
        spark, "t_big_sq", "thresh BIGINT", "id BIGINT, sq BIGINT",
        "SELECT id, sq FROM t_macro_src WHERE sq > thresh",
    )
    got = macros.call_table_macro(spark, "t_big_sq", 9).orderBy("id").collect()
    assert [(r.id, r.sq) for r in got] == [(4, 16), (5, 25)]

    # macro expansion is bind-time: the UDF body folds into the plan (no
    # python eval / black-box call nodes)
    plan = spark.sql("SELECT * FROM t_big_sq(9)")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    macros.drop_macro(spark, "t_add_pct")
    macros.drop_macro(spark, "t_big_sq")


def test_groups_frame_agg_and_collect(spark):
    from duckdb_parachute_spark.operators.frames import (
        array_median,
        groups_frame_agg,
        groups_frame_collect,
    )

    # partition p=1: order groups o=1 {10, 20}, o=2 {30}, o=3 {40}
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 1, 20), (1, 2, 30), (1, 3, 40)], "p int, o int, v int"
    )
    out = groups_frame_agg(df, ["p"], "o", F.col("v"), preceding=1, following=1)
    rows = {(r["o"], r["v"]): r for r in out.collect()}
    # o=1 rows see groups {1,2}: sum 60, count 3, min 10, max 30
    assert rows[(1, 10)]["groups_sum"] == 60
    assert rows[(1, 10)]["groups_count"] == 3
    assert rows[(1, 10)]["groups_min"] == 10
    assert rows[(1, 10)]["groups_max"] == 30
    assert abs(rows[(1, 10)]["groups_avg"] - 20.0) < 1e-12
    # o=2 sees all three groups: sum 100
    assert rows[(2, 30)]["groups_sum"] == 100
    # o=3 sees groups {2,3}: sum 70
    assert rows[(3, 40)]["groups_sum"] == 70

    coll = groups_frame_collect(df, ["p"], "o", F.col("v"), 1, 1, out="vals")
    med = {
        r["o"]: r["m"]
        for r in coll.withColumn("m", array_median(F.col("vals"))).collect()
    }
    # o=2 frame values {10,20,30,40}: even count -> (20+30)/2
    assert med[2] == 25.0
    # o=3 frame values {30,40}: (30+40)/2
    assert med[3] == 35.0


def test_exclude_rows_sums_identity(spark):
    from duckdb_parachute_spark.operators.frames import exclude_rows_sums

    # p=1 sorted by o with ties: o values [1,1,2,2,3]; v = o*10 (constant per
    # peer group, so the frame sums are tie-order independent)
    df = spark.createDataFrame(
        [(1, 1, 1), (1, 1, 2), (1, 2, 3), (1, 2, 4), (1, 3, 5)], "p int, o int, id int"
    ).withColumn("v", F.col("o") * 10)
    out = exclude_rows_sums(
        df, ["p"], "o", F.col("v"), preceding=1, following=1, tiebreak=["id"]
    )
    got = {r["id"]: (r["excl_current"], r["excl_group"], r["excl_ties"]) for r in out.collect()}
    # idx order by (o, id): id1(10), id2(10), id3(20), id4(20), id5(30)
    # id1: frame {id1,id2}=20 -> current: 10, group: NULL (all peers), ties: 10
    assert got[1] == (10, None, 10)
    # id3: frame {id2,id3,id4}=50 -> current: 30, group: 10, ties: 30
    assert got[3] == (30, 10, 30)
    # id5: frame {id4,id5}=50 -> current: 20; its peer group is just itself,
    # so group also 20 and ties (which keeps the current row) is the full 50
    assert got[5] == (20, 20, 50)


def test_constraint_checks_detect_violations(spark):
    """check_unique / check_foreign_key must DETECT violations (the graded
    query only proves the driver data is clean — zero counts would also
    pass with a broken detector)."""
    from duckdb_parachute_spark.operators.dml import check_foreign_key, check_unique

    d = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    dups = check_unique(d, ["k"]).collect()
    assert [(r.k, r.n_dup) for r in dups] == [(1, 2)]

    p = spark.createDataFrame([(1,)], "pk int")
    orphans = check_foreign_key(d, p, "k", "pk").collect()
    assert [(r.k, r.n_orphans) for r in orphans] == [(2, 1)]

    # NULL child keys are not violations (SQL FK semantics)
    dn = spark.createDataFrame([(None,), (1,)], "k int")
    assert check_foreign_key(dn, p, "k", "pk").count() == 0


def test_pack_greedy_invariants(spark):
    """pack_greedy (packing.py): every bin except a shard's last is 'full'
    (could not have accepted the next doc), no bin except oversized-singleton
    bins exceeds max_len, offsets are the running fill, and the assignment
    is independent of input partitioning."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.packing import pack_greedy

    max_len = 50
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(80)) + 1).alias("t"),
    )
    out = pack_greedy(df, "doc_id", "t", max_len=max_len, n_shards=3).collect()
    by_bin: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (shard, bin_id), rows in by_bin.items():
        fills = 0
        for r in rows:
            assert r["bin_offset"] == fills
            fills += r["t"]
        if len(rows) > 1:
            assert fills <= max_len  # only a singleton may be oversized
        nxt = by_bin.get((shard, bin_id + 1))
        if nxt is not None:
            assert fills + nxt[0]["t"] > max_len  # greedy: next doc didn't fit
    # partitioning-independence: same result from a different layout
    out2 = pack_greedy(df.repartition(7), "doc_id", "t", max_len=max_len, n_shards=3)
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, out))


def test_chunk_tokens_overlap_and_tail(spark):
    from duckdb_parachute_spark.packing import chunk_tokens

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "solo")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_tokens(df, "doc_id", "text", window=4, stride=2).collect()
    }
    # doc 1: 7 tokens -> ceil((7-4)/2)+1 = 3 chunks at starts 1,3,5
    assert rows[(1, 0)]["chunk_text"] == "a b c d"
    assert rows[(1, 1)]["chunk_text"] == "c d e f"
    assert rows[(1, 2)]["chunk_text"] == "e f g" and rows[(1, 2)]["n_chunk_tokens"] == 3
    assert (1, 3) not in rows
    # short docs: exactly one truncated chunk
    assert rows[(2, 0)]["chunk_text"] == "x y" and (2, 1) not in rows
    assert rows[(3, 0)]["n_chunk_tokens"] == 1


def test_connected_components_known_graph(spark):
    from duckdb_parachute_spark.dedup.components import connected_components

    # two chains, one cycle, one self-loop, one isolated pair
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),        # chain → comp 1
            (10, 11), (11, 12),            # chain → comp 10
            (20, 21), (21, 22), (22, 20),  # cycle → comp 20
            (30, 30),                      # self-loop: dropped
            (40, 41),                      # pair → comp 40
        ],
        "a long, b long",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs, "a", "b").collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20), (22, 20),
        (40, 40), (41, 40),
    }
    assert got == want


def test_connected_components_bridged_and_empty(spark):
    from duckdb_parachute_spark.dedup.components import connected_components

    # components merged by a late bridge edge; also reversed-order edges
    pairs = spark.createDataFrame(
        [(5, 1), (2, 6), (6, 5)], "a long, b long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == {(1, 1), (2, 1), (5, 1), (6, 1)}
    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty, "a", "b").count() == 0


def test_star_round_is_three_exchanges(spark):
    # Round-16 optimization pin: one large-star+small-star round is exactly
    # 3 data exchanges (LS window, SS window, SS distinct) — the window
    # rewrite of the previous groupBy+join+distinct spelling (~7 exchanges).
    # ADVICE r16: pin == 3, not <= 3, so the pin and its docstring agree —
    # a plan that DROPS an exchange must also be value-audited, not slide
    # through a loose ceiling.
    from duckdb_parachute_spark.dedup.components import _large_star, _small_star
    from duckdb_parachute_spark.plans import plan_stats

    e0 = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long").localCheckpoint()
    s = plan_stats(_small_star(_large_star(e0)))
    assert s.shuffles == 3, f"star round changed to {s.shuffles} exchanges:\n{s.text}"


def test_star_forest_probe(spark):
    # Round-16 convergence probe: true exactly on star forests (unique
    # parents, no u↔v chains) — the SS∘LS fixpoint shape.
    from duckdb_parachute_spark.dedup.components import _is_star_forest

    star = spark.createDataFrame([(2, 1), (3, 1), (5, 4)], "u long, v long")
    assert _is_star_forest(star) is True
    chain = spark.createDataFrame([(3, 2), (2, 1)], "u long, v long")
    assert _is_star_forest(chain) is False
    double_parent = spark.createDataFrame([(3, 1), (3, 2)], "u long, v long")
    assert _is_star_forest(double_parent) is False
    empty = spark.createDataFrame([], "u long, v long")
    assert _is_star_forest(empty) is True


def test_recursive_cte_batch_delta_checkpoint_matches_every(spark):
    # Round-16 knob: batch-granular delta checkpointing must be value-
    # neutral for projection steps (its documented use), at every unroll.
    base = spark.createDataFrame([(1, 1)], "n long, s long")

    def step(prev):
        return prev.where(F.col("n") < 20).select(
            (F.col("n") + 1).alias("n"), (F.col("s") + F.col("n") + 1).alias("s")
        )

    want = {(r["n"], r["s"]) for r in recursive_cte(base, step, union_all=True).collect()}
    for unroll in (2, 4):
        got = {
            (r["n"], r["s"])
            for r in recursive_cte(
                base, step, union_all=True, max_unroll=unroll, delta_checkpoint="batch"
            ).collect()
        }
        assert got == want
    with pytest.raises(ValueError, match="delta_checkpoint"):
        recursive_cte(base, step, delta_checkpoint="sometimes")
    # ADVICE r16: UNION mode would silently degrade 'batch' to 'every' —
    # must refuse loudly instead
    with pytest.raises(ValueError, match="UNION ALL only"):
        recursive_cte(base, step, union_all=False, delta_checkpoint="batch")


def test_recursive_prefilter_gate_value_neutral(spark):
    # Round-16 gate: skipping the history prefilter on exactly-counted
    # small histories must not change UNION-semantics results (threshold 0
    # forces the prefilter everywhere; the default skips it here).
    base = spark.createDataFrame([(0,)], "node int")

    def step(prev):
        return prev.select(((F.col("node") + 7) % 5).alias("node"))

    kw = dict(union_all=False, max_iterations=30)
    want = {r["node"] for r in recursive_cte(base, step, prefilter_min_history_rows=0, **kw).collect()}
    got = {r["node"] for r in recursive_cte(base, step, **kw).collect()}
    assert got == want == {0, 1, 2, 3, 4}


def test_pii_scrub_sequential_counts(spark):
    from duckdb_parachute_spark.functions.textfns import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.co card 4111 1111 1111 1111 ssn 123-45-6789 ip 10.0.0.5 call +1 555-123-4567"),
            (2, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    rows = {r["id"]: r for r in pii_scrub(df, "t").collect()}
    r1 = rows[1]
    # one hit per category: the card is NOT also counted as a phone, the ssn
    # is NOT also an ip — sequential scrubbing prevents double-counting
    assert (r1["n_email"], r1["n_card"], r1["n_ssn"], r1["n_ip"], r1["n_phone"]) == (1, 1, 1, 1, 1)
    assert r1["clean_text"] == "mail <EMAIL> card <CARD> ssn <SSN> ip <IP> call <PHONE>"
    r2 = rows[2]
    assert r2["clean_text"] == "nothing sensitive here"
    assert r2["n_email"] + r2["n_card"] + r2["n_ssn"] + r2["n_ip"] + r2["n_phone"] == 0


def test_stratified_sample_exact_and_fallback(spark):
    from duckdb_parachute_spark.operators.misc import stratified_sample

    # stratum 'big' has 500 rows (gate active), 'tiny' has 3 (< k: all kept)
    df = spark.range(500).selectExpr("id", "'big' AS s").union(
        spark.range(1000, 1003).selectExpr("id", "'tiny' AS s")
    )
    out = stratified_sample(df, "s", 5, "id").collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], set()).add(r["id"])
    assert len(by_s["big"]) == 5 and len(by_s["tiny"]) == 3
    # matches the plain single-window definition (the oracle semantics)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    h = F.md5(F.concat_ws("|", F.lit("42"), F.col("id").cast("string")))
    w = Window.partitionBy("s").orderBy(h, F.col("id").cast("string"))
    want = {
        (r["id"], r["s"])
        for r in df.withColumn("rn", F.row_number().over(w)).where("rn <= 5").collect()
    }
    assert {(r["id"], r["s"]) for r in out} == want
    # deterministic across invocations
    again = {(r["id"], r["s"]) for r in stratified_sample(df, "s", 5, "id").collect()}
    assert again == {(r["id"], r["s"]) for r in out}


def test_stratified_sample_null_stratum_kept(spark):
    # review finding: NULL strata were dropped by the equi-joins; they're a
    # real partition under the single-window oracle semantics
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.operators.misc import stratified_sample

    df = spark.range(100).select(
        "id", F.when(F.col("id") % 3 == 0, None).otherwise(F.lit("a")).alias("s")
    )
    out = stratified_sample(df, "s", 4, "id").collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], []).append(r["id"])
    assert len(by_s[None]) == 4 and len(by_s["a"]) == 4


def test_pii_scrub_digit_runs_not_mangled(spark):
    # review finding: phone pattern without a leading \b ate 12-digit
    # suffixes of longer digit runs (order ids, timestamps)
    from duckdb_parachute_spark.functions.textfns import pii_scrub

    df = spark.createDataFrame(
        [(1, "order id 123456789012345 at 20260814120000 ok")], "id long, t string"
    )
    r = pii_scrub(df, "t").collect()[0]
    assert r["clean_text"] == "order id 123456789012345 at 20260814120000 ok"
    assert r["n_phone"] == 0


def test_embedding_neardup_hot_bucket_cap_and_overflow(spark):
    """Round-11: a degenerate cluster larger than max_bucket_size is capped
    out of the pair search (no quadratic blowup) and reported through the
    overflow side-channel; normal clusters are unaffected."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.dedup import (
        embedding_neardup_overflow,
        embedding_neardup_pairs,
    )

    # bucket 0: 20 identical vectors (hot), bucket 1: 3 identical (normal)
    df = spark.range(0, 23).select(
        F.col("id").alias("vid"),
        F.when(F.col("id") < 20, F.lit(0)).otherwise(F.lit(1)).alias("bkt"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("emb"),
    )
    pairs = embedding_neardup_pairs(
        df, "vid", "emb", 0.9, bucket_col="bkt", max_bucket_size=10
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert got == {(20, 21), (20, 22), (21, 22)}  # hot bucket 0 excluded
    over = embedding_neardup_overflow(df, "vid", "bkt", max_bucket_size=10).collect()
    assert len(over) == 1
    assert over[0]["bkt"] == 0 and over[0]["bucket_size"] == 20
    assert over[0]["id_sample"] == [0, 1, 2, 3, 4]
    # cap disabled: the hot bucket contributes its full quadratic set
    allp = embedding_neardup_pairs(
        df, "vid", "emb", 0.9, bucket_col="bkt", max_bucket_size=None
    )
    assert allp.count() == 20 * 19 // 2 + 3


def test_embedding_neardup_overflow_signal(spark, caplog):
    """Round-12 (ADVICE r11): the hot-bucket cap must not drop pairs
    silently — the default path warns with the over-cap bucket count,
    on_overflow='error' raises, 'ignore' stays lazy and silent."""
    import logging

    from pyspark.sql import functions as F

    from duckdb_parachute_spark.dedup import embedding_neardup_pairs

    df = spark.range(0, 23).select(
        F.col("id").alias("vid"),
        F.when(F.col("id") < 20, F.lit(0)).otherwise(F.lit(1)).alias("bkt"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("emb"),
    )
    with caplog.at_level(logging.WARNING, logger="duckdb_parachute_spark.dedup"):
        pairs = embedding_neardup_pairs(
            df, "vid", "emb", 0.9, bucket_col="bkt", max_bucket_size=10
        )
    assert any("1 bucket(s) exceed" in r.message for r in caplog.records)
    assert pairs.count() == 3
    with pytest.raises(ValueError, match="exceed max_bucket_size"):
        embedding_neardup_pairs(
            df, "vid", "emb", 0.9, bucket_col="bkt", max_bucket_size=10,
            on_overflow="error",
        )
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="duckdb_parachute_spark.dedup"):
        embedding_neardup_pairs(
            df, "vid", "emb", 0.9, bucket_col="bkt", max_bucket_size=10,
            on_overflow="ignore",
        ).count()
    assert not [r for r in caplog.records if "exceed" in r.message]


def test_recursive_cte_eager_deltas_equivalent(spark):
    """Round 13 (VERDICT r12 perf-weak #1 experiment): eager_deltas=True
    materializes batch deltas at creation so deep unrolls avoid the O(k²)
    nested broadcast re-execution — results must be IDENTICAL to the lazy
    default in both union modes (the measured trade is in BASELINE.md
    §round-13; the default stays lazy/depth-2)."""
    base = spark.createDataFrame([(1, 1)], "n int, f int")

    def fact_step(prev):
        return prev.where(F.col("n") < 7).select(
            (F.col("n") + 1).alias("n"), (F.col("f") * (F.col("n") + 1)).alias("f")
        )

    lazy = recursive_cte(base, fact_step, union_all=True)
    eager = recursive_cte(base, fact_step, union_all=True, eager_deltas=True, max_unroll=8)
    assert {tuple(r) for r in lazy.collect()} == {tuple(r) for r in eager.collect()}

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (2, 3)], "src int, dst int")
    b2 = spark.createDataFrame([(0,)], "node int")

    def gstep(prev):
        return edges.join(F.broadcast(prev), edges.src == prev.node).select(
            F.col("dst").alias("node")
        )

    lazy2 = recursive_cte(b2, gstep, union_all=False, max_iterations=10)
    eager2 = recursive_cte(
        b2, gstep, union_all=False, max_iterations=10, eager_deltas=True, max_unroll=6
    )
    assert {r["node"] for r in lazy2.collect()} == {r["node"] for r in eager2.collect()} == {0, 1, 2, 3}
