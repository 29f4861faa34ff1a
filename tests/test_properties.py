"""Property-based cross-engine checks (SURVEY §5d: type edges — overflow,
nulls, decimal scale) using hypothesis. Each example renders a VALUES row set
and compares Spark against DuckDB on the same SQL text.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DEC = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@pytest.fixture(scope="module")
def oracle():
    return duckdb.connect()


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DEC, min_size=1, max_size=8))
def test_decimal_sum_exact(spark, oracle, values):
    """Exact DECIMAL(9,2) sums agree bit-for-bit in any order."""
    rows = ", ".join(f"(CAST({v} AS DECIMAL(9,2)))" for v in values)
    sql = f"SELECT CAST(sum(x) AS DECIMAL(19,2)) AS s FROM (VALUES {rows}) t(x)"
    assert spark.sql(sql).head()[0] == oracle.sql(sql).fetchone()[0]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1) | st.none(), min_size=1, max_size=8))
def test_bigint_agg_with_nulls(spark, oracle, values):
    """sum/count/min/max over BIGINT with NULLs agree (NULL-skipping rules)."""
    rows = ", ".join(f"(CAST({'NULL' if v is None else v} AS BIGINT))" for v in values)
    sql = (
        f"SELECT CAST(sum(x) AS BIGINT) AS s, count(x) AS c, min(x) AS mn, max(x) AS mx "
        f"FROM (VALUES {rows}) t(x)"
    )
    assert tuple(spark.sql(sql).head()) == oracle.sql(sql).fetchone()


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.decimals(min_value=Decimal("0.01"), max_value=Decimal("9999.99"), places=2, allow_nan=False))
def test_decimal_mult_precision_rules(spark, oracle, v):
    """DECIMAL(12,2)*(4,2) precision math matches across engines after the
    shared cast discipline (the same rule the money queries rely on)."""
    sql = (
        f"SELECT CAST(CAST({v} AS DECIMAL(12,2)) * CAST(0.07 AS DECIMAL(4,2)) "
        f"AS DECIMAL(18,4)) AS r"
    )
    assert spark.sql(sql).head()[0] == oracle.sql(sql).fetchone()[0]


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=12),
    st.sampled_from([1.0, 2.5, 7.0]),
)
def test_inequality_join_property(spark, pairs, bin_width):
    """Bucket-replicated theta join == naive inequality join for any inputs
    and bin width (operators/rangejoin.inequality_join)."""
    from duckdb_parachute_spark.operators.rangejoin import inequality_join

    a = spark.createDataFrame(
        [(i, float(x)) for i, (x, _) in enumerate(pairs)], "ka long, xa double"
    )
    b = spark.createDataFrame(
        [(j, float(y)) for j, (_, y) in enumerate(pairs)], "kb long, xb double"
    )
    fast = sorted((r.ka, r.kb) for r in inequality_join(a, b, a.xa, b.xb, bin_width).collect())
    naive = sorted((r.ka, r.kb) for r in a.join(b, a.xa < b.xb).collect())
    assert fast == naive


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        # beyond Latin-1: Latin Extended (čČāĀ), Greek (ώΏ), Cyrillic (ёЁ),
        # a decomposed combining acute, and CJK passthrough — the NOACCENT
        # key must agree with DuckDB's NFD-based collation on all of them.
        st.text(alphabet="aAbBcC éÉàÀčČāĀñÑüÜώΏёЁ北" + "́", min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_collation_key_matches_duckdb(spark, oracle, values):
    """NOCASE.NOACCENT grouping cardinality agrees with DuckDB's COLLATE
    (functions/collate.collation_key vs the real collation)."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.functions.collate import collation_key

    rows = ", ".join("('" + v.replace("'", "''") + "')" for v in values)
    d = oracle.sql(
        f"SELECT count(*) FROM (SELECT 1 FROM (VALUES {rows}) t(s) GROUP BY s COLLATE NOCASE.NOACCENT)"
    ).fetchone()[0]
    df = spark.createDataFrame([(v,) for v in values], "s string")
    s = df.groupBy(collation_key(F.col("s"), "NOCASE.NOACCENT")).count().count()
    assert s == d


def test_strip_accents_full_plane_parity(spark, oracle):
    """strip_accents matches DuckDB's utf8proc semantics across EVERY plane
    (round-6 VERDICT item 9): a systematic sweep of BMP + supplementary
    codepoints plus the known-hard cases — Mc/Me marks, all-marks
    decompositions, CJK compatibility singletons, astral base+mark folds,
    marks newer than utf8proc's Unicode tables (must pass through)."""
    samples = []
    for cp in range(0x20, 0x10000, 61):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        samples.append("x" + chr(cp) + "y")
    for cp in range(0x10000, 0x110000, 331):
        samples.append("x" + chr(cp) + "y")
    samples += [
        "café",  # BMP precomposed
        "café",  # BMP decomposed
        "का",  # Devanagari Mc vowel sign
        "a⃝b",  # Me enclosing mark
        "ো",  # all-marks NFD (two Mc) — strips entirely
        "࣌",  # Unicode-14 mark unknown to utf8proc — passes through
        "車",  # CJK compat singleton -> U+8ECA
        "\U0002F86Cz",  # astral CJK compat singleton
        "\U0001109A\U000110AB",  # astral precomposed base+mark folds
        "a\U00010A01b",  # standalone astral mark — deleted
        "\U0001D15E",  # astral with Mc in decomposition
        "\U0001F600 ok",  # astral, no decomposition — unchanged
    ]
    from duckdb_parachute_spark.functions import metrics as M
    from pyspark.sql import functions as F

    expected = [oracle.execute("SELECT strip_accents(?)", [s]).fetchone()[0] for s in samples]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, s string"
    ).withColumn("o", M.strip_accents(F.col("s")))
    got = {r["i"]: r["o"] for r in df.collect()}
    bad = [
        (samples[i], expected[i], got[i]) for i in range(len(samples)) if expected[i] != got[i]
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"
