"""Workload registry: every implemented operator/query from SURVEY.md §2.

Each entry pairs a Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string that DuckDB can execute over the
same parquet files (or ``None`` for ops that aren't SQL-expressible — the
verification driver then records a weaker rows-only check).

Determinism & hash-matching rules (FIXTURES.md §1 type-bridging note):
- money aggregates go through exact DECIMAL arithmetic with the *same* casts
  on both sides, so results are bit-identical;
- double aggregates (avg/stddev/corr/…) are rounded to a fixed scale chosen
  so the two engines' floating-point noise (≤ ~1e-8 relative) cannot flip the
  rounded digit;
- every computed column is aliased identically in Spark and SQL;
- ORDER-BY+LIMIT queries always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for the DuckDB oracle, or None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def _hashsafe_oracle(oracle: str, cast_double: tuple, join_arrays: tuple) -> str:
    """Wrap a DuckDB oracle so its output representation matches Spark's.

    The verification driver hashes cell *string* representations: a Spark
    DECIMAL(18,2) arrives in pandas as Decimal('253942.00') while DuckDB's
    .df() yields float64 253942.0 — same value, different str() — and array
    cells crash pandas' sort entirely. So every query projects a hash-safe
    boundary: exact DECIMAL arithmetic inside, cast to DOUBLE at the very end
    (verified bit-identical across both engines over 162k real money sums),
    and arrays joined to strings. DuckDB's * REPLACE star modifier keeps
    column order identical to the inner query.
    """
    reps = [f"CAST({c} AS DOUBLE) AS {c}" for c in cast_double]
    reps += [f"array_to_string({c}, ',') AS {c}" for c in join_arrays]
    # Multi-statement oracles (e.g. CREATE TEMP MACRO …; SELECT …) wrap only
    # the final probe statement — DDL can't sit inside a subquery. Statement
    # split is the last ';' OUTSIDE single-quoted literals (a ';' inside a
    # string constant must not truncate the probe).
    split_at = -1
    in_lit = False
    for i, ch in enumerate(oracle):
        if ch == "'":
            in_lit = not in_lit
        elif ch == ";" and not in_lit:
            split_at = i
    prefix = ""
    if split_at >= 0:
        prefix = oracle[:split_at] + ";\n"
        oracle = oracle[split_at + 1 :]
    return f"{prefix}SELECT * REPLACE ({', '.join(reps)}) FROM (\n{oracle}\n) AS _hashsafe"


def query(
    name: str,
    oracle: str | None = None,
    cast_double: tuple | list = (),
    join_arrays: tuple | list = (),
):
    """Register a workload query. Decorated fn: (spark, sf_dir) -> DataFrame.

    ``cast_double`` / ``join_arrays`` name output columns re-projected at the
    hash-safe boundary (see _hashsafe_oracle) on BOTH the Spark and oracle
    side, so the two engines' pandas string representations are identical.
    """

    def deco(fn):
        out_fn, out_oracle = fn, oracle
        if cast_double or join_arrays:
            import functools

            from pyspark.sql import functions as F

            @functools.wraps(fn)
            def out_fn(spark, sf_dir):  # noqa: F811
                df = fn(spark, sf_dir)
                for c in cast_double:
                    df = df.withColumn(c, F.col(c).cast("double"))
                for c in join_arrays:
                    df = df.withColumn(
                        c, F.array_join(F.transform(F.col(c), lambda x: x.cast("string")), ",")
                    )
                return df

            if oracle is not None:
                out_oracle = _hashsafe_oracle(oracle, tuple(cast_double), tuple(join_arrays))
        QUERIES[name] = QueryDef(name, out_fn, out_oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


# The verification driver grades the first 50 registry entries per round.
# Rotate coverage across rounds so every query eventually gets a recorded
# hash check: queries NOT yet graded green in any prior round's
# CORRECTNESS_r*.json lead (new queries and past regressions, so their
# status lands in the next CORRECTNESS file); already-green queries follow
# in natural order.


def _graded_green() -> tuple[set[str], int]:
    """(names hash-graded green in any prior round, latest round number)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    latest = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            latest = max(latest, int(m.group(1)))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001 - unreadable file: just skip
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match") is True:
                green.add(name)
    return green, latest


def load_all() -> dict[str, QueryDef]:
    """Import every workload module (side effect: registry population)."""
    from duckdb_parachute_spark.workload import (  # noqa: F401
        aggregates,
        clickbench,
        dedup,
        dialect,
        job,
        joins,
        jsonops,
        macros,
        pipelines,
        scalarfns,
        setops,
        similarity,
        surface,
        system,
        textops,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpcds5,
        tpch,
        windows,
    )

    green, latest_round = _graded_green()
    fresh = [n for n in QUERIES if n not in green]
    tail = [n for n in QUERIES if n in green]
    # Never-graded queries lead so their status lands in the next CORRECTNESS
    # file. The already-green tail ROTATES by 50 slots per recorded round:
    # the driver only grades the first 50 entries, so a stable order would
    # re-grade the same green queries forever and a regression elsewhere
    # would go unseen. With the shift, every query is re-checked every
    # ~len/50 rounds.
    if tail:
        k = (50 * latest_round) % len(tail)
        tail = tail[k:] + tail[:k]
    ordered = {n: QUERIES[n] for n in fresh}
    for n in tail:
        ordered[n] = QUERIES[n]
    return ordered
