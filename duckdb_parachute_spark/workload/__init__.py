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


# Names never driver-graded as of the START of round 9 (see load_all): these
# must occupy the first 48 of the 50 graded slots regardless of what else is
# registered later in round 9.
_R9_GRADE_FIRST = frozenset(
    [
        "dialect_star_replace",
        "dialect_columns_regex",
        "dialect_struct_literal",
        "dialect_list_comprehension",
        "job_i65_or_with_cregion",
        "job_i66_brand_balance_window",
        "job_i67_widget_status_region",
        "job_i68_sevenway_kitchen_sink",
        "job_i69_gizmo_priceband",
        "job_i70_ring_cheap_orders",
        "job_i71_disc_zero_region",
        "job_i72_flag_n_bal_floor",
        "job_i73_bolt_ship_window_seg",
        "job_i74_type_standard_cnations",
        "job_i75_or_three_groups",
        "job_i76_anvil_everything",
        "job_i77_lone_brand",
        "job_i78_lone_widest_like",
        "job_i79_lone_priceband",
        "job_i80_lone_discband",
        "job_i81_lone_status_f",
        "job_i82_lone_ship_quarter",
        "job_i83_lone_cregion",
        "job_i84_lone_qty_floor",
        "job_i85_brand_type_pair",
        "job_i86_window_qty_pair",
        "job_i87_seg_ship_pair",
        "job_i88_prio_priceband_pair",
        "job_i89_nationset_discband",
        "job_i90_region_qty_bal",
        "job_i91_cnations_brand",
        "job_i92_status_p_window",
        "job_i93_or_like_vs_window",
        "job_i94_or_numeric_bands",
        "job_i95_deep_or_and_mix",
        "job_i96_triple_like_chain",
        "job_i97_everything_or_caps",
        "job_i98_both_bal_cregion",
        "job_i99_final_kitchen_sink",
        "join_bucketed_big_big",
        "stream_outer_join_flush",
        "stream_foreachbatch_exactly_once",
        "src_sniff_csv_report",
        "src_export_import_db",
        "src_replacement_scan",
        "src_ordered_copy",
        "dml_constraint_checks",
        "stream_full_outer_join",
    ]
)


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
    # Round-9 ordering pin: exactly 48 queries had never been driver-graded
    # at the start of round 9 (the r8 JOB tail, the r8/r9 surface upgrades,
    # streaming additions, and the r9 dialect rewrites). They fit the 50-slot
    # sample ONLY if queries added later this round do not register ahead of
    # them, so sort backlog-before-new within the fresh block. Harmless once
    # graded (they leave `fresh` entirely).
    fresh.sort(key=lambda n: n not in _R9_GRADE_FIRST)
    tail = [n for n in QUERIES if n in green]
    # Never-graded queries lead so their status lands in the next CORRECTNESS
    # file. The already-green tail ROTATES by 50 slots per recorded round:
    # the driver only grades the first 50 entries, so a stable order would
    # re-grade the same green queries forever and a regression elsewhere
    # would go unseen. With the shift, every query is re-checked every
    # ~len/50 rounds.
    # Round 15 (VERDICT r14 next #7): the blind rotation alone can leave a
    # perf-carrying headliner ungraded for many rounds, so a small pinned
    # regrade block rides every round's sample right after the fresh
    # queries — the scale-critical dedup/similarity/join headliners plus
    # rows exercising modules that change often (collation root spec,
    # holistic scale paths). ~10 of the 50 slots; the remaining ~40 keep
    # rotating through the full registry.
    regrade = [
        n
        for n in (
            "dedup_cluster_canonical",
            "dedup_minhash_pairs",
            "sim_ivf_pruned_probe",
            "join_asof_purchase",
            "join_bucketed_big_big",
            "h2o_join_big_big",
            "tpcds_q67_rollup_topk",
            "dialect_holistic_agg",
            "dialect_holistic_approx",
            "collate_locale_root_rank",
        )
        if n in QUERIES and n not in fresh
    ]
    if tail:
        k = (50 * latest_round) % len(tail)
        tail = tail[k:] + tail[:k]
    ordered = {n: QUERIES[n] for n in fresh}
    for n in regrade:
        ordered[n] = QUERIES[n]
    for n in tail:
        if n not in ordered:
            ordered[n] = QUERIES[n]
    return ordered
