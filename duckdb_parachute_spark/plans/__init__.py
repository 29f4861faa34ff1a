"""Plan-quality audit: make the 100 TB posture machine-checkable.

The reference gets its physical strategies from the optimizer passes in
src/optimizer/ (SURVEY §4); on Spark the equivalents are Catalyst/AQE
behaviors that can silently regress (a filter that stops reaching the scan, a
dimension that stops broadcasting, an extra shuffle). This module extracts
those properties from `df.explain("formatted")` output so tests can pin them:

    stats = plan_stats(df)
    assert stats.shuffles <= 1 and stats.pushed_filters

These assertions run in CI (tests/test_plans.py) for the headline queries, so
plan regressions fail the build, not the benchmark.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (mode as in df.explain)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@dataclass
class PlanStats:
    shuffles: int = 0          # data-moving Exchange (hashpartitioning/range)
    broadcasts: int = 0        # BroadcastExchange
    scans: int = 0
    pushed_filters: bool = False
    read_columns: list[int] = field(default_factory=list)  # cols per scan
    codegen_spans: int = 0
    text: str = ""


def plan_stats(df: DataFrame) -> PlanStats:
    text = physical_plan(df)
    s = PlanStats(text=text)
    # formatted mode prints each operator in the tree AND as a "(N) Op"
    # detail header — count the numbered detail headers (unique per operator)
    s.broadcasts = len(re.findall(r"^\(\d+\) BroadcastExchange\b", text, re.M))
    s.shuffles = len(re.findall(r"^\(\d+\) Exchange\b", text, re.M))
    s.scans = len(re.findall(r"^\(\d+\) Scan parquet\b", text, re.M))
    # codegen span ids only appear in simple mode ("*(N) Op")
    simple = physical_plan(df, mode="simple")
    s.codegen_spans = len(set(re.findall(r"\*\((\d+)\)", simple)))
    s.pushed_filters = bool(re.search(r"PushedFilters: \[[^\]]+\]", text))
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        s.read_columns.append(len(cols))
    return s


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    min_broadcasts: int | None = None,
    require_pushed_filters: bool = False,
    max_scan_columns: int | None = None,
) -> PlanStats:
    """Assert structural properties of the physical plan; returns the stats
    (with .text for debugging) so tests can add bespoke checks."""
    s = plan_stats(df)
    if max_shuffles is not None and s.shuffles > max_shuffles:
        raise AssertionError(f"plan has {s.shuffles} shuffles (max {max_shuffles}):\n{s.text}")
    if min_broadcasts is not None and s.broadcasts < min_broadcasts:
        raise AssertionError(f"plan has {s.broadcasts} broadcasts (min {min_broadcasts}):\n{s.text}")
    if require_pushed_filters and not s.pushed_filters:
        raise AssertionError(f"no pushed filters reached the scan:\n{s.text}")
    if max_scan_columns is not None and s.read_columns and max(s.read_columns) > max_scan_columns:
        raise AssertionError(
            f"a scan reads {max(s.read_columns)} columns (max {max_scan_columns}) — "
            f"column pruning regressed:\n{s.text}"
        )
    return s
