"""DuckDB-oracle comparison harness.

Modeled on the reference's own correctness strategy (SURVEY §5): run the same
query through an independent engine and compare results order-insensitively —
the reference uses golden answer files + statement verifiers
(reference: src/verification/*, test/sqlite/sqllogic_test_runner.cpp);
we use the in-process DuckDB wheel as the oracle, exactly like the
verification driver does for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class OracleSession:
    """A DuckDB connection with the driver's table views pre-registered."""

    def __init__(self, sf_dir: str):
        import duckdb

        self.con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                self.con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )

    def sql(self, text: str) -> pd.DataFrame:
        return self.con.sql(text).df()


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    errors: list[str] = field(default_factory=list)

    def __str__(self):
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}"
        for e in self.errors[:5]:
            msg += f"\n       {e}"
        return msg


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — the same
    order-insensitive shape the driver hashes."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            # Engines emit identical doubles after our in-query rounding;
            # repr() keeps full precision so real differences surface.
            return repr(v)
        if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
        if v.__class__.__name__ == "Decimal":
            # Mirror the driver's str()-level strictness: Decimal('253942.00')
            # must NOT silently equal float 253942.0 — queries are required to
            # cast decimals to double at the output boundary instead
            # (see workload/__init__.py _hashsafe_oracle).
            return str(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if v.__class__.__name__ in ("datetime", "date"):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, bool) or v.__class__.__name__ == "bool_":
            return "true" if v else "false"
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        return str(v)

    out = df.applymap(norm) if not hasattr(df, "map") else df.map(norm)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))
    if sorted(map(str.lower, spark_pdf.columns)) != sorted(map(str.lower, oracle_pdf.columns)):
        res.ok = False
        res.errors.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.errors.append("row count mismatch")
        return res
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    neq = (a != b)
    if neq.any().any():
        res.ok = False
        for col in a.columns:
            bad = neq[col]
            if bad.any():
                i = bad.idxmax()
                res.errors.append(
                    f"value mismatch col={col} ({int(bad.sum())} cells) e.g. row {i}: "
                    f"spark={a[col][i]!r} oracle={b[col][i]!r}"
                )
    return res


def run_compare(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    """Run every registered workload query against the DuckDB oracle."""
    from duckdb_parachute_spark.workload import load_all

    qs = load_all()
    oracle = OracleSession(sf_dir)
    results = []
    for name, qd in qs.items():
        if names and name not in names:
            continue
        try:
            spark_pdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, -1, -1, [f"spark error: {e}"]))
            continue
        if qd.oracle is None:
            ok = len(spark_pdf) >= 0
            results.append(CompareResult(name, ok, len(spark_pdf), -1, ["(rows-only check)"]))
            continue
        try:
            oracle_pdf = oracle.sql(qd.oracle)
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, len(spark_pdf), -1, [f"oracle error: {e}"]))
            continue
        results.append(compare_frames(name, spark_pdf, oracle_pdf))
    return results
