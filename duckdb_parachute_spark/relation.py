"""Relation: the PyRelation-compatible fluent API over Spark DataFrames.

Reference: tools/pythonpkg/src/pyrelation/initialize.cpp exposes ~150 methods
on DuckDB's Relation (filter/project/aggregate/join/order/limit/distinct/
setops/apply/map/describe + per-aggregate shortcuts + writers). SURVEY §3.2:
"the DataFrame API is this, verbatim" — so Relation is a thin veneer that
(a) accepts DuckDB-style SQL-expression strings where PyRelation does,
(b) returns Relation so chains compose, and (c) adds the reference's
convenience aggregates. The wrapped DataFrame stays lazy; Catalyst optimizes
the whole chain.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Relation:
    """Lazy relational expression (reference src/main/relation.cpp:224 Execute
    / Bind lifecycle ≈ DataFrame lazy plan + action)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- core algebra (PyRelation names) ------------------------------------
    def filter(self, cond) -> "Relation":
        return Relation(self.df.filter(cond if not isinstance(cond, str) else F.expr(cond)))

    where = filter

    def project(self, *exprs: str) -> "Relation":
        return Relation(self.df.selectExpr(*exprs) if all(isinstance(e, str) for e in exprs) else self.df.select(*exprs))

    select = project

    def aggregate(self, aggr_expr: str, group_expr: str = "") -> "Relation":
        """PyRelation.aggregate('sum(x) AS s, count(*) n', 'k1, k2')."""
        aggs = [F.expr(e) for e in _split_exprs(aggr_expr)]
        if group_expr:
            groups = [F.expr(g) for g in _split_exprs(group_expr)]
            return Relation(self.df.groupBy(*groups).agg(*aggs))
        return Relation(self.df.agg(*aggs))

    agg = aggregate

    def join(self, other: "Relation", condition, how: str = "inner") -> "Relation":
        cond = F.expr(condition) if isinstance(condition, str) else condition
        how = {"outer": "full_outer", "anti": "left_anti", "semi": "left_semi"}.get(how, how)
        if how == "cross":
            return Relation(self.df.crossJoin(other.df))
        return Relation(self.df.join(other.df, cond, how))

    def cross(self, other: "Relation") -> "Relation":
        return Relation(self.df.crossJoin(other.df))

    def order(self, order_expr: str) -> "Relation":
        return Relation(self.df.orderBy(*[F.expr(e) for e in _split_exprs(order_expr)]))

    sort = order

    def limit(self, n: int, offset: int = 0) -> "Relation":
        df = self.df.offset(offset) if offset else self.df
        return Relation(df.limit(n))

    def distinct(self) -> "Relation":
        return Relation(self.df.distinct())

    unique = distinct

    # -- set operations ------------------------------------------------------
    def union(self, other: "Relation") -> "Relation":
        """PyRelation.union is UNION ALL (reference setop semantics)."""
        return Relation(self.df.unionAll(other.df))

    def except_(self, other: "Relation") -> "Relation":
        return Relation(self.df.exceptAll(other.df))

    def intersect(self, other: "Relation") -> "Relation":
        return Relation(self.df.intersectAll(other.df))

    # -- per-aggregate shortcuts (reference initialize.cpp shortcut list) ----
    def sum(self, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"sum({col}) AS sum_{col}", groups)

    def min(self, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"min({col}) AS min_{col}", groups)

    def max(self, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"max({col}) AS max_{col}", groups)

    def mean(self, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"avg({col}) AS mean_{col}", groups)

    avg = mean

    def count(self, col: str = "*", groups: str = "") -> "Relation":
        return self.aggregate(f"count({col}) AS count_{'star' if col == '*' else col}", groups)

    def median(self, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"median({col}) AS median_{col}", groups)

    def quantile(self, col: str, q: float, groups: str = "") -> "Relation":
        return self.aggregate(f"percentile({col}, {q}) AS quantile_{col}", groups)

    def value_counts(self, col: str) -> "Relation":
        return self.aggregate(f"{col}, count(*) AS count", col)

    def describe(self) -> "Relation":
        return Relation(self.df.summary())

    # -- window shortcuts (reference row_number/rank/lag/... shortcuts) ------
    def row_number(self, over: str, projected: str = "*") -> "Relation":
        return self.project(*_split_exprs(projected), f"row_number() OVER ({over}) AS row_number")

    def rank(self, over: str, projected: str = "*") -> "Relation":
        return self.project(*_split_exprs(projected), f"rank() OVER ({over}) AS rank")

    def lag(self, col: str, over: str, offset: int = 1, projected: str = "*") -> "Relation":
        return self.project(*_split_exprs(projected), f"lag({col}, {offset}) OVER ({over}) AS lag_{col}")

    def lead(self, col: str, over: str, offset: int = 1, projected: str = "*") -> "Relation":
        return self.project(*_split_exprs(projected), f"lead({col}, {offset}) OVER ({over}) AS lead_{col}")

    # -- table-in/table-out --------------------------------------------------
    def map(self, fn: Callable, schema: str) -> "Relation":
        """rel.map(fn) (reference pyrelation.cpp:1559 + PhysicalTableInOut) →
        mapInPandas: fn(iterator[pd.DataFrame]) -> iterator[pd.DataFrame]."""
        return Relation(self.df.mapInPandas(fn, schema))

    def apply(self, fn_name: str, col: str, groups: str = "") -> "Relation":
        return self.aggregate(f"{fn_name}({col}) AS {fn_name}_{col}", groups)

    # -- materialization (reference Execute/fetch surface) -------------------
    def to_df(self):
        return self.df.toPandas()

    df_ = to_df  # PyRelation .df()

    def arrow(self):
        """Arrow materialization (reference src/function/table/arrow.cpp /
        ArrowQueryResult): PySpark 4's toArrow() ships Arrow record batches
        from the JVM without a pandas detour; the pandas fallback covers
        older sessions."""
        try:
            return self.df.toArrow()
        except AttributeError:
            import pyarrow as pa

            return pa.Table.from_pandas(self.df.toPandas())

    def fetchall(self) -> list:
        return self.df.collect()

    def fetchone(self):
        return self.df.head()

    # -- writers (reference write_csv/write_parquet/to_table) ----------------
    def to_parquet(self, path: str, **opts) -> None:
        from duckdb_parachute_spark.sources import copy_to

        copy_to(self.df, path, fmt="parquet", **opts)

    write_parquet = to_parquet

    def to_csv(self, path: str, **opts) -> None:
        from duckdb_parachute_spark.sources import copy_to

        copy_to(self.df, path, fmt="csv", header=True, **opts)

    write_csv = to_csv

    def to_table(self, name: str) -> None:
        self.df.write.saveAsTable(name)

    def create_view(self, name: str) -> "Relation":
        self.df.createOrReplaceTempView(name)
        return self

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode=mode)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def __repr__(self) -> str:  # pragma: no cover
        return f"Relation({self.df.schema.simpleString()})"


def _split_exprs(s: str | Sequence) -> list:
    """Split 'a, sum(b) AS x' on top-level commas (not inside parens)."""
    if not isinstance(s, str):
        return list(s)
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [e for e in out if e]
