"""duckdb_parachute_spark — a PySpark-native analytics engine.

A brand-new engine reproducing the query semantics and capability surface of
the reference (stoianmihail/duckdb-parachute, a DuckDB source snapshot — see
SURVEY.md) on top of Apache Spark: DataFrame/SQL plans optimized by Catalyst,
shuffle-aware operators designed for 100 TB scale, plus training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing).

Nothing here ports the reference's C++ execution engine; the reference defines
WHAT to compute (operator inventory, SQL semantics, test surface), and Spark
primitives define HOW.
"""

from duckdb_parachute_spark.session import get_session
from duckdb_parachute_spark.catalog import Catalog, load_tables, TABLES

__version__ = "0.1.0"

__all__ = ["get_session", "Catalog", "load_tables", "TABLES", "__version__"]
