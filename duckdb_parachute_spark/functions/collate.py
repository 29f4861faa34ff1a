"""Collations (SURVEY §1.2): NOCASE / NOACCENT collation keys.

Reference: DuckDB ships NOCASE and NOACCENT as built-in collations
(src/function/scalar/string/ — registered in CollationBinding) plus the ICU
locale collations (extension/icu/icu_extension.cpp:119 ``icu_collate_*``).
A collation in DuckDB rewrites comparisons to run on a *collation key*
derived from the string.

Spark has no COLLATE clause (pre-4.0 collation support is not in this
build), so the same semantics are expressed explicitly: ``collation_key``
derives the comparison key and the caller groups / filters / sorts on it —
which is literally what the reference does under the hood. Locale-aware ICU
collations (icu_collate_de etc.) are out of scope: they need ICU tables that
neither this container nor vanilla Spark ships; codepoint order is the
documented default (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_parachute_spark.functions.metrics import strip_accents


def collation_key(col: Column | str, spec: str) -> Column:
    """Comparison key for a collation spec — chainable like DuckDB's
    dot-combined ``NOCASE.NOACCENT``."""
    c = F.col(col) if isinstance(col, str) else col
    for part in spec.split("."):
        p = part.strip().upper()
        if p == "NOCASE":
            c = F.lower(c)
        elif p == "NOACCENT":
            c = strip_accents(c)
        elif p in ("BINARY", "C", "POSIX", ""):
            pass
        else:
            raise ValueError(f"unsupported collation: {part!r} (NOCASE/NOACCENT/BINARY)")
    return c


def collated_equals(a: Column | str, b: Column | str, spec: str) -> Column:
    """a = b under the collation — DuckDB's ``a COLLATE spec = b``."""
    return collation_key(a, spec) == collation_key(b, spec)
