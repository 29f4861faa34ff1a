"""Exact fixed-point aggregation over double-encoded money columns.

The driver tables store 2-decimal money (prices, discounts, balances) as
DOUBLE; the reference casts them to DECIMAL and aggregates exactly — DuckDB's
decimal aggregates run on native int64/int128 ("hugeint") units internally
(reference: src/common/types/decimal.cpp, sum on hugeint in
extension/core_functions/aggregate/distributive/sum.cpp). Spark's
sum(DECIMAL) instead pays a per-value double→BigDecimal cast + object-math in
the partial aggregate, ~3× slower in whole-stage codegen.

This module mirrors DuckDB's representation explicitly: convert each value to
integer units (cents) with a pure-double rounding that stays inside codegen,
sum LONGs, and rescale to DECIMAL once per GROUP at the end. Bit-identical to
the cast-to-DECIMAL-then-sum path for 2-decimal data (verified against the
DuckDB oracle over the full lineitem table).

Preconditions / bounds:
- Inputs are doubles that round-trip a 2-decimal literal (money). For such
  values `floor(x*100 + 0.5)` equals SQL's HALF_UP cast for either sign,
  because x*100 sits within 1 ulp of an integer — the .xx5 tie case cannot
  arise. Arbitrary doubles (true ties) would round differently; don't use
  this for non-money data.
- LONG sums bound the scale: unit sums overflow past 9.2e18 units
  (9.2e16 dollars at scale 2, 9.2e12 at the 1e-6 charge scale). ANSI mode
  (session default) raises on overflow rather than wrapping — at scales
  beyond that, fall back to the DECIMAL-sum spelling of the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 2) -> Column:
    """Value × 10^scale as LONG, rounding half-up — the integer-unit encoding
    DuckDB uses inside its decimal aggregates."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("long")


def units_to_decimal(unit_sum: Column, frac_digits: int, out: str) -> Column:
    """Rescale an integer-unit sum to its DECIMAL surface type (once per
    group — the only non-integer step)."""
    return (unit_sum.cast("decimal(27,0)") / (10**frac_digits)).cast(out)


def sum_money(col: Column | str, out: str = "decimal(18,2)") -> Column:
    """sum(CAST(x AS DECIMAL(12,2))) computed on long cents."""
    return units_to_decimal(F.sum(cents(col)), 2, out)


def avg_money(col: Column | str, out: str = "double") -> Column:
    """avg over exact cent sums: sum_cents / 100 / count, cast to `out`."""
    return (F.sum(cents(col)).cast("double") / F.lit(100.0) / F.count(F.lit(1))).cast(out)


def disc_price_units(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """extendedprice * (1 - discount) in 1e-4 integer units (both factors are
    2-decimal money: cents × (100 - cents))."""
    return cents(price) * (F.lit(100) - cents(disc))


def sum_disc_price(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    out: str = "decimal(22,4)",
) -> Column:
    """sum(price * (1 - discount)) with exact 4-decimal semantics."""
    return units_to_decimal(F.sum(disc_price_units(price, disc)), 4, out)


def sum_charge(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    tax: str = "l_tax",
    out: str = "decimal(25,6)",
) -> Column:
    """sum(price * (1-discount) * (1+tax)) in 1e-6 units (see module
    docstring for the overflow bound at this scale)."""
    units = disc_price_units(price, disc) * (F.lit(100) + cents(tax))
    return units_to_decimal(F.sum(units), 6, out)
