"""Scalar gap-fillers: reference functions Spark lacks as natives (SURVEY §2.9
gap lists), composed from built-in expressions (never row-at-a-time UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket(width_seconds: int, ts: Column) -> Column:
    """DuckDB time_bucket(INTERVAL, ts) (reference
    extension/core_functions/scalar/date/functions.json): floor-align a
    timestamp to a fixed-width bucket. TZ-free integer arithmetic on the NTZ
    epoch — equivalent to Spark's window() start but usable as a scalar."""
    sec = F.unix_micros(ts.cast("timestamp")) / F.lit(1_000_000)
    bucket = (F.floor(sec / width_seconds) * width_seconds).cast("long")
    return F.timestamp_seconds(bucket).cast("timestamp_ntz")


def hamming_distance(a: Column, b: Column) -> Column:
    """hamming(a, b) over equal-length strings (reference
    src/function/scalar/string/hamming.cpp): count of differing positions."""
    pairs = F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: (x != y).cast("int"))
    return F.aggregate(pairs, F.lit(0), lambda acc, v: acc + v)


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Token-set Jaccard similarity (reference jaccard.cpp works on character
    sets; the token variant is what dedup pipelines use)."""
    sa, sb = F.array_distinct(F.split(a, r"\s+")), F.array_distinct(F.split(b, r"\s+"))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    return inter / (F.size(sa) + F.size(sb) - F.size(F.array_intersect(sa, sb)))


# -- ENUM emulation (SURVEY §1.2: ENUM → string + helpers) -------------------
# Reference: enum_first/enum_last/enum_code/enum_range
# (extension/core_functions/scalar/enum/functions.json). Spark has no enum
# type; the emulation keeps the column as string (dictionary-encoded in
# parquet anyway) and derives the enum operations from the declared value
# list — the list is part of the schema contract, exactly like the
# reference's CREATE TYPE.


def enum_code(col, values: list[str]):
    """0-based code of the value in the declared enum order (reference
    enum_code; returns NULL for non-members like an invalid cast would)."""
    pos = F.array_position(F.array(*[F.lit(v) for v in values]), col)
    return F.when(pos > 0, (pos - 1).cast("int"))


def enum_first(values: list[str]):
    return F.lit(values[0])


def enum_last(values: list[str]):
    return F.lit(values[-1])


def enum_range(values: list[str]):
    return F.array(*[F.lit(v) for v in values])


def sequence_ids(df, order_by, name: str = "seq_id"):
    """nextval-style contiguous 1-based ids (reference
    src/function/scalar/sequence/): distributed engines cannot hand out a
    global counter cheaply — the deterministic equivalent is row_number over
    an explicit total order (one shuffle). For sparse-but-parallel ids use
    `unique_ids` instead."""
    from pyspark.sql import Window

    return df.withColumn(name, F.row_number().over(Window.orderBy(*order_by)))


def unique_ids(df, name: str = "uid"):
    """Parallel-safe sparse ids (monotonically_increasing_id): unique and
    increasing per partition, NOT contiguous — document per reference gap."""
    return df.withColumn(name, F.monotonically_increasing_id())
