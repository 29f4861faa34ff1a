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
