"""Scalar gap-fillers: reference functions Spark lacks as natives (SURVEY §2.9
gap lists), composed from built-in expressions (never row-at-a-time UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: DuckDB/PostgreSQL time_bucket origin: 2000-01-03 00:00:00 (a Monday, so
#: week-multiple buckets align to Mondays) — measured on duckdb 1.0:
#: time_bucket(INTERVAL 2 DAY, '2021-07-04') = 2021-07-03, which a
#: unix-epoch origin gets wrong for any width that doesn't divide a day.
_TB_ORIGIN_SECONDS = 946_857_600  # epoch seconds of 2000-01-03 00:00:00 UTC


def time_bucket(width_seconds: int, ts: Column) -> Column:
    """DuckDB time_bucket(INTERVAL, ts) (reference
    extension/core_functions/scalar/date/functions.json): floor-align a
    timestamp to a fixed-width bucket anchored at the PostgreSQL origin
    2000-01-03 (round 11 fix — the previous unix-epoch anchor diverged on
    multi-day widths). TZ-free integer arithmetic on the NTZ epoch —
    equivalent to Spark's window() start but usable as a scalar."""
    sec = F.unix_micros(ts.cast("timestamp")) / F.lit(1_000_000) - F.lit(
        _TB_ORIGIN_SECONDS
    )
    bucket = (F.floor(sec / width_seconds) * width_seconds).cast("long") + F.lit(
        _TB_ORIGIN_SECONDS
    )
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
    global counter cheaply — the deterministic equivalent is row numbering
    over an explicit total order. Round 7: routed through the two-phase
    global_row_number (range shuffle + per-partition offsets) so no
    single-partition WindowExec appears at any input size. For
    sparse-but-parallel ids use `unique_ids` instead."""
    return global_row_number(df, order_by, out=name)


def unique_ids(df, name: str = "uid"):
    """Parallel-safe sparse ids (monotonically_increasing_id): unique and
    increasing per partition, NOT contiguous — document per reference gap."""
    return df.withColumn(name, F.monotonically_increasing_id())


def global_row_number(df, keys, descending=None, out="rn", reliable=False):
    """Contiguous 1-based row numbers over a GLOBAL order without a
    single-partition WindowExec (round-7 VERDICT item: `Window.orderBy`
    with no partition moves every row to one task).

    Two-phase plan — the classic distributed total-order ranking:
    1. materialize the sort-key values, `repartitionByRange` on them (a
       parallel range shuffle; partition i holds keys ordered before
       partition i+1), and take per-partition row_number (the window
       partitions by `spark_partition_id`, so no task sees more than its
       own partition);
    2. collect the per-partition COUNTS (bounded driver-side metadata — at
       most `spark.sql.shuffle.partitions` rows, the same class of
       driver work as the pivot-value and LIMIT-% probes), turn them into
       cumulative offsets, and broadcast-join them back:
       global_rn = local_rn + offset[pid].

    `keys` are VALUE expressions (no .desc()/.asc() sort-order wrappers —
    pass `descending` flags instead; a sort-order expression fails at
    analysis); ties are resolved by their position inside the range
    partition, so pass a tiebreaker key when determinism matters (same
    contract as every ORDER BY+LIMIT query in the registry).

    The range-partitioned, pid-stamped intermediate is eagerly
    localCheckpoint()ed BEFORE the counts job: RangePartitioner samples its
    boundaries per job (seeded by RDD id), so without the materialization
    the offsets collect() and the returned plan could land DIFFERENT
    boundaries on inputs past the sampling budget — duplicated/skipped
    global ids. The checkpoint also means the upstream plan executes
    exactly once per call (the counts job and every downstream consumer
    read the materialized partitions). Build is therefore EAGER — bench
    harnesses must rebuild inside the clock (bench.py eager_build).

    ``reliable=True`` swaps the localCheckpoint for a real ``checkpoint()``
    against the configured checkpoint dir (see operators.recursive._truncate
    for the tradeoff table): on a preemptible-executor cluster a lost
    executor then recomputes tasks instead of killing the job, and the
    range-boundary determinism argument above holds identically — the
    boundaries are pinned by the one materialization either way."""
    from pyspark.sql import Window

    from duckdb_parachute_spark.operators.recursive import _truncate

    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if descending is not None and len(descending) != len(keys):
        raise ValueError(
            f"global_row_number: len(descending)={len(descending)} must equal "
            f"len(keys)={len(keys)}"
        )
    desc = descending if descending is not None else [False] * len(keys)
    d = df
    sort_cols = []
    for i, k in enumerate(keys):
        col = F.col(k) if isinstance(k, str) else k
        d = d.withColumn(f"__sk{i}", col)
        # DuckDB's default_null_order is NULLS_LAST for BOTH directions
        # (reference src/main/config.cpp ResolveNullOrder with the default
        # NULLS_LAST setting; verified on duckdb 1.x: ORDER BY v DESC yields
        # [2, 1, NULL]) — matching frames.py's _order_key discipline so
        # oracle-compared rankings over nullable keys agree.
        sort_cols.append(
            F.col(f"__sk{i}").desc_nulls_last()
            if desc[i]
            else F.col(f"__sk{i}").asc_nulls_last()
        )
    d = _truncate(
        d.repartitionByRange(n_part, *sort_cols).withColumn(
            "__pid", F.spark_partition_id()
        ),
        reliable,
        eager=True,
    )
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    d = d.withColumn("__lrn", F.row_number().over(w))
    counts = sorted(
        (r["__pid"], r["__c"])
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    return (
        d.join(F.broadcast(off_df), "__pid")
        .withColumn(out, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off", *[f"__sk{i}" for i in range(len(keys))])
    )


def global_rank(df, keys, descending=None, out="rnk"):
    """rank() over a GLOBAL order via global_row_number + a min-per-peer
    window (peers = rows equal on all keys; the peer window hash-partitions
    on the key tuple — fine-grained, never single-partition). With a
    tiebreaker in `keys` the order is total and this degenerates to
    global_row_number exactly."""
    from pyspark.sql import Window

    peer_cols = []
    d = df
    for i, k in enumerate(keys):
        col = F.col(k) if isinstance(k, str) else k
        d = d.withColumn(f"__pk{i}", col)
        peer_cols.append(f"__pk{i}")
    d = global_row_number(d, [F.col(c) for c in peer_cols], descending, out="__grn")
    w = Window.partitionBy(*peer_cols)
    return (
        d.withColumn(out, F.min("__grn").over(w).cast("long"))
        .drop("__grn", *peer_cols)
    )
