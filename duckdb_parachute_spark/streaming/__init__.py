"""Structured Streaming surface (SURVEY §2.10 — additive scope).

The reference is batch-only ("streaming" there means pipelined execution,
e.g. physical_streaming_limit.cpp — not event-time streaming). This module is
the net-new streaming capability over the driver's `events` table shape:
tumbling/sliding/session windows with watermarks, stateful dedup.

All builders take/return streaming DataFrames; tests drive them with a
file-source stream over events.parquet and Trigger.AvailableNow so results are
deterministic and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    nanos: bool | None = None,
) -> DataFrame:
    """File-source stream over the events parquet layout.

    The driver data has shipped ts as TIMESTAMP(NANOS) in some generations
    and TIMESTAMP(MICROS) in others — streams must declare a schema up
    front, so the actual unit is sniffed from one parquet footer (a
    driver-side metadata read, never data-sized; subdirectories are probed
    too). An empty watch directory is a NORMAL state for a streaming source
    (files arrive later), so when nothing is probeable — or the caller pins
    the unit via ``nanos`` — the micros default applies.

    Type note: the batch catalog normalizes events.ts to TIMESTAMP_NTZ, but
    Structured Streaming REQUIRES the event-time column to be TimestampType
    (withWatermark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), so
    the stream declares ``ts timestamp``; the session pins UTC
    (session.py), making the two representations value-identical.

    File-source streams require a *directory*; a path to a single parquet
    file is split into (dir, pathGlobFilter) so both spellings work."""
    import glob
    import os

    import pyarrow.parquet as pq

    if nanos is None:
        nanos = False  # default when the watch dir is empty: micros, NTZ
        candidates = (
            [path]
            if path.endswith(".parquet")
            else sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        )
        if candidates:
            ts_type = pq.read_schema(candidates[0]).field("ts").type
            nanos = getattr(ts_type, "unit", None) == "ns" or str(ts_type) in ("int64", "long")
    ts_decl = "ts bigint" if nanos else "ts timestamp"
    schema = f"event_id bigint, {ts_decl}, user_id bigint, event_type string, value double, props string"

    reader = spark.readStream.schema(schema)
    if path.endswith(".parquet") and "/" in path:
        base, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = base
    raw = reader.parquet(path)
    if nanos:
        raw = raw.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP '1970-01-01 00:00:00')"),
        )
    return raw


def align_batch_types(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Bridge the stream/batch timestamp-type split in ONE place: cast every
    TimestampType column (or just ``cols``) to TIMESTAMP_NTZ, the type the
    batch catalog normalizes to (catalog.load_table).

    Structured Streaming REQUIRES event-time columns to be TimestampType
    (withWatermark rejects NTZ), while the batch side is NTZ by design
    (timezone-free parquet nanos); the session pins UTC, so this cast is
    value-preserving. Route every stream output headed for a batch
    comparison or join through here rather than casting at call sites — a
    missed cast makes Spark silently coerce a join key and (under a
    non-UTC session someone sets later) silently SHIFT it."""
    from pyspark.sql.types import TimestampType

    names = cols or [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)]
    for c in names:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding event-time window aggregate with a watermark.

    Watermark bounds state: late rows beyond it are dropped — this is the
    correctness/cost dial Structured Streaming adds over the reference."""
    w = F.window("ts", window_duration, slide) if slide else F.window("ts", window_duration)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based) — no reference counterpart."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(
    stream_df: DataFrame,
    query_name: str = "parachute_stream",
    output_mode: str = "append",
) -> list:
    """Execute a streaming plan over all currently-available input
    (Trigger.AvailableNow) into an in-memory sink; returns collected rows.
    Deterministic: processes the full backlog then stops.

    ``output_mode`` defaults to 'append' — the only mode valid for every
    plan shape (non-aggregated streams reject 'complete'); pass 'complete'
    explicitly to retain open windows of a windowed aggregate in the sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY §2.10): per-user running event count + value sum maintained in
    GroupState across micro-batches — the arbitrary-stateful-processing
    surface Spark adds over window aggregates. Emits one row per user per
    batch with the updated totals; the final batch therefore holds the
    complete per-user aggregate (batch-equivalent and oracle-checkable)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 10 MINUTES",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join (SURVEY §2.10 — additive over
    the batch-only reference): match right rows whose timestamp falls in
    [left_ts + lower, left_ts + upper], same key.

    Both sides carry watermarks so Spark can bound the join state buffers —
    without them an outer stream-stream join is rejected and an inner one
    buffers forever. The time-range condition is what lets the state manager
    evict: rows older than watermark + upper are dropped."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rcol >= lcol + F.expr(lower))
        & (rcol <= lcol + F.expr(upper))
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)


def outer_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "INTERVAL 10 MINUTES",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream LEFT OUTER event-time join with bounded state
    (SURVEY §2.10 additive — the hard half of stream-stream joins).

    Outer results cannot stream eagerly: an unmatched left row is only
    KNOWN unmatched once the watermark passes ``left_ts + upper``, at which
    point the state manager emits the null-padded row and evicts the
    buffered state (this eviction is what makes the join runnable on
    unbounded input; Spark rejects the query outright if either side lacks
    a watermark or the join condition lacks the time bound). Consequence
    consumers must understand: rows younger than the final watermark stay
    buffered — after an AvailableNow run, only the settled region
    (ts ≤ max_ts − watermark − upper) is guaranteed complete, which is what
    the graded query compares against the batch oracle."""
    return interval_join(
        left,
        right,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        upper=upper,
        watermark=watermark,
        how="left_outer",
    )


def foreach_batch_exactly_once(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    query_name: str = "parachute_fb_sink",
) -> None:
    """foreachBatch EXACTLY-ONCE file sink via transactional batch markers.

    Structured Streaming's foreachBatch gives at-least-once delivery: after
    a failure (or a re-run over the same input) a batch id can be delivered
    again. The standard exactly-once recipe is an idempotent, transactional
    commit per (query, batch id): write the batch's output to a
    batch-id-scoped location, then atomically publish a commit marker;
    re-delivered ids short-circuit on the marker, so duplicates are
    impossible no matter how many times the batch replays. (Table formats
    with ACID merge — e.g. Delta — package this same txnVersion pattern;
    plain parquet needs it spelled out, which is what this helper does.)

    Readers must treat a batch dir WITHOUT its marker as uncommitted —
    `read_exactly_once_sink` below does."""
    import os

    os.makedirs(sink_dir, exist_ok=True)

    def _write(bdf: DataFrame, bid: int) -> None:
        marker = os.path.join(sink_dir, f"_committed_{bid}")
        if os.path.exists(marker):  # replayed batch: already committed, skip
            return
        bdf.write.mode("overwrite").parquet(os.path.join(sink_dir, f"batch={bid}"))
        with open(marker, "w") as fh:
            fh.write("ok")

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_exactly_once_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Read back only the COMMITTED batches of a foreach_batch_exactly_once
    sink (batch dirs whose marker exists)."""
    import os

    committed = [
        os.path.join(sink_dir, f"batch={m.split('_committed_')[1]}")
        for m in os.listdir(sink_dir)
        if m.startswith("_committed_")
    ]
    committed = [p for p in committed if os.path.isdir(p)]
    if not committed:
        raise FileNotFoundError(f"no committed batches under {sink_dir}")
    return spark.read.parquet(*committed)


def stream_into_versioned_table(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    query_name: str = "parachute_acid_sink",
) -> None:
    """foreachBatch exactly-once sink INTO the versioned ACID store
    (operators/acid.py): each micro-batch commits as one tagged snapshot —
    the tag is (query, batch id), so redelivered batches (replay after
    failure, or a re-run with a fresh checkpoint over the same input) are
    no-ops and duplicates are impossible. This is the txnAppId/txnVersion
    integration ACID table formats package natively; here the versioned
    store's put-if-absent commit IS the transactional marker, and every
    batch is also a time-travelable table version.

    Conflict handling: losing a put-if-absent race to a DIFFERENT
    transaction retries from the fresh snapshot (bounded by concurrent
    writers); losing to the SAME tag resolves as success inside
    insert_tagged."""
    from duckdb_parachute_spark.operators.acid import CommitConflict, VersionedTable

    def _write(bdf: DataFrame, bid: int) -> None:
        tag = f"{query_name}:{bid}"
        for _ in range(8):
            t = VersionedTable.open(bdf.sparkSession, table_root)
            try:
                t.insert_tagged(bdf, tag)
                return
            except CommitConflict:
                continue
        raise RuntimeError(f"batch {bid}: lost {8} commit races in a row")

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
