"""Pipeline-surface queries: Structured Streaming (SURVEY §2.10, additive —
the reference is batch-only), multimodal binary-column plumbing, and
file-format source/sink roundtrips (SURVEY §2.1).

Streaming entries run the stream to completion with Trigger.AvailableNow into
a memory sink and return the materialized result, so the driver's batch
contract ((spark, sf_dir) -> DataFrame) and the DuckDB oracle both apply: the
oracle recomputes the same event-time windows in SQL. That makes watermarking
/ windowing corrections first-class hash-checked operators instead of
rows-only smoke tests.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.workload import query


def _run_stream(df, spark, name, mode="complete"):
    """Drive a streaming plan over the full backlog (AvailableNow) into a
    memory sink; returns the result as a batch DataFrame."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000) AS window_start,
           make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 + 3600000000) AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_counts(spark, sf_dir):
    """Tumbling 1-hour event-time windows with watermark over a file-source
    stream (Structured Streaming; no reference counterpart — SURVEY §2.10).
    The oracle recomputes the same windows with epoch arithmetic, so the
    streaming path is value-checked, not just smoke-tested."""
    from duckdb_parachute_spark.streaming import read_event_stream, windowed_counts

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    out = _run_stream(windowed_counts(ev, "1 hour"), spark, "q_stream_tumbling")
    return out.select("window_start", "window_end", "event_type", "n", F.round("total", 4).alias("total"))


@query(
    "stream_sliding_counts",
    oracle="""
    SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) - k) * 1800000000) AS window_start,
           event_type, CAST(count(*) AS BIGINT) AS n
    FROM events, (VALUES (0), (1)) offs(k)
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Sliding windows (1 h window, 30 min slide): every event lands in two
    overlapping windows. Oracle enumerates both window starts per event."""
    from duckdb_parachute_spark.streaming import read_event_stream, windowed_counts

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    out = _run_stream(windowed_counts(ev, "1 hour", slide="30 minutes"), spark, "q_stream_sliding")
    return out.select("window_start", "event_type", "n")


@query(
    "stream_session_windows",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), grp AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS g
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS session_value
    FROM grp GROUP BY user_id, g
    """,
)
def stream_session_windows(spark, sf_dir):
    """Gap-based session windows per user (30 min inactivity closes the
    session). The oracle is the classic gaps-and-islands rewrite — session
    start = first event, end = last event + gap, matching
    F.session_window semantics."""
    from duckdb_parachute_spark.streaming import read_event_stream, sessionized

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    out = _run_stream(sessionized(ev, gap="30 minutes"), spark, "q_stream_session")
    return out.select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("session_value", 4).alias("session_value"),
    )


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark, sf_dir):
    """Streaming stateful dedup (dropDuplicatesWithinWatermark): over one
    AvailableNow backlog the surviving key set equals batch DISTINCT."""
    from duckdb_parachute_spark.streaming import dedup_within_watermark, read_event_stream

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    deduped = dedup_within_watermark(ev, ["user_id", "event_type"], "10 hours")
    return _run_stream(deduped, spark, "q_stream_dedup", mode="append").select(
        "user_id", "event_type"
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS path,
           'image' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + (sub % 64) AS INT) AS width,
           CAST(16 + ((sub // 64) % 64) AS INT) AS height,
           1 AS n_frames
    FROM (SELECT doc_id, text,
                 list_sum(list_transform(generate_series(1, least(length(text), 64)),
                                         i -> ascii(substr(text, i, 1)))) AS sub
          FROM documents WHERE doc_id < 50)
    """,
)
def mm_decode_features(spark, sf_dir):
    """Multimodal decode plumbing (extension goal): documents' text bytes
    stand in for image payloads; decode_assets runs the Arrow-batched
    mapInPandas path with the deterministic fake decoder. The oracle replays
    the fake decoder's byte arithmetic in SQL — the full distributed UDF
    path is value-checked. Feature vector is checked via its width/height
    projection (list<float> crossing two engines is compared elsewhere)."""
    from duckdb_parachute_spark.multimodal import decode_assets

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    assets = d.select(
        F.col("doc_id").cast("string").alias("path"),
        F.encode("text", "utf-8").alias("content"),
    )
    decoded = decode_assets(assets, "image")
    return decoded.select("path", "modality", "n_bytes", "width", "height", "n_frames")


@query(
    "mm_frame_sampling",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS path, frame_idx
    FROM documents, generate_series(0, 9) t(frame_idx)
    WHERE doc_id < 20 AND frame_idx % 3 = 0
    """,
)
def mm_frame_sampling(spark, sf_dir):
    """Frame-sampling plumbing: synthesize 10 frames per asset, keep every
    3rd (pure Catalyst posexplode — the shape video pipelines need)."""
    from duckdb_parachute_spark.multimodal import frame_sample

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    decoded = d.select(F.col("doc_id").cast("string").alias("path"), F.lit(10).alias("n_frames"))
    return frame_sample(decoded, every_nth=3).select("path", "frame_idx")


def _tmp(leaf: str) -> str:
    path = f"/root/repo/.tmp/{leaf}"
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return path


@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM read_csv('/root/repo/.tmp/rt_nation_csv/*.csv', header=true)
    """,
)
def src_csv_roundtrip(spark, sf_dir):
    """CSV sink + sniffer-style read-back (reference read_csv_auto,
    src/execution/operator/csv_scanner/sniffer/csv_sniffer.cpp): write nation
    as headered CSV, re-read with schema inference; the oracle is DuckDB's own
    sniffer over the same bytes."""
    from duckdb_parachute_spark.sources import copy_to, read_csv_auto

    n = load_table(spark, sf_dir, "nation")
    path = _tmp("rt_nation_csv")
    copy_to(n, path, fmt="csv", header=True)
    return read_csv_auto(spark, path).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "src_json_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM read_json('/root/repo/.tmp/rt_region_json/*.json')",
)
def src_json_roundtrip(spark, sf_dir):
    """JSON-lines sink + structure-inferring read-back (reference
    extension/json/json_scan.cpp): region through newline-delimited JSON."""
    from duckdb_parachute_spark.sources import copy_to, read_json_auto

    r = load_table(spark, sf_dir, "region")
    path = _tmp("rt_region_json")
    copy_to(r, path, fmt="json")
    return read_json_auto(spark, path).select("r_regionkey", "r_name")


@query(
    "src_partitioned_write",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM read_parquet('/root/repo/.tmp/rt_orders_part/*/*.parquet', hive_partitioning=1)
    GROUP BY o_orderstatus
    """,
)
def src_partitioned_write(spark, sf_dir):
    """Hive-partitioned parquet sink (reference COPY TO ... PARTITION_BY,
    physical_copy_to_file.cpp:147): write orders partitioned by status,
    read the partition tree back and aggregate per partition."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    path = _tmp("rt_orders_part")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark, sf_dir):
    """Arbitrary stateful streaming (applyInPandasWithState, SURVEY §2.10):
    per-user running totals held in GroupState. With an AvailableNow backlog
    the last update per user equals the batch aggregate, which the oracle
    recomputes — the custom-state path is value-checked end to end."""
    from duckdb_parachute_spark.streaming import read_event_stream, running_user_totals

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        running_user_totals(ev)
        .writeStream.format("memory")
        .queryName("q_stream_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("q_stream_stateful")
    # keep the final update per user (earlier micro-batch rows are partials)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS error_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'error'
      
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream event-time interval join (streaming.interval_join;
    SURVEY §2.10 additive — the reference cannot join two live streams).
    Watermarks on both sides bound the join state so it runs on unbounded
    input; driven to completion with AvailableNow, the result equals the
    batch range join the oracle computes."""
    from duckdb_parachute_spark.streaming import interval_join, read_event_stream

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    joined = interval_join(
        clicks, errors, on="user_id", upper="INTERVAL 4 HOURS", watermark="8 hours"
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.user_id").alias("user_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("q_stream_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_stream_ssj")


def _stage_events_with_sentinels(spark, sf_dir):
    """Copy events to a /tmp staging dir with TWO far-future sentinel rows
    (user_id = −1, +30 days; one click + one error 1 h earlier so they never
    pair): the sentinels advance both sides' watermarks past every real row,
    so outer stream-stream join state fully flushes under AvailableNow and
    the stream output equals the batch join exactly. Staged parquet is
    forced to TIMESTAMP_MICROS (Spark's INT96 default reads back as ns in
    the footer sniffer and breaks the stream's declared schema); always
    overwritten so the stage reflects the current writer config."""
    import datetime
    import os
    import re

    ev_b = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    max_ts = ev_b.agg(F.max("ts").alias("m")).collect()[0]["m"]
    # per-PROCESS staging (round 11): two concurrent sweeps sharing one
    # sf_dir-keyed stage raced — one overwrote the parquet mid-read of the
    # other (FAILED_READ_FILE). The pid suffix isolates writers; overwrite
    # within a process still reflects the current writer config.
    tag = re.sub(r"[^0-9a-z]", "_", sf_dir.lower()).strip("_")
    stage = f"/tmp/parachute_outer_stage/{tag}-p{os.getpid()}"
    norm = ev_b.withColumn("ts", F.col("ts").cast("timestamp"))
    sent = spark.createDataFrame(
        [
            (-1, max_ts + datetime.timedelta(days=30), -1, "click", 0.0, "{}"),
            (-2, max_ts + datetime.timedelta(days=30, hours=-1), -1, "error", 0.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        # Two separate writes, real rows FIRST and sentinels LAST: the file
        # stream source orders files by modification time (latestFirst=false),
        # so even if AvailableNow splits the stage into multiple micro-batches
        # (default ~1000-files-per-trigger cap), the sentinel file is ingested
        # in the FINAL batch — the +30d watermark jump can never precede real
        # rows and drop them as late. A single mixed write had no such
        # guarantee once the stage exceeded one batch.
        norm.write.mode("overwrite").parquet(stage)
        sent.coalesce(1).write.mode("append").parquet(stage)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assert os.path.exists(f"{stage}/_SUCCESS")
    return stage


@query(
    "stream_outer_join_flush",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS error_id, a.user_id
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'error'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
    WHERE a.event_type = 'click'
    """,
)
def stream_outer_join_flush(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join with state eviction
    (streaming.outer_interval_join; SURVEY §2.10 — the hard half of
    stream-stream joins). An unmatched click emits its null-padded row only
    when the watermark passes click_ts + upper and its buffered state is
    EVICTED. The exact flush boundary after an AvailableNow run depends on
    internal batch/watermark mechanics (measured: it can trail max_ts by
    2×watermark + upper), so instead of filtering to a fragile settled
    region, the input is STAGED with two far-future sentinel events
    (user_id = −1, +30 days): they advance the watermark past every real
    row, forcing every outer result to flush, and the stream output equals
    the plain batch LEFT JOIN — full-strength hash check, no boundary
    carve-out. Sentinels survive the event_type filters (one click + one
    non-matching error, error 1 h BEFORE the click so backward-only ranges
    can't pair them) because withWatermark tracks rows REACHING it —
    a filtered-out sentinel would advance nothing."""
    from duckdb_parachute_spark.streaming import outer_interval_join, read_event_stream

    stage = _stage_events_with_sentinels(spark, sf_dir)
    ev = read_event_stream(spark, stage)
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    joined = outer_interval_join(
        clicks, errors, on="user_id", upper="INTERVAL 4 HOURS", watermark="8 hours"
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.user_id").alias("user_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("q_stream_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_stream_outer").where(F.col("user_id") >= 0)


@query(
    "stream_foreachbatch_exactly_once",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def stream_foreachbatch_exactly_once(spark, sf_dir):
    """foreachBatch exactly-once sink (streaming.foreach_batch_exactly_once):
    per-batch transactional commit markers make re-delivered batch ids
    idempotent. The stream is run TWICE over the same input with FRESH
    checkpoints — the second run re-delivers every batch id from scratch,
    and only the marker pattern prevents doubled rows. The returned grouped
    totals over the committed sink therefore hash-match the batch oracle
    iff exactly-once held (duplicates would double n/total)."""
    import re
    import shutil

    from duckdb_parachute_spark.streaming import (
        align_batch_types,
        foreach_batch_exactly_once,
        read_event_stream,
        read_exactly_once_sink,
    )

    tag = re.sub(r"[^0-9a-z]", "_", sf_dir.lower()).strip("_")
    base = f"/tmp/parachute_fb_sink/{tag}"
    shutil.rmtree(base, ignore_errors=True)
    for attempt in (1, 2):  # second run re-delivers batch ids, markers skip
        ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
        foreach_batch_exactly_once(
            ev,
            sink_dir=f"{base}/sink",
            checkpoint_dir=f"{base}/cp{attempt}",
            query_name=f"q_fb_sink_{attempt}",
        )
    out = read_exactly_once_sink(spark, f"{base}/sink")
    return (
        align_batch_types(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@query(
    "src_sniff_csv_report",
    oracle="""
    SELECT f AS file, u.name AS column_name, u.type AS column_type,
           Delimiter AS delimiter, HasHeader AS has_header
    FROM (
      SELECT 'nation' AS f, unnest(Columns) AS u, Delimiter, HasHeader
      FROM sniff_csv('/root/repo/.tmp/rt_sniff/nation.csv')
      UNION ALL
      SELECT 'allstr_noheader', unnest(Columns), Delimiter, HasHeader
      FROM sniff_csv('/root/repo/.tmp/rt_sniff/allstr_noheader.csv')
      UNION ALL
      SELECT 'mixed_noheader', unnest(Columns), Delimiter, HasHeader
      FROM sniff_csv('/root/repo/.tmp/rt_sniff/mixed_noheader.csv')
    )
    """,
)
def src_sniff_csv_report(spark, sf_dir):
    """sniff_csv vs THE REFERENCE'S OWN SNIFFER (reference
    src/function/table/sniff_csv.cpp + sniffer/header_detection.cpp; ours
    sources.sniff_csv): both engines sniff the SAME three files and must
    agree on delimiter, header detection, per-column types AND names.
    Shapes: (1) typed file with a text header (nation), (2) all-string file
    whose first row is DATA — the round-8 advisor's case; the sniffer's
    all-VARCHAR fallback assumes a header, as DuckDB does, so names come
    from row 1, and (3) typed headerless file — row-1 types match the body,
    so both report has_header=false with positional column0.. names. Type
    names are compared at the sniffer's class level (CSV sniffers quantize
    integers to their widest class: DuckDB reports BIGINT for any integer
    column, Spark's inferSchema picks the narrowest — the query widens to
    the DuckDB convention, documented divergence)."""
    import os

    from duckdb_parachute_spark.sources import sniff_csv

    n = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    path = _tmp("rt_sniff")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/nation.csv", "w") as f:
        f.write("n_nationkey;n_name;n_regionkey\n")
        for r in n:
            f.write(f"{r.n_nationkey};{r.n_name};{r.n_regionkey}\n")
    with open(f"{path}/allstr_noheader.csv", "w") as f:
        f.write("alpha;beta\napple;red\nbanana;yellow\ncherry;dark\n")
    with open(f"{path}/mixed_noheader.csv", "w") as f:
        f.write("1;x\n2;y\n3;z\n")
    outs = []
    for tag in ("nation", "allstr_noheader", "mixed_noheader"):
        outs.append(
            sniff_csv(spark, f"{path}/{tag}.csv").select(
                F.lit(tag).alias("file"), "*"
            )
        )
    out = outs[0].unionAll(outs[1]).unionAll(outs[2])
    widened = (
        F.when(F.col("column_type").isin("tinyint", "smallint", "int", "bigint"), "BIGINT")
        .when(F.col("column_type").isin("float", "double"), "DOUBLE")
        .when(F.col("column_type") == "string", "VARCHAR")
        .otherwise(F.upper(F.col("column_type")))
    )
    return out.select(
        "file", "column_name", widened.alias("column_type"), "delimiter", "has_header"
    )


@query(
    "src_export_import_db",
    oracle="""
    SELECT 'nation' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum FROM nation
    UNION ALL
    SELECT 'region', CAST(count(*) AS BIGINT), CAST(sum(r_regionkey) AS BIGINT) FROM region
    ORDER BY table_name
    """,
)
def src_export_import_db(spark, sf_dir):
    """EXPORT DATABASE / IMPORT DATABASE roundtrip (reference
    physical_export.cpp; sources.export_database/import_database): dump
    nation+region with a schema manifest, restore into fresh temp views,
    and prove the restored catalog is bit-equivalent via per-table
    row counts + key checksums against the ORIGINAL tables (the oracle
    reads the originals — any loss or duplication in the manifest path
    would hash-mismatch)."""
    from duckdb_parachute_spark.sources import export_database, import_database

    tables = {
        "exp_nation": load_table(spark, sf_dir, "nation"),
        "exp_region": load_table(spark, sf_dir, "region"),
    }
    path = _tmp("rt_exportdb")
    export_database(spark, tables, path)
    back = import_database(spark, path)
    n = back["exp_nation"].agg(
        F.lit("nation").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_nationkey").cast("long").alias("key_sum"),
    )
    r = back["exp_region"].agg(
        F.lit("region").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("r_regionkey").cast("long").alias("key_sum"),
    )
    return n.unionAll(r).orderBy("table_name")


@query(
    "src_replacement_scan",
    oracle="""
    SELECT k, CAST(sum(v) AS BIGINT) AS total
    FROM (VALUES (0, 0), (1, 1), (2, 2), (0, 3), (1, 4), (2, 5), (0, 6), (1, 7), (2, 8), (0, 9)) t(k, v)
    GROUP BY k ORDER BY k
    """,
)
def src_replacement_scan(spark, sf_dir):
    """Replacement scan (reference tools/pythonpkg/src/python_replacement_scan.cpp
    — client dataframes auto-bind as tables by name; ours catalog.register):
    a pandas DataFrame is registered under a name and queried through
    plain SQL, exactly the duckdb `con.sql("SELECT ... FROM my_pdf")`
    workflow. The oracle recomputes from inline VALUES."""
    import pandas as pd

    from duckdb_parachute_spark.catalog import Catalog

    pdf = pd.DataFrame({"k": [i % 3 for i in range(10)], "v": list(range(10))})
    Catalog(spark, sf_dir).register("my_pdf", pdf).createOrReplaceTempView("my_pdf")
    return spark.sql(
        "SELECT k, CAST(sum(v) AS BIGINT) AS total FROM my_pdf GROUP BY k ORDER BY k"
    )


@query(
    "src_ordered_copy",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS range_overlaps,
           CAST(0 AS BIGINT) AS unsorted_files
    FROM lineitem
    """,
)
def src_ordered_copy(spark, sf_dir):
    """Order-preserving parallel COPY (reference
    physical_batch_copy_to_file.cpp — batch indexes keep input order while
    sinks write in parallel; ours sources.copy_to_ordered via range
    partition + in-partition sort). The ordered-output contract is checked
    IN-ENGINE: per output file, (min,max,sortedness) of the order key —
    files must be internally sorted and their [min,max] ranges disjoint in
    file-name order, which is exactly what makes lexicographic
    concatenation the global order. The oracle pins the expected row count
    and zero violations."""
    from pyspark.sql import Window

    from duckdb_parachute_spark.sources import copy_to_ordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    path = _tmp("rt_ordered_copy")
    copy_to_ordered(li, path, ["l_orderkey", "l_linenumber"])
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("f"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
    )
    wf = Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    per_file = (
        back.withColumn("prev", F.lag("key").over(wf))
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("key").alias("lo"),
            F.max("key").alias("hi"),
            F.sum((F.col("key") < F.col("prev")).cast("long")).alias("inversions"),
        )
    )
    wg = Window.orderBy("f")
    checked = per_file.withColumn("prev_hi", F.lag("hi").over(wg))
    # coalesce: with a single output file every prev_hi is NULL (no pair to
    # overlap) and sum(NULL) must read as zero violations, not NULL
    return checked.agg(
        F.sum("n").alias("n_rows"),
        F.coalesce(
            F.sum((F.col("lo") <= F.col("prev_hi")).cast("long")), F.lit(0)
        ).alias("range_overlaps"),
        F.coalesce(
            F.sum((F.col("inversions") > 0).cast("long")), F.lit(0)
        ).alias("unsorted_files"),
    )


@query(
    "dml_constraint_checks",
    oracle="""
    SELECT
      CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS pk_violations,
      CAST((SELECT count(*) FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
                                  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders) GROUP BY l_orderkey)) AS BIGINT) AS fk_order_violations,
      CAST((SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_nationkey IS NOT NULL
                                  AND c_nationkey NOT IN (SELECT n_nationkey FROM nation) GROUP BY c_nationkey)) AS BIGINT) AS fk_nation_violations,
      CAST((SELECT count(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)) AS BIGINT) AS composite_pk_violations
    """,
)
def dml_constraint_checks(spark, sf_dir):
    """PRIMARY KEY / composite-key / FOREIGN KEY constraints as assertion
    jobs (operators/dml.check_unique, check_foreign_key). The reference
    enforces these transactionally through its ART index
    (src/execution/index/art/art.cpp); the distributed mapping declared in
    SURVEY §1 is validation-by-aggregation: one key shuffle per uniqueness
    check, one anti-join per FK (parent side broadcast when
    dimension-sized). The oracle recomputes every violation count in SQL —
    both engines must agree on every count, and the driver data makes the
    check non-vacuous: (l_orderkey, l_linenumber) is genuinely NON-unique
    in this generator's lineitem (thousands of duplicate pairs), so a
    broken detector that always reports zero would hash-mismatch."""
    from duckdb_parachute_spark.operators.dml import check_foreign_key, check_unique

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    pk = check_unique(o, ["o_orderkey"]).agg(F.count(F.lit(1)).alias("pk_violations"))
    fk_o = check_foreign_key(li, o, "l_orderkey", "o_orderkey").agg(
        F.count(F.lit(1)).alias("fk_order_violations")
    )
    fk_n = check_foreign_key(c, n, "c_nationkey", "n_nationkey").agg(
        F.count(F.lit(1)).alias("fk_nation_violations")
    )
    cpk = check_unique(li, ["l_orderkey", "l_linenumber"]).agg(
        F.count(F.lit(1)).alias("composite_pk_violations")
    )
    return pk.crossJoin(fk_o).crossJoin(fk_n).crossJoin(cpk)


@query(
    "stream_full_outer_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS error_id,
           coalesce(a.user_id, b.user_id) AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    FULL JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
    """,
)
def stream_full_outer_join(spark, sf_dir):
    """Stream-stream FULL OUTER interval join — completes the join-mode
    matrix (inner `stream_interval_join`, left `stream_outer_join_flush`):
    BOTH sides buffer state, and unmatched rows from EITHER side emit
    null-padded once the watermark evicts them. The sentinel-staged input
    (_stage_events_with_sentinels) flushes both sides' state, so the stream
    output equals the batch FULL JOIN bit-for-bit; errors that precede
    every click window appear as (NULL, error_id) rows, which only the
    right-side state eviction path can produce."""
    from duckdb_parachute_spark.streaming import interval_join, read_event_stream

    stage = _stage_events_with_sentinels(spark, sf_dir)
    ev = read_event_stream(spark, stage)
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    joined = interval_join(
        clicks,
        errors,
        on="user_id",
        upper="INTERVAL 4 HOURS",
        watermark="8 hours",
        how="full_outer",
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("q_stream_full_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_stream_full_outer").where(F.col("user_id") >= 0)


@query(
    "stream_acid_versioned_sink",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_acid_versioned_sink(spark, sf_dir):
    """Streaming exactly-once INTO the versioned ACID store
    (streaming.stream_into_versioned_table + acid.insert_tagged — the
    txnAppId/txnVersion integration): the events stream lands batch-tagged
    snapshot commits; the SAME input is then re-streamed with a FRESH
    checkpoint (every batch redelivers), and exactly-once must hold — the
    oracle is the plain batch aggregate, so any duplicate insert
    hash-mismatches."""
    import tempfile

    from duckdb_parachute_spark.operators.acid import VersionedTable
    from duckdb_parachute_spark.streaming import (
        read_event_stream,
        stream_into_versioned_table,
    )

    work = tempfile.mkdtemp(prefix="parachute_acid_stream_")
    root = f"{work}/t"
    seed = spark.createDataFrame([], "event_id long, event_type string, value double")
    VersionedTable.create(spark, root, seed)
    for attempt in ("first", "replay"):  # fresh checkpoint → full redelivery
        ev = read_event_stream(spark, f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "value"
        )
        stream_into_versioned_table(
            ev, root, f"{work}/ckpt_{attempt}", query_name="acid_sink"
        )
    final = VersionedTable.open(spark, root)
    return (
        final.read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("event_type")
    )


@query(
    "src_delta_scan",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    WHERE (l_orderkey < 500 AND l_quantity >= 10)
       OR (l_orderkey >= 500 AND l_orderkey < 900)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan(spark, sf_dir):
    """Delta Lake log reader (reference extension/delta, delta_scan table
    function; public _delta_log format) — CHECKPOINTED fixture (round 10,
    VERDICT r9 item 4): the query builds a Delta table from lineitem whose
    commits 0–1 (two adds split at l_orderkey=500, then a DELETE of
    l_quantity<10 as remove+add) are VACUUMED AWAY and survive only inside a
    classic ``1.checkpoint.parquet``; commit 2 (a second DELETE of
    l_orderkey>=900 as remove+add) folds on top as JSON. Matching the oracle
    proves checkpoint-state reconstruction PLUS incremental add/remove
    folding — the default shape of real Delta tables, which checkpoint every
    10 commits."""
    import json
    import shutil

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel))
        shutil.rmtree(staging)

    part(li.where("l_orderkey < 500 AND l_quantity >= 10"), "f1r.parquet")
    part(li.where("l_orderkey >= 500 AND l_orderkey < 1000"), "f2.parquet")
    # classic checkpoint at version 1: the reconciled state {f1r, f2} — the
    # pre-checkpoint JSON commits deliberately do not exist (vacuumed)
    cp = spark.createDataFrame(
        [
            (("f1r.parquet", {}, True), None, None),
            (("f2.parquet", {}, True), None, None),
            (None, (1,), None),
            (None, None, ("delta-fixture",)),
        ],
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>, "
        "protocol struct<minReaderVersion: int>, metaData struct<id: string>",
    )
    part(cp, os.path.join("_delta_log", f"{1:020d}.checkpoint.parquet"))
    # commit 2 on top of the checkpoint: DELETE l_orderkey >= 900 from f2
    part(li.where("l_orderkey >= 500 AND l_orderkey < 900"), "f2r.parquet")
    with open(os.path.join(root, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": "f2.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f2r.parquet", "partitionValues": {}}}) + "\n")

    from duckdb_parachute_spark.sources import delta_scan

    return (
        delta_scan(spark, root)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "mm_resize_fit",
    oracle="""
    WITH meta AS (
        SELECT CAST(doc_id AS VARCHAR) AS path,
               CAST(16 + (sub % 64) AS INT) AS width,
               CAST(16 + ((sub // 64) % 64) AS INT) AS height
        FROM (SELECT doc_id,
                     list_sum(list_transform(generate_series(1, least(length(text), 64)),
                                             i -> ascii(substr(text, i, 1)))) AS sub
              FROM documents WHERE doc_id < 50)
    ), fit AS (
        SELECT path, width, height,
               least(1.0, 32.0 / width, 24.0 / height) AS s
        FROM meta
    )
    SELECT path, width, height,
           CAST(greatest(1, floor(width * s)) AS INT) AS new_width,
           CAST(greatest(1, floor(height * s)) AS INT) AS new_height,
           md5(path || ':' || CAST(CAST(greatest(1, floor(width * s)) AS INT) AS VARCHAR)
                    || 'x' || CAST(CAST(greatest(1, floor(height * s)) AS INT) AS VARCHAR)) AS resized_fp
    FROM fit ORDER BY path
    """,
)
def mm_resize_fit(spark, sf_dir):
    """Resize plumbing (extension goal, the third multimodal stage after
    decode and frame-sample): aspect-preserving fit into a 32x24 box with
    exact double math; pixel work stubbed behind a deterministic fingerprint
    (no codecs in the container), Arrow plumbing real. Oracle replays the
    fake decoder's metadata arithmetic AND the fit math AND the fingerprint
    md5 in SQL."""
    from duckdb_parachute_spark.multimodal import decode_assets, resize_assets

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    assets = d.select(
        F.col("doc_id").cast("string").alias("path"),
        F.encode("text", "utf-8").alias("content"),
    )
    return resize_assets(decode_assets(assets, "image"), 32, 24).orderBy("path")


@query(
    "stream_quality_filter",
    oracle="""
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_char
    FROM documents
    WHERE length(text) >= 100 AND len(string_split(trim(text), ' ')) >= 20
      AND lang IN ('en', 'de')
    """,
)
def stream_quality_filter(spark, sf_dir):
    """Streaming ingest-time quality gate (the LLM-pipeline shape: filter at
    arrival, never land junk): a file-source stream over the documents
    parquet, the C4-style length/token gate plus a language allowlist as one
    codegen'd streaming projection, AvailableNow into a memory sink. Over
    one backlog the survivor set equals the batch filter — the oracle."""
    from duckdb_parachute_spark.catalog import load_table as _lt

    schema = _lt(spark, sf_dir, "documents").schema
    # file-source streams need a DIRECTORY; the testdata table may be a
    # single parquet file — watch its parent with a glob filter (same
    # handling as streaming.read_event_stream) — or already a directory
    reader = spark.readStream.schema(schema)
    if os.path.isdir(f"{sf_dir}/documents.parquet"):
        src = reader.parquet(f"{sf_dir}/documents.parquet")
    else:
        src = reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)
    gated = src.where(
        (F.length("text") >= 100)
        & (F.size(F.split(F.trim(F.col("text")), " ")) >= 20)
        & F.col("lang").isin("en", "de")
    ).select("doc_id", "lang", F.length("text").cast("bigint").alias("n_char"))
    return _run_stream(gated, spark, "q_stream_quality", mode="append")


@query(
    "src_delta_scan_v2",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    WHERE (l_orderkey < 400 AND l_quantity >= 25)
       OR (l_orderkey >= 400 AND l_orderkey < 700)
       OR (l_orderkey >= 700 AND l_orderkey < 1000)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan_v2(spark, sf_dir):
    """Delta v2/uuid-checkpoint fixture (round 11, VERDICT r10 item 4 —
    reference extension/delta; public v2 checkpoint spec): the table state
    at version 1 lives in ``1.checkpoint.<uuid>.parquet`` whose adds are
    split between one INLINE entry (f1r) and a SIDECAR parquet under
    ``_delta_log/_sidecars/`` (f2); the protocol row advertises
    minReaderVersion 3 + readerFeatures [v2Checkpoint]. Pre-checkpoint JSON
    commits do not exist (vacuumed). Commit 2 (a DELETE of l_quantity<25
    from f1r, as remove+add) folds on top as JSON. Matching the oracle
    proves v2-checkpoint + sidecar state reconstruction plus incremental
    folding."""
    import json
    import shutil
    import uuid as _uuid

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_v2_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log", "_sidecars"))

    def part(df, rel):
        import glob as g

        staging = os.path.join(root, ".s" + _uuid.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel))
        shutil.rmtree(staging)

    part(li.where("l_orderkey < 400"), "f1.parquet")
    part(li.where("l_orderkey >= 400 AND l_orderkey < 700"), "f2.parquet")
    part(li.where("l_orderkey >= 700 AND l_orderkey < 1000"), "f3.parquet")
    # sidecar: the add-list for f2 + f3
    sc_name = "aaaa1111bbbb2222.parquet"
    part(
        spark.createDataFrame(
            [(("f2.parquet", {}, True),), (("f3.parquet", {}, True),)],
            "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>",
        ),
        os.path.join("_delta_log", "_sidecars", sc_name),
    )
    # v2 checkpoint at version 1: inline add f1, sidecar ref, protocol v3
    cp = spark.createDataFrame(
        [
            (("f1.parquet", {}, True), None, None, None),
            (None, (3, ["v2Checkpoint"]), None, None),
            (None, None, ("delta-v2-fixture",), None),
            (None, None, None, (sc_name, 1)),
        ],
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>, "
        "protocol struct<minReaderVersion: int, readerFeatures: array<string>>, "
        "metaData struct<id: string>, sidecar struct<path: string, sizeInBytes: bigint>",
    )
    part(cp, os.path.join("_delta_log", f"{1:020d}.checkpoint.3e8a{_uuid.uuid4().hex[:28]}.parquet"))
    # commit 2 on top: DELETE l_quantity < 25 from f1 (remove + add)
    part(li.where("l_orderkey < 400 AND l_quantity >= 25"), "f1r.parquet")
    with open(os.path.join(root, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": "f1.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f1r.parquet", "partitionValues": {}}}) + "\n")

    from duckdb_parachute_spark.sources import delta_scan

    return (
        delta_scan(spark, root)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "src_delta_scan_dv",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM (SELECT * FROM lineitem WHERE l_orderkey < 600 AND NOT l_quantity >= 30
          UNION ALL
          SELECT * FROM lineitem
          WHERE l_orderkey >= 600 AND l_orderkey < 1000 AND NOT l_quantity < 5)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan_dv(spark, sf_dir):
    """Delta deletion vectors (round 12, VERDICT r11 missing #1 — reference
    extension/delta via delta-kernel; public PROTOCOL.md DV format): the
    fixture DELETEs rows from two files purely through DVs — f1 gets an
    ON-DISK roaring DV file (storageType 'u', random prefix, CRC-framed),
    f2 an INLINE Z85 DV (storageType 'i') — under protocol 3 +
    readerFeatures [deletionVectors]. Row indexes are derived from the
    written file order, so matching the oracle proves the whole chain:
    Z85 decode, roaring64 parse, frame checksum, and the broadcast
    row-index anti-join against _metadata.row_index."""
    import json
    import shutil

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import (
        inline_dv_descriptor,
        write_dv_file,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_dv_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(
            g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel)
        )
        shutil.rmtree(staging)

    # deterministic row order inside each file, so DV row indexes are stable
    f1 = li.where("l_orderkey < 600").orderBy("l_orderkey", "l_linenumber")
    f2 = li.where("l_orderkey >= 600 AND l_orderkey < 1000").orderBy(
        "l_orderkey", "l_linenumber"
    )
    part(f1.coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber"), "f1.parquet")
    part(f2.coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber"), "f2.parquet")
    # deleted row indexes = positions (written order) matching the predicate
    q1 = [r[0] for r in f1.select("l_quantity").collect()]
    q2 = [r[0] for r in f2.select("l_quantity").collect()]
    dv1 = write_dv_file(root, [i for i, q in enumerate(q1) if q >= 30], prefix="ab")
    dv2 = inline_dv_descriptor([i for i, q in enumerate(q2) if q < 5])
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "dv-fixture", "configuration": {
            "delta.enableDeletionVectors": "true"}}}) + "\n")
        f.write(json.dumps({"add": {"path": "f1.parquet", "partitionValues": {}}}) + "\n")
        f.write(json.dumps({"add": {"path": "f2.parquet", "partitionValues": {}}}) + "\n")
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": "f1.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f1.parquet", "partitionValues": {},
                                    "deletionVector": dv1}}) + "\n")
        f.write(json.dumps({"remove": {"path": "f2.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f2.parquet", "partitionValues": {},
                                    "deletionVector": dv2}}) + "\n")
    return (
        delta_scan(spark, root)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "src_delta_scan_colmap",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE l_orderkey < 800
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan_colmap(spark, sf_dir):
    """Delta column mapping, name mode (round 12, VERDICT r11 missing
    tail — metadata-only renames; public PROTOCOL.md column-mapping spec):
    the parquet file stores columns under physical names col-<hex> with
    delta.columnMapping.{id,physicalName} in metaData.schemaString, and the
    partition column's partitionValues key is the PHYSICAL name (the spec's
    rule). Matching the oracle proves physical→logical renaming for both
    data and partition columns under minReaderVersion 2."""
    import json
    import shutil

    from duckdb_parachute_spark.sources import delta_scan

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_cm_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
        shutil.move(
            g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel)
        )
        shutil.rmtree(staging)

    # physical names in the files; logical names only in schemaString.
    # Partitioned by return flag -> partition col is mapped too.
    flags = [r[0] for r in li.select("l_returnflag").distinct().collect()]
    fields = [
        {"name": "l_orderkey", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-1a"}},
        {"name": "l_quantity", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-2b"}},
        {"name": "l_returnflag", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-3c"}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2,
                                         "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cm-fixture",
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": ["l_returnflag"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"}}}) + "\n")
        for i, flag in enumerate(sorted(flags)):
            rel = f"p{i}.parquet"
            part(
                li.where((F.col("l_returnflag") == flag) & (F.col("l_orderkey") < 800))
                .select(F.col("l_orderkey").alias("col-1a"),
                        F.col("l_quantity").alias("col-2b")),
                rel,
            )
            f.write(json.dumps({"add": {"path": rel,
                                        "partitionValues": {"col-3c": flag}}}) + "\n")
    return (
        delta_scan(spark, root)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "src_delta_scan_ts",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE l_orderkey < 300
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan_ts(spark, sf_dir):
    """Delta TIMESTAMP time travel (round 12; the public rule all Delta
    readers share — newest version whose commitInfo.timestamp <= target):
    commit 0 writes l_orderkey<300 at t0, commit 1 widens to <1000 at t1;
    scanning AT a timestamp between the two must return commit 0's content
    (the oracle), proving the commitInfo resolution path — not just
    version-number travel."""
    import json
    import shutil

    from duckdb_parachute_spark.sources import delta_scan

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_ts_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(
            g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel)
        )
        shutil.rmtree(staging)

    part(li.where("l_orderkey < 300"), "f0.parquet")
    part(li.where("l_orderkey < 1000"), "f1.parquet")
    t0, t1 = 1700000000000, 1700000600000  # 10 minutes apart
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": t0, "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f0.parquet", "partitionValues": {}}}) + "\n")
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": t1, "operation": "WRITE"}}) + "\n")
        f.write(json.dumps({"remove": {"path": "f0.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f1.parquet", "partitionValues": {}}}) + "\n")
    return (
        delta_scan(spark, root, timestamp="2023-11-14T22:18:00+00:00")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "src_delta_scan_dv_colmap",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE l_orderkey < 800 AND l_quantity < 30
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def src_delta_scan_dv_colmap(spark, sf_dir):
    """Deletion vectors + column mapping COMBINED, through the DISTRIBUTED
    decode path (round 13, VERDICT r12 missing #2: real writers produce
    both features on one table, and past DV_DRIVER_LIMIT the decode must
    leave the driver). The fixture partitions by return flag under name-mode
    mapping (physical col-<n> names, physical partitionValues keys) and
    deletes every l_quantity >= 30 row purely through per-file on-disk
    roaring DVs; dv_driver_limit=0 forces the mapInPandas executor decode +
    shuffle anti-join, so matching the oracle proves the executor-side
    codec AND the physical-name rename compose."""
    import json
    import shutil

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import write_dv_file

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = _tmp("rt_delta_dvcm_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(
            g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel)
        )
        shutil.rmtree(staging)

    fields = [
        {"name": "l_orderkey", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-1a"}},
        {"name": "l_quantity", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-2b"}},
        {"name": "l_returnflag", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-3c"}},
        {"name": "l_linenumber", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.id": 4,
                      "delta.columnMapping.physicalName": "col-4d"}},
    ]
    flags = sorted(
        r[0] for r in li.select("l_returnflag").distinct().collect()
    )
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"],
            "writerFeatures": ["deletionVectors", "columnMapping"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "dvcm-fixture",
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": ["l_returnflag"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"}}}) + "\n")
        for i, flag in enumerate(flags):
            rel = f"p{i}.parquet"
            # deterministic in-file row order so DV indexes are stable
            fdf = (
                li.where((F.col("l_returnflag") == flag) & (F.col("l_orderkey") < 800))
                .orderBy("l_orderkey", "l_linenumber")
                .select(F.col("l_orderkey").alias("col-1a"),
                        F.col("l_quantity").alias("col-2b"),
                        F.col("l_linenumber").alias("col-4d"))
            )
            # the in-file row order must equal the collect() order below —
            # (orderkey, linenumber) is the table's unique key
            part(fdf.coalesce(1).sortWithinPartitions("col-1a", "col-4d"), rel)
            qs = [r[0] for r in fdf.select("col-2b").collect()]
            dv = write_dv_file(root, [j for j, q in enumerate(qs) if q >= 30],
                               prefix=f"d{i}")
            f.write(json.dumps({"add": {"path": rel,
                                        "partitionValues": {"col-3c": flag},
                                        "deletionVector": dv}}) + "\n")
    return (
        delta_scan(spark, root, dv_driver_limit=0)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "src_delta_scan_colmap_nested",
    oracle="""
    SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(l_linenumber) AS BIGINT) AS ln_sum
    FROM lineitem WHERE l_orderkey < 800
    GROUP BY flag ORDER BY flag
    """,
)
def src_delta_scan_colmap_nested(spark, sf_dir):
    """NESTED column mapping (round 14, VERDICT r13 missing #2; reference
    delta-kernel nested mapping in extension/delta): real writers with
    struct columns under columnMapping stamp physicalName metadata on
    EVERY schemaString field, nested included, and the parquet files
    carry the physical names at every nesting level. The fixture maps a
    top-level long, a STRUCT (two inner mapped fields) and an
    ARRAY<STRUCT> (mapped element field) through name mode; the scan must
    rebuild logical names recursively (sources._nested_map_expr), so
    grouping by info.flag and summing info.qty / lines[0].ln against the
    lineitem-derived oracle proves all three recursion paths."""
    import json
    import shutil

    from duckdb_parachute_spark.sources import delta_scan

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    ).where("l_orderkey < 800")
    root = _tmp("rt_delta_cmnest_tbl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))

    def part(df, rel):
        import glob as g
        import uuid as u

        staging = os.path.join(root, ".s" + u.uuid4().hex)
        df.coalesce(1).write.parquet(staging)
        shutil.move(
            g.glob(os.path.join(staging, "part-*.parquet"))[0], os.path.join(root, rel)
        )
        shutil.rmtree(staging)

    fields = [
        {"name": "l_orderkey", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-1a"}},
        {"name": "info",
         "type": {"type": "struct", "fields": [
             {"name": "qty", "type": "double", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-2x"}},
             {"name": "flag", "type": "string", "nullable": True,
              "metadata": {"delta.columnMapping.id": 4,
                           "delta.columnMapping.physicalName": "col-2y"}}]},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-2b"}},
        {"name": "lines",
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "ln", "type": "integer", "nullable": True,
                       "metadata": {"delta.columnMapping.id": 6,
                                    "delta.columnMapping.physicalName": "col-3x"}}]}},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 5,
                      "delta.columnMapping.physicalName": "col-3c"}},
    ]
    fdf = li.select(
        F.col("l_orderkey").alias("col-1a"),
        F.struct(
            F.col("l_quantity").alias("col-2x"),
            F.col("l_returnflag").alias("col-2y"),
        ).alias("col-2b"),
        F.array(F.struct(F.col("l_linenumber").alias("col-3x"))).alias("col-3c"),
    )
    part(fdf.coalesce(1), "f0.parquet")
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cmnest-fixture",
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "6"}}}) + "\n")
        f.write(json.dumps({"add": {"path": "f0.parquet",
                                    "partitionValues": {}}}) + "\n")
    return (
        delta_scan(spark, root)
        .groupBy(F.col("info.flag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("info.qty").cast("long")).alias("qty"),
            F.sum(F.element_at("lines", 1).getField("ln").cast("long")).alias("ln_sum"),
        )
        .orderBy("flag")
    )
