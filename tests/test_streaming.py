"""Structured Streaming surface tests (SURVEY §2.10 additive scope): drive the
streaming builders over the events parquet with Trigger.AvailableNow and check
the results equal the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    sessionized,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    return read_event_stream(spark, f"{sf_dir}/events.parquet")


def _run(stream_df, spark, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_match_batch(spark, sf_dir, event_stream):
    got = _run(windowed_counts(event_stream, "1 hour"), spark, "wc_stream", "append").toPandas()
    ev = load_table(spark, sf_dir, "events")
    exp = (
        ev.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    # the final (open) window may be withheld by the watermark in append mode
    assert len(g) >= len(e) - len(exp["event_type"].unique())
    merged = g.merge(e, on=key, suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["total_s"] - merged["total_b"]) < 1e-6).all()


def test_sliding_window(spark, event_stream):
    df = _run(
        windowed_counts(event_stream, "2 hours", slide="1 hour"), spark, "sw_stream", "append"
    )
    rows = df.collect()
    assert len(rows) > 0
    spans = {(r["window_end"] - r["window_start"]).total_seconds() for r in rows}
    assert spans == {7200.0}


def test_session_windows(spark, event_stream):
    df = _run(sessionized(event_stream, gap="30 minutes"), spark, "sess_stream", "append")
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_dedup(spark, event_stream):
    deduped = dedup_within_watermark(event_stream, ["user_id", "event_type"], "10 hours")
    df = _run(deduped, spark, "dd_stream", "append")
    n_types = df.groupBy("user_id", "event_type").count().where(F.col("count") > 1).count()
    assert n_types == 0
