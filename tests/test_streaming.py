"""True Structured Streaming behavior tests: watermark append
semantics, stateful dedup, and batch-vs-stream equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_solution_spark.streaming.streams import (
    read_events_stream,
    run_stream_to_memory,
    stream_dedup_within_watermark,
    stream_true_tumbling,
    windowed_counts_with_watermark,
)
from data_warehouse_solution_spark.streaming.windows import stream_tumbling_window
from data_warehouse_solution_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_stream_equals_batch_tumbling(spark):
    stream_rows = {
        (r["window_start"], r["event_type"], r["n_events"])
        for r in stream_true_tumbling(spark, SF_SMOKE).collect()
    }
    batch_rows = {
        (r["window_start"], r["event_type"], r["n_events"])
        for r in stream_tumbling_window(spark, SF_SMOKE)
        .select("window_start", "event_type", "n_events")
        .collect()
    }
    assert stream_rows == batch_rows


def test_watermark_append_mode_seals_windows(spark):
    """Append mode emits only watermark-sealed windows: with the
    bounded source fully consumed, every window except those within
    the final watermark horizon must appear."""
    emitted = windowed_counts_with_watermark(spark, SF_SMOKE, "10 minutes")
    batch = (
        load_tables(spark, SF_SMOKE, ("events",))["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
    )
    n_emitted = emitted.count()
    n_batch = batch.count()
    assert 0 < n_emitted < n_batch  # tail windows stay open, rest sealed
    # emitted counts must agree with batch for the sealed windows
    joined = emitted.alias("e").join(
        batch.select(F.col("w.start").alias("window_start"), F.col("count").alias("n_batch")),
        "window_start",
    )
    mismatches = joined.filter(F.col("n_events") != F.col("n_batch")).count()
    assert mismatches == 0


def test_dedup_within_watermark(spark):
    deduped = stream_dedup_within_watermark(spark, SF_SMOKE)
    out = deduped.groupBy("user_id", "event_type").count()
    # each key appears at most once in the deduped stream
    assert out.filter(F.col("count") > 1).count() == 0
    # and the deduped set is much smaller than the input
    total_in = load_tables(spark, SF_SMOKE, ("events",))["events"].count()
    assert 0 < deduped.count() < total_in


def test_stream_reader_matches_batch_reader(spark):
    """The raw-schema streaming read + nanos conversion must produce
    byte-identical rows to the batch reader."""
    stream_df = run_stream_to_memory(read_events_stream(spark, SF_SMOKE), "append")
    batch_df = load_tables(spark, SF_SMOKE, ("events",))["events"]
    assert stream_df.count() == batch_df.count()
    assert stream_df.exceptAll(batch_df).count() == 0
