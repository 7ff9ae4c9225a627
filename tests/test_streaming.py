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


def test_session_window_incremental_replay_equals_batch(spark, tmp_path):
    """True INCREMENTAL oracle for session windows: the events fixture
    is replayed as time-ordered micro-batches (maxFilesPerTrigger=1,
    so sessions SPAN batch boundaries and the state store must merge
    partial sessions), and the final complete-mode result must equal
    the one-shot batch ``session_window`` aggregation — the strongest
    check available for a state model SQL can't express."""
    import uuid

    from pyspark.sql import Window
    from data_warehouse_solution_spark.streaming.windows import (
        SESSION_GAP,
        stream_session_window,
    )

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    src = tmp_path / "incoming"
    src.mkdir()
    # three time-ordered chunks: mid-session cuts are guaranteed
    # because consecutive same-user events inside the 6h gap land in
    # different files at the chunk boundaries
    chunked = ev.withColumn("chunk", F.ntile(3).over(Window.orderBy("ts", "event_id")))
    for i in (1, 2, 3):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"sess_replay_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    q.awaitTermination(30)
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table(name).collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in stream_session_window(spark, SF_SMOKE).collect()
    }
    assert streamed == batch
