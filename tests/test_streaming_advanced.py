"""Advanced streaming behavior: foreachBatch sink and checkpointed
incremental processing (resume picks up only new files)."""

from __future__ import annotations

import shutil

from data_warehouse_solution_spark.streaming.streams import (
    events_stream_source,
    stream_foreach_batch_totals,
)
from data_warehouse_solution_spark.tables import load_tables, table_path

from .conftest import SF_SMOKE


def test_foreach_batch_receives_all_rows(spark):
    totals = stream_foreach_batch_totals(spark, SF_SMOKE)
    batch_total = load_tables(spark, SF_SMOKE, ("events",))["events"].count()
    assert sum(totals.values()) == batch_total
    assert all(n > 0 for n in totals.values())


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """File-source + checkpoint: run to completion, drop a new file
    into the source dir, resume from the same checkpoint — only the
    new file's rows flow through the second run."""
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    shutil.copy(table_path(SF_SMOKE, "events"), src / "events.parquet")

    def run_once() -> None:
        stream = events_stream_source(spark, str(src), str(src / "events.parquet"))
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()
    n_first = spark.read.parquet(out_dir).count()
    base = load_tables(spark, SF_SMOKE, ("events",))["events"].count()
    assert n_first == base

    # second batch of data arrives (same rows, new file name)
    shutil.copy(table_path(SF_SMOKE, "events"), src / "events_part2.parquet")
    run_once()
    n_second = spark.read.parquet(out_dir).count()
    assert n_second == 2 * base  # resumed from checkpoint: only the new file added

    # a third run with NO new files must add nothing
    run_once()
    assert spark.read.parquet(out_dir).count() == 2 * base
