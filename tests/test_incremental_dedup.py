"""Incremental signature-store dedup: batch semantics (intra-batch
keep-min, cross-batch drop-vs-store) and the streaming foreachBatch
harness."""

from __future__ import annotations

from data_warehouse_solution_spark.operators.incremental import (
    dedup_append_batch,
    stream_incremental_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill nearby every single afternoon"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill nearby every single evening"
)
OTHER = (
    "completely different words fill this second document about spark "
    "partitions shuffles and the aggregate execution pipeline design"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_then_duplicate_batch(spark, tmp_path):
    store = str(tmp_path / "sigs")
    s1 = dedup_append_batch(spark, _docs(spark, [(1, BASE), (2, OTHER)]), store)
    assert s1 == {
        "n_batch": 2,
        "n_dup_vs_store": 0,
        "n_dup_in_batch": 0,
        "n_accepted": 2,
    }
    # batch 2: a near-dup of doc 1, plus a genuinely fresh doc
    fresh = (
        "entirely novel content about streaming watermarks state stores "
        "checkpoint recovery and session window merging over event time"
    )
    s2 = dedup_append_batch(spark, _docs(spark, [(10, NEAR), (11, fresh)]), store)
    assert s2["n_batch"] == 2
    assert s2["n_dup_vs_store"] == 1  # 10 ~ 1
    assert s2["n_accepted"] == 1
    # the store now holds exactly the 3 accepted signatures
    assert spark.read.parquet(store).count() == 3


def test_intra_batch_keeps_min_doc_id(spark, tmp_path):
    store = str(tmp_path / "sigs")
    s = dedup_append_batch(spark, _docs(spark, [(5, BASE), (6, NEAR), (7, OTHER)]), store)
    assert s["n_dup_in_batch"] == 1  # 6 dropped, 5 kept
    assert s["n_accepted"] == 2
    kept = {r["doc_id"] for r in spark.read.parquet(store).select("doc_id").collect()}
    assert kept == {5, 7}


def test_streaming_incremental_dedup(spark, tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    store = str(tmp_path / "sigs")
    pad = dict(lang="en", source="s", n_chars=0)

    def write_file(name, rows):
        df = spark.createDataFrame(
            [(i, t, pad["lang"], pad["source"], len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage" / name))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, str(docs_dir / f"{name}.parquet"))

    write_file("b1", [(1, BASE), (2, OTHER)])
    stats1 = stream_incremental_dedup(spark, str(docs_dir), store)
    assert sum(s["n_accepted"] for s in stats1) == 2

    write_file("b2", [(10, NEAR)])
    stats2 = stream_incremental_dedup(spark, str(docs_dir), store)
    # fresh run re-reads all files (no checkpoint dir given): doc 10
    # must still be rejected against the store
    total_dups = sum(s["n_dup_vs_store"] + s["n_dup_in_batch"] for s in stats2)
    assert total_dups >= 1
    kept = {r["doc_id"] for r in spark.read.parquet(store).select("doc_id").collect()}
    assert 10 not in kept


def test_incremental_daily_revenue_matches_full_recompute(spark, tmp_path):
    """Folding order batches one at a time must equal the one-shot
    aggregate over all of them (exact decimal merge)."""
    from pyspark.sql import functions as F

    from data_warehouse_solution_spark.operators.incremental import refresh_daily_revenue
    from data_warehouse_solution_spark.tables import load_tables

    from .conftest import SF_ORACLE

    store = str(tmp_path / "daily_rev")
    orders = load_tables(spark, SF_ORACLE, ("orders",))["orders"]
    b1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    refresh_daily_revenue(spark, b1, store)
    final = refresh_daily_revenue(spark, b2, store)

    full = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("day")
        .agg(F.sum("price").alias("revenue"), F.count("*").alias("n_orders"))
    )
    got = {(r["day"], str(r["revenue"]), r["n_orders"]) for r in final.collect()}
    exp = {(r["day"], str(r["revenue"]), r["n_orders"]) for r in full.collect()}
    assert got == exp
