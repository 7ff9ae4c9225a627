"""The ``cow`` batch Data Source WRITER (``df.write.format("cow")``):
executor-staged append/overwrite commits publishing one atomic
snapshot, schema/type guards, and physical-name consistency on
renamed tables."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch


def _mk(spark, path, **kw):
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double"),
        **kw,
    )
    register_cow_batch(spark)


def test_batch_writer_append_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    (
        spark.createDataFrame([(3, "c", 3.5), (4, "d", 4.5)], "k long, s string, v double")
        .repartition(2)
        .write.format("cow")
        .option("tablePath", p)
        .mode("append")
        .save()
    )
    assert {r["k"] for r in cow.read(spark, p).collect()} == {1, 2, 3, 4}
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert m["operation"] == "batch_append"
    # per-file stats from the executor staging prune like engine writes
    assert all(e.get("stats", {}).get("k") for e in m["files"])
    (
        spark.createDataFrame([(9, "z", 9.0)], "k long, s string, v double")
        .write.format("cow")
        .option("tablePath", p)
        .mode("overwrite")
        .save()
    )
    assert {tuple(r) for r in cow.read(spark, p).collect()} == {(9, "z", 9.0)}
    # old snapshots still time-travel (overwrite is a new snapshot)
    assert cow.read(spark, p, 2).count() == 4


def test_batch_writer_then_engine_dml_interops(spark, tmp_path):
    p = str(tmp_path / "interop")
    _mk(spark, p)
    (
        spark.range(10, 40)
        .selectExpr("id as k", "'w' as s", "cast(id as double) as v")
        .write.format("cow")
        .option("tablePath", p)
        .mode("append")
        .save()
    )
    st = cow.delete(spark, p, "k >= 20")
    assert cow.read(spark, p).count() == 12
    # stats from the DSv2 staging let the delete prune engine-side
    assert st["files_rewritten"] >= 1


def test_batch_writer_guards(spark, tmp_path):
    p = str(tmp_path / "g1")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1, "x")], "k long, part string"),
        partition_by=["part"],
    )
    register_cow_batch(spark)
    df = spark.createDataFrame([(2, "y")], "k long, part string")
    with pytest.raises(Exception, match="partitioned"):
        df.write.format("cow").option("tablePath", p).mode("append").save()
    p2 = str(tmp_path / "g2")
    _mk(spark, p2)
    with pytest.raises(Exception, match="!= table columns"):
        spark.createDataFrame([(1,)], "k long").write.format("cow").option(
            "tablePath", p2
        ).mode("append").save()
    with pytest.raises(Exception, match="never casts"):
        spark.createDataFrame(
            [(1, "a", 2)], "k long, s string, v int"
        ).write.format("cow").option("tablePath", p2).mode("append").save()
    with pytest.raises(Exception, match="no COW table"):
        spark.createDataFrame([(1,)], "k long").write.format("cow").option(
            "tablePath", str(tmp_path / "missing")
        ).mode("append").save()


def test_batch_writer_on_renamed_table_writes_physical(spark, tmp_path):
    p = str(tmp_path / "ren")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    (
        spark.createDataFrame([(5, "e", 5.5)], "k long, s string, value double")
        .write.format("cow")
        .option("tablePath", p)
        .mode("append")
        .save()
    )
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert (5, "e", 5.5) in got
    # engine DML on the logical name reaches the DSv2-written file
    cow.update(spark, p, "value = 5.5", {"s": "'E'"})
    assert (5, "E", 5.5) in {tuple(r) for r in cow.read(spark, p).collect()}
    # round-trip through the DSv2 READER as well
    df = spark.read.format("cow").option("tablePath", p).load()
    assert df.filter("value = 5.5").collect()[0]["s"] == "E"
