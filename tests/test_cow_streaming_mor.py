"""Streaming sources vs the round-6 table features: the ``cowcdc``
CDC stream must surface merge-on-read commits (diff on the (file, dv)
identity, masking DV positions in-partition) and renamed tables
(physical->logical mapping), and ``cowsink`` must write PHYSICAL
column names on renamed tables so its files stay engine-consistent."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow


def _mk(spark, path, write_mode=None):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(40)], "k long, s string, v double"
    ).repartition(3)
    cow.create(spark, path, df, write_mode=write_mode)


def _collect_stream(spark, path, qname, starting=1):
    from data_warehouse_solution_spark.sources.cow_cdc import register_cow_cdc

    register_cow_cdc(spark)
    stream = (
        spark.readStream.format("cowcdc")
        .option("tablePath", path)
        .option("startingSnapshot", str(starting))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return [tuple(r) for r in spark.sql(f"select * from {qname}").collect()]
    finally:
        q.stop()


def _sorted_multiset(rows):
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def test_cowcdc_streams_mor_commits(spark, tmp_path):
    p = str(tmp_path / "mor")
    _mk(spark, p, write_mode="mor")
    cow.delete(spark, p, "k < 5")  # DV commit: same files, new dv ref
    cow.update(spark, p, "k = 10", {"v": "-1.0"})  # DV + append
    got = _collect_stream(spark, p, "cdc_mor")
    expect = [tuple(r) for r in cow.changes(spark, p, 1).collect()]
    assert _sorted_multiset(got) == _sorted_multiset(expect)
    # the MOR delete's rows ARE in the stream (the name-only diff bug
    # would have yielded nothing for snapshot 2)
    assert {(r[0], r[3]) for r in got if r[4] == 2} == {
        (k, "delete") for k in range(5)
    }
    assert {(r[0], r[2], r[3]) for r in got if r[4] == 3} == {
        (10, 10.0, "delete"),
        (10, -1.0, "insert"),
    }


def test_cowcdc_streams_renamed_table(spark, tmp_path):
    p = str(tmp_path / "ren")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    s_ren = cow.current_snapshot(spark, p)
    cow.delete(spark, p, "value < 3")
    got = _collect_stream(spark, p, "cdc_ren", starting=s_ren)
    # physical->logical mapping: real values, not NULL-filled ghosts
    assert {(r[0], r[2], r[3]) for r in got} == {
        (0, 0.0, "delete"),
        (1, 1.0, "delete"),
        (2, 2.0, "delete"),
    }


def test_cowsink_writes_physical_names_on_renamed_table(spark, tmp_path):
    from data_warehouse_solution_spark.sources.cow_sink import CowSinkDataSource

    p = str(tmp_path / "sink")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    w = CowSinkDataSource({"tablePath": p, "txnAppId": "t1"}).streamWriter(
        cow.table_schema(spark, p), overwrite=False
    )
    rows = spark.createDataFrame(
        [(100, "x", 1.25)], "k long, s string, value double"
    ).collect()
    w.commit([w.write(iter(rows))], batchId=0)
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert (100, "x", 1.25) in got
    # the sink entry's manifest stats are physical-keyed like staging
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    sink_entries = [e for e in m["files"] if e["name"].startswith("sink-")]
    assert sink_entries and all("v" in e["stats"] for e in sink_entries)
    # the staged file holds the PHYSICAL column, so engine DML on the
    # logical name reaches it through the column mapping
    cow.update(spark, p, "value = 1.25", {"s": "'X'"})
    assert (100, "X", 1.25) in {tuple(r) for r in cow.read(spark, p).collect()}
