"""RENAME COLUMN via column mapping (``alter_rename_column``): the
parquet bytes and manifest stats stay under the original PHYSICAL
name; only the logical schema changes. Renames must be zero-rewrite,
work across file vintages, keep stat/bloom pruning effective, compose
with DML/DV/CDC, and the re-add-after-drop/rename stale-resurrection
trap must NULL-fill instead."""

from __future__ import annotations

import os

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path, **kw):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(40)], "k long, s string, v double"
    ).repartition(3)
    cow.create(spark, path, df, **kw)


def _files(path):
    out = []
    for root, _d, ns in os.walk(os.path.join(path, "data")):
        out += [n for n in ns if n.endswith(".parquet")]
    return sorted(out)


def test_rename_is_metadata_only_and_reads_back(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    before = _files(p)
    snap = cow.alter_rename_column(spark, p, "v", "value")
    assert _files(p) == before  # zero rewrite
    df = cow.read(spark, p)
    assert df.columns == ["k", "s", "value"]
    assert df.filter("value = 7.0").count() == 1
    # the pre-rename snapshot still shows the old name (time travel)
    assert cow.read(spark, p, snap - 1).columns == ["k", "s", "v"]


def test_rename_then_dml_mixes_file_vintages(spark, tmp_path):
    p = str(tmp_path / "mix")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    # new-vintage file written AFTER the rename (physical name 'v')
    cow.append(
        spark,
        p,
        spark.createDataFrame([(100, "x", 1.5)], "k long, s string, value double"),
    )
    cow.update(spark, p, "k = 0", {"value": "value + 10"})
    cow.delete(spark, p, "value > 35 AND value < 100")
    got = {(r["k"], r["value"]) for r in cow.read(spark, p).collect()}
    want = {(i, float(i)) for i in range(1, 36)} | {(0, 10.0), (100, 1.5)}
    assert got == want


def test_rename_keeps_stat_pruning_effective(spark, tmp_path):
    p = str(tmp_path / "prune")
    df = spark.range(0, 900).selectExpr("id as k", "cast(id as double) as v")
    cow.create(spark, p, df.repartitionByRange(6, "k"))
    cow.alter_rename_column(spark, p, "k", "key")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    # the predicate names the LOGICAL column; stats are physical-keyed
    cands = cow.stats_candidate_files(m, "key = 5")
    assert len(cands) == 1  # range-clustered: one file may hold key=5
    st = cow.delete(spark, p, "key = 5")
    assert st["files_rewritten"] == 1


def test_rename_bloom_column_keeps_probing(spark, tmp_path):
    p = str(tmp_path / "bloom")
    df = spark.createDataFrame(
        [(i, f"u{i:04d}") for i in range(400)], "k long, uid string"
    ).repartition(4)
    cow.create(spark, p, df, bloom_columns=["uid"])
    cow.alter_rename_column(spark, p, "uid", "user_id")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert m["bloom_columns"] == ["user_id"]
    # an absent key must prune to zero candidates THROUGH the bloom
    assert cow.stats_candidate_files(m, "user_id = 'nope'") == []
    # a present key still finds its file
    assert len(cow.stats_candidate_files(m, "user_id = 'u0007'")) >= 1
    # and new files after the rename are bloom-indexed consistently
    cow.append(spark, p, spark.createDataFrame([(900, "u0900")], "k long, user_id string"))
    m2 = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert len(cow.stats_candidate_files(m2, "user_id = 'u0900'")) == 1


def test_readd_after_drop_nullfills_not_resurrects(spark, tmp_path):
    p = str(tmp_path / "readd")
    _mk(spark, p)
    cow.alter_drop_column(spark, p, "v")
    cow.alter_add_column(spark, p, "v", "double")
    vals = {r["v"] for r in cow.read(spark, p).collect()}
    assert vals == {None}  # stale bytes must NOT resurrect


def test_readd_after_rename_nullfills(spark, tmp_path):
    p = str(tmp_path / "rn_readd")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    cow.alter_add_column(spark, p, "v", "string")
    rows = cow.read(spark, p).filter("k = 3").collect()[0]
    assert rows["value"] == 3.0 and rows["v"] is None


def test_rename_guards(spark, tmp_path):
    p = str(tmp_path / "guards")
    df = spark.createDataFrame([(1, "x", 2.0)], "k long, part string, v double")
    cow.create(
        spark, p, df, partition_by=["part"], check_constraints={"v_pos": "v > 0"}
    )
    with pytest.raises(ValueError, match="partition column"):
        cow.alter_rename_column(spark, p, "part", "p2")
    with pytest.raises(ValueError, match="CHECK constraint"):
        cow.alter_rename_column(spark, p, "v", "val")
    with pytest.raises(ValueError, match="already exists"):
        cow.alter_rename_column(spark, p, "k", "v")
    with pytest.raises(ValueError, match="does not exist"):
        cow.alter_rename_column(spark, p, "nope", "x")


def test_rename_roundtrip_restores_identity_mapping(spark, tmp_path):
    p = str(tmp_path / "back")
    _mk(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    cow.alter_rename_column(spark, p, "value", "v")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert not m.get("physical_names")  # identity map dropped
    assert cow.read(spark, p).filter("v = 7.0").count() == 1


def test_rename_with_mor_dv_and_cdc(spark, tmp_path):
    p = str(tmp_path / "dv")
    _mk(spark, p, write_mode="mor")
    cow.delete(spark, p, "v < 5")
    s1 = cow.current_snapshot(spark, p)
    cow.alter_rename_column(spark, p, "v", "value")
    st = cow.delete(spark, p, "value >= 35")
    assert cow.read(spark, p).count() == 30
    ch = cow.changes(spark, p, s1, st["snapshot_id"]).collect()
    assert {r["value"] for r in ch} == {35.0, 36.0, 37.0, 38.0, 39.0}
    assert all(r["_change_type"] == "delete" for r in ch)


def test_rename_through_gate_sql_and_batch_source(spark, tmp_path):
    from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch

    p = str(tmp_path / "sql")
    _mk(spark, p)
    run_sql(spark, f"ALTER TABLE cow.`{p}` RENAME COLUMN s TO label")
    got = run_sql(
        spark, f"SELECT label FROM cow.`{p}` WHERE k = 4"
    ).collect()[0]["label"]
    assert got == "s4"
    register_cow_batch(spark)
    df = spark.read.format("cow").option("tablePath", p).load()
    assert df.columns == ["k", "label", "v"]
    assert df.filter("label = 's9'").count() == 1
