"""Metadata tables (``cow.`path`.files/.history/.snapshots`` through
gate SQL; ``metadata_files``/``metadata_history`` in Python) and
``REORG ... APPLY (PURGE)`` — the targeted deletion-vector
materialization that closes the MOR lifecycle."""

from __future__ import annotations

import os

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path, write_mode=None):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(60)], "k long, g string, v double"
    ).repartition(4)
    cow.create(spark, path, df, write_mode=write_mode)


def test_metadata_files_tracks_dv_and_live_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    s1 = cow.current_snapshot(spark, p)
    cow.delete(spark, p, "k < 10", mode="mor")
    files = cow.metadata_files(spark, p).collect()
    assert sum(r["rows"] for r in files) == 60  # physical
    assert sum(r["live_rows"] for r in files) == 50
    assert sum(r["dv_rows"] for r in files) == 10
    assert any(r["dv_file"] for r in files)
    # time travel: the pre-delete files table has no DVs
    v0 = cow.metadata_files(spark, p, snapshot=s1).collect()
    assert sum(r["dv_rows"] for r in v0) == 0 and all(r["dv_file"] is None for r in v0)


def test_metadata_tables_through_sql(spark, tmp_path):
    p = str(tmp_path / "sqlmeta")
    _mk(spark, p)
    s1 = cow.current_snapshot(spark, p)
    cow.delete(spark, p, "k % 2 = 0", mode="mor")
    live = run_sql(
        spark, f"SELECT CAST(SUM(live_rows) AS BIGINT) AS n FROM cow.`{p}`.files"
    ).collect()[0]["n"]
    assert live == cow.read(spark, p).count() == 30
    v0 = run_sql(
        spark,
        f"SELECT CAST(SUM(live_rows) AS BIGINT) AS n FROM cow.`{p}`.files "
        f"VERSION AS OF {s1}",
    ).collect()[0]["n"]
    assert v0 == 60
    hist = run_sql(
        spark, f"SELECT snapshot_id, operation, n_rows_live FROM cow.`{p}`.history"
    ).collect()
    assert [(r["snapshot_id"], r["operation"]) for r in hist] == [
        (1, "create"),
        (2, "mor_delete"),
    ]
    assert hist[-1]["n_rows_live"] == 30
    # .snapshots is an alias of the log table
    assert run_sql(spark, f"SELECT COUNT(*) AS n FROM cow.`{p}`.snapshots").collect()[
        0
    ]["n"] == 2
    with pytest.raises(ValueError, match="time travel"):
        run_sql(spark, f"SELECT * FROM cow.`{p}`.history VERSION AS OF 1")


def test_reorg_purge_rewrites_only_dv_files(spark, tmp_path):
    p = str(tmp_path / "reorg")
    _mk(spark, p)
    cow.delete(spark, p, "k < 3", mode="mor")  # masks a subset of files
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    dvd = {f["name"] for f in m["files"] if f.get("dv")}
    clean = {f["name"] for f in m["files"] if not f.get("dv")}
    assert dvd and clean  # the delete must not have touched every file
    want = {tuple(r) for r in cow.read(spark, p).collect()}
    s_before = cow.current_snapshot(spark, p)
    st = cow.reorg_purge(spark, p)
    assert st["files_rewritten"] == len(dvd)
    m2 = cow._load_manifest(spark, p, st["snapshot_id"])
    names2 = {f["name"] for f in m2["files"]}
    assert clean <= names2  # clean files carried verbatim
    assert not (dvd & names2) and all(not f.get("dv") for f in m2["files"])
    assert {tuple(r) for r in cow.read(spark, p).collect()} == want
    # content-identical: zero CDC rows across the purge
    assert cow.changes(spark, p, s_before).count() == 0


def test_reorg_ratio_gate_and_sql(spark, tmp_path):
    p = str(tmp_path / "ratio")
    _mk(spark, p, write_mode="mor")
    cow.delete(spark, p, "k = 0")  # tiny dv on one file
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert any(f.get("dv") for f in m["files"])
    # ratio 0.5: a 1-row mask on a ~15-row file is below the bar
    st = run_sql(spark, f"REORG TABLE cow.`{p}` APPLY (PURGE RATIO 0.5)").collect()[0]
    assert st["files_rewritten"] == 0
    st2 = run_sql(spark, f"REORG `{p}` APPLY (PURGE)").collect()[0]
    assert st2["files_rewritten"] >= 1
    m2 = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert all(not f.get("dv") for f in m2["files"])
    # purged DV becomes unreferenced -> vacuum reclaims it
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0.0)
    dv_dir = os.path.join(p, "_dv")
    left = [n for n in os.listdir(dv_dir) if n.endswith(".parquet")] if os.path.isdir(dv_dir) else []
    assert left == []
