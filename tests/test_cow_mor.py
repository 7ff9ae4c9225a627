"""Merge-on-read deletion vectors (``cowtable`` ``mode="mor"``):
DELETE/UPDATE must commit WITHOUT rewriting data files, reads (Python
API, SQL gate, DSv2 batch source) must mask exactly the DV'd
positions, and every surrounding verb — CDC, compaction, vacuum,
rollback, time travel, constraints — must compose with DVs the way
the COW path composes with rewrites. The strongest checks are
differential: the same DML sequence in MOR and COW modes must land
byte-identical table states."""

from __future__ import annotations

import os

import pytest

import data_warehouse_solution_spark.cowtable as cow


def _mk(spark, path, write_mode=None, partition_by=None, rows=None):
    df = spark.createDataFrame(
        rows
        or [(i, f"g{i % 3}", float(i)) for i in range(60)],
        "k long, g string, v double",
    ).repartition(4)
    cow.create(spark, path, df, partition_by=partition_by, write_mode=write_mode)
    return df


def _data_files(path):
    out = []
    for root, _dirs, names in os.walk(os.path.join(path, "data")):
        out += [n for n in names if n.endswith(".parquet")]
    return sorted(out)


def _dv_files(path):
    d = os.path.join(path, "_dv")
    if not os.path.isdir(d):
        return []
    return sorted(n for n in os.listdir(d) if n.endswith(".parquet"))


def _rows(spark, path, snapshot=None):
    return {tuple(r) for r in cow.read(spark, path, snapshot).collect()}


def test_mor_delete_rewrites_nothing_and_matches_cow(spark, tmp_path):
    p_mor, p_cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    _mk(spark, p_mor)
    _mk(spark, p_cow)
    before = _data_files(p_mor)
    st = cow.delete(spark, p_mor, "k % 5 = 0", mode="mor")
    cow.delete(spark, p_cow, "k % 5 = 0")
    assert st["files_rewritten"] == 0 and st["files_written"] == 0
    assert st["rows_deleted"] == 12 and st["files_dv"] >= 1
    assert _data_files(p_mor) == before  # not one data file touched
    assert len(_dv_files(p_mor)) == 1
    assert _rows(spark, p_mor) == _rows(spark, p_cow)
    assert cow.read(spark, p_mor).count() == 48


def test_mor_delete_accumulates_and_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.delete(spark, p, "k < 10", mode="mor")
    st2 = cow.delete(spark, p, "k >= 50", mode="mor")
    assert st2["rows_deleted"] == 10
    assert _rows(spark, p) == {(i, f"g{i % 3}", float(i)) for i in range(10, 50)}
    # re-deleting already-deleted rows is a no-op commit-wise
    st3 = cow.delete(spark, p, "k < 10", mode="mor")
    assert st3["rows_deleted"] == 0 and st3["snapshot_id"] == st2["snapshot_id"]


def test_mor_delete_null_three_valued_semantics(spark, tmp_path):
    p = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "k long, s string"
    )
    cow.create(spark, p, df)
    cow.delete(spark, p, "s = 'a'", mode="mor")
    # the NULL row must SURVIVE (predicate is NULL, not TRUE)
    assert _rows(spark, p) == {(2, None), (3, "b")}


def test_mor_full_file_delete_drops_entry(spark, tmp_path):
    p = str(tmp_path / "full")
    _mk(spark, p)
    st = cow.delete(spark, p, "k >= 0", mode="mor")  # everything
    assert cow.read(spark, p).count() == 0
    m = cow._load_manifest(spark, p, st["snapshot_id"])
    assert m["files"] == []  # no entry carried just to mask 100% of it
    assert st["files_removed"] > 0 and st["files_dv"] == 0


def test_mor_update_appends_and_matches_cow(spark, tmp_path):
    p_mor, p_cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    _mk(spark, p_mor)
    _mk(spark, p_cow)
    before = _data_files(p_mor)
    st = cow.update(spark, p_mor, "k % 7 = 0", {"v": "v + 100.0"}, mode="mor")
    cow.update(spark, p_cow, "k % 7 = 0", {"v": "v + 100.0"})
    assert st["files_rewritten"] == 0 and st["files_written"] >= 1
    assert set(before) <= set(_data_files(p_mor))  # originals untouched
    assert _rows(spark, p_mor) == _rows(spark, p_cow)


def test_write_mode_table_default_routes_dml_to_mor(spark, tmp_path):
    p = str(tmp_path / "dvtable")
    _mk(spark, p, write_mode="mor")
    st = cow.delete(spark, p, "k = 3")  # no per-call mode
    m = cow._load_manifest(spark, p, st["snapshot_id"])
    assert m["operation"] == "mor_delete" and m.get("write_mode") == "mor"
    # per-call override back to COW still works
    st2 = cow.update(spark, p, "k = 4", {"v": "0.0"}, mode="cow")
    assert cow._load_manifest(spark, p, st2["snapshot_id"])["operation"] == "update"
    # and the property survives unrelated commits (carried forward)
    cow.alter_add_column(spark, p, "extra", "int")
    st3 = cow.delete(spark, p, "k = 5")
    assert cow._load_manifest(spark, p, st3["snapshot_id"])["operation"] == "mor_delete"


def test_mor_time_travel_and_changes_feed(spark, tmp_path):
    p = str(tmp_path / "cdc")
    _mk(spark, p)
    s1 = cow.current_snapshot(spark, p)
    st = cow.delete(spark, p, "k < 5", mode="mor")
    # time travel: the pre-delete snapshot still shows all 60 rows
    assert cow.read(spark, p, s1).count() == 60
    assert cow.read(spark, p).count() == 55
    ch = cow.changes(spark, p, s1, st["snapshot_id"]).collect()
    assert {(r["k"], r["_change_type"]) for r in ch} == {
        (k, "delete") for k in range(5)
    }
    # MOR update surfaces as delete+insert pairs, like a COW update
    st2 = cow.update(spark, p, "k = 10", {"v": "-1.0"}, mode="mor")
    ch2 = cow.changes(spark, p, st["snapshot_id"], st2["snapshot_id"]).collect()
    assert {(r["k"], r["v"], r["_change_type"]) for r in ch2} == {
        (10, 10.0, "delete"),
        (10, -1.0, "insert"),
    }


def test_compact_materializes_dvs_and_vacuum_reclaims(spark, tmp_path):
    p = str(tmp_path / "opt")
    _mk(spark, p)
    cow.delete(spark, p, "k % 2 = 0", mode="mor")
    assert len(_dv_files(p)) == 1
    want = _rows(spark, p)
    s_before = cow.current_snapshot(spark, p)
    cow.compact(spark, p, target_files=2)
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert all(not f.get("dv") for f in m["files"])  # DVs purged
    assert _rows(spark, p) == want
    # content-identical rewrite: zero CDC rows across the compact
    assert cow.changes(spark, p, s_before).count() == 0
    # vacuum drops the now-unreferenced DV file (age guard disabled)
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0.0)
    assert _dv_files(p) == []


def test_vacuum_keeps_referenced_dv_and_rollback_guards(spark, tmp_path):
    p = str(tmp_path / "vac")
    _mk(spark, p)
    s1 = cow.current_snapshot(spark, p)
    cow.delete(spark, p, "k < 30", mode="mor")
    s2 = cow.current_snapshot(spark, p)
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0.0)
    assert len(_dv_files(p)) == 1  # head references it — must survive
    assert cow.read(spark, p).count() == 30
    with pytest.raises(ValueError, match="not available"):
        cow.read(spark, p, s1).count()  # expired by vacuum
    # rollback to the DV snapshot works while its DV file exists
    cow.rollback(spark, p, s2)
    assert cow.read(spark, p).count() == 30


def test_mor_on_partitioned_table(spark, tmp_path):
    p = str(tmp_path / "part")
    _mk(spark, p, partition_by=["g"])
    st = cow.delete(spark, p, "g = 'g1' AND k < 30", mode="mor")
    assert st["files_rewritten"] == 0
    want = {
        (i, f"g{i % 3}", float(i))
        for i in range(60)
        if not (i % 3 == 1 and i < 30)
    }
    assert _rows(spark, p) == want


def test_mor_update_respects_check_constraints(spark, tmp_path):
    p = str(tmp_path / "chk")
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k long, v double")
    cow.create(spark, p, df, check_constraints={"v_pos": "v > 0"})
    with pytest.raises(cow.CowConstraintViolation):
        cow.update(spark, p, "k = 1", {"v": "-9.0"}, mode="mor")
    # aborted commit left no snapshot, no orphan DV
    assert cow.read(spark, p).count() == 2
    assert _rows(spark, p) == {(1, 5.0), (2, 6.0)}
    assert _dv_files(p) == []


def test_mor_mixed_with_cow_dml_differential(spark, tmp_path):
    """The same statement sequence, COW vs MOR per statement, must
    converge to the same table state (including a COW rewrite ON TOP
    of DV'd files, which must drop the rewritten files' DVs)."""
    p_a, p_b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk(spark, p_a)
    _mk(spark, p_b)
    seq = [
        ("delete", "k % 11 = 0", None),
        ("update", "k % 4 = 1", {"v": "v * 2"}),
        ("delete", "v > 80", None),
        ("update", "g = 'g2'", {"g": "'gX'"}),
    ]
    for i, (op, cond, assign) in enumerate(seq):
        mode_a = "mor" if i % 2 == 0 else "cow"
        mode_b = "cow" if i % 2 == 0 else "mor"
        if op == "delete":
            cow.delete(spark, p_a, cond, mode=mode_a)
            cow.delete(spark, p_b, cond, mode=mode_b)
        else:
            cow.update(spark, p_a, cond, assign, mode=mode_a)
            cow.update(spark, p_b, cond, assign, mode=mode_b)
    assert _rows(spark, p_a) == _rows(spark, p_b)


def test_batch_source_applies_deletion_vectors(spark, tmp_path):
    from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch

    p = str(tmp_path / "dsv2")
    _mk(spark, p)
    cow.delete(spark, p, "k % 3 = 0", mode="mor")
    s_dv = cow.current_snapshot(spark, p)
    cow.update(spark, p, "k = 1", {"v": "99.5"}, mode="mor")
    register_cow_batch(spark)
    got = {
        tuple(r)
        for r in spark.read.format("cow").option("tablePath", p).load().collect()
    }
    assert got == _rows(spark, p)
    # versioned read of the intermediate DV snapshot
    got_v = {
        tuple(r)
        for r in spark.read.format("cow")
        .option("tablePath", p)
        .option("versionAsOf", str(s_dv))
        .load()
        .collect()
    }
    assert got_v == _rows(spark, p, s_dv)


def test_gate_sql_dml_on_mor_table(spark, tmp_path):
    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "gate")
    _mk(spark, p, write_mode="mor")
    before = _data_files(p)
    run_sql(spark, f"DELETE FROM cow.`{p}` WHERE k < 20")
    run_sql(spark, f"UPDATE cow.`{p}` SET v = v + 1 WHERE k = 25")
    assert _data_files(p)[: len(before)] == before  # originals intact
    got = {tuple(r) for r in run_sql(spark, f"SELECT k, v FROM cow.`{p}`").collect()}
    want = {(i, float(i) + (1.0 if i == 25 else 0.0)) for i in range(20, 60)}
    assert got == want
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert any(f.get("dv") for f in m["files"])  # SQL DML took the DV path


def test_alter_set_write_mode_toggles_dml_default(spark, tmp_path):
    """r11: ALTER TABLE SET TBLPROPERTIES ('write_mode'=...) flips the
    DML default between copy-on-write and merge-on-read with a
    metadata-only commit; outstanding DVs keep applying after a flip
    back to cow; malformed/unknown properties refuse."""
    import pytest as _pytest

    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "wmflip")
    cow.create(
        spark, p,
        spark.createDataFrame([(i, i * 10) for i in range(10)], "k long, v long").coalesce(1),
    )
    n_files_before = len(cow._load_manifest(spark, p, 1)["files"])
    run_sql(spark, f"ALTER TABLE `{p}` SET TBLPROPERTIES ('write_mode'='mor')")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert m["write_mode"] == "mor" and len(m["files"]) == n_files_before
    # DML now defaults to merge-on-read: DELETE leaves a DV, no rewrite
    cow.delete(spark, p, "k = 3")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert any(f.get("dv") for f in m["files"])
    assert cow.read(spark, p).count() == 9
    # flip back to cow: outstanding DVs still apply on read, and the
    # NEXT delete rewrites (materializing the masked file's DV too)
    run_sql(spark, f"ALTER TABLE `{p}` SET TBLPROPERTIES ('write_mode'='cow')")
    assert cow.read(spark, p).count() == 9
    cow.delete(spark, p, "k = 5")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert not any(f.get("dv") for f in m["files"])
    assert sorted(r.k for r in cow.read(spark, p).collect()) == [0, 1, 2, 4, 6, 7, 8, 9]
    # no-op set never burns a snapshot
    before = cow.current_snapshot(spark, p)
    run_sql(spark, f"ALTER TABLE `{p}` SET TBLPROPERTIES ('write_mode'='cow')")
    assert cow.current_snapshot(spark, p) == before
    # refuse-loudly parity with CREATE's TBLPROPERTIES validation
    for bad in ("(write_mode=mor)", "('bogus'='1')", "()", "('write_mode'='fast')"):
        with _pytest.raises(ValueError):
            run_sql(spark, f"ALTER TABLE `{p}` SET TBLPROPERTIES {bad}")
    assert cow.read(spark, p).count() == 8
