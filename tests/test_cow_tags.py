"""Snapshot tags (r11): Iceberg-style named refs on COW tables —
metadata-only create/drop commits, VERSION AS OF '<tag>' time travel
across the gate / engine / DSv2 routes, vacuum retention of tagged
snapshots, RESTORE-to-tag, and the refusal surface."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path):
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
    )


def test_create_tag_is_metadata_only_commit(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    files_before = {
        f["name"] for f in cow._load_manifest(spark, p, 1)["files"]
    }
    snap = cow.create_tag(spark, p, "v1")
    assert snap == 2
    m = cow._load_manifest(spark, p, snap)
    assert m["tags"] == {"v1": 1}
    assert {f["name"] for f in m["files"]} == files_before  # zero data motion
    assert m["operation"] == "create_tag_v1"


def test_tags_carry_forward_through_dml(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.create_tag(spark, p, "v1")
    cow.delete(spark, p, "k = 1")
    cow.append(spark, p, spark.createDataFrame([(3, "c")], "k long, v string"))
    assert cow.tags(spark, p) == {"v1": 1}
    assert cow.resolve_ref(spark, p, "v1") == 1
    assert cow.read(spark, p, 1).count() == 2


def test_tag_no_op_and_replace(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    s1 = cow.create_tag(spark, p, "v1")
    # re-tagging the same snapshot under the same name never burns one
    assert cow.create_tag(spark, p, "v1", snapshot=1, replace=True) == s1
    cow.delete(spark, p, "k = 1")
    with pytest.raises(ValueError, match="already exists"):
        cow.create_tag(spark, p, "v1")
    cow.create_tag(spark, p, "v1", replace=True)
    assert cow.tags(spark, p)["v1"] == cow.resolve_ref(spark, p, "v1") > 1


def test_tag_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    with pytest.raises(ValueError, match="invalid tag name"):
        cow.create_tag(spark, p, "9bad name")
    with pytest.raises(ValueError, match="does not exist"):
        cow.create_tag(spark, p, "ghost", snapshot=99)
    with pytest.raises(ValueError, match="unknown tag"):
        cow.drop_tag(spark, p, "nope")
    with pytest.raises(ValueError, match="unknown tag"):
        cow.resolve_ref(spark, p, "nope")


def test_vacuum_retains_tagged_snapshots_until_drop(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.create_tag(spark, p, "pin")
    cow.delete(spark, p, "k = 1")
    cow.append(spark, p, spark.createDataFrame([(3, "c")], "k long, v string"))
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    # the tagged snapshot (and its files) survived the tightest window
    assert cow.read(spark, p, cow.resolve_ref(spark, p, "pin")).count() == 2
    cow.drop_tag(spark, p, "pin")
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    with pytest.raises(Exception):
        cow.read(spark, p, 1).count()


def test_gate_tag_lifecycle_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    run_sql(spark, f"ALTER TABLE cow.`{p}` CREATE TAG v1")
    run_sql(spark, f"DELETE FROM cow.`{p}` WHERE k = 1")
    n = run_sql(
        spark, f"SELECT count(*) AS n FROM cow.`{p}` VERSION AS OF 'v1'"
    ).collect()[0]["n"]
    assert n == 2
    got = {
        (r["tag"], r["snapshot_id"])
        for r in run_sql(spark, f"SHOW TAGS cow.`{p}`").collect()
    }
    assert got == {("v1", 1)}
    run_sql(spark, f"ALTER TABLE cow.`{p}` CREATE OR REPLACE TAG v1")
    assert cow.tags(spark, p)["v1"] > 1
    run_sql(spark, f"ALTER TABLE cow.`{p}` DROP TAG v1")
    assert cow.tags(spark, p) == {}
    with pytest.raises(ValueError, match="unknown tag"):
        run_sql(spark, f"SELECT * FROM cow.`{p}` VERSION AS OF 'ghost'")


def test_gate_create_tag_as_of_version(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.delete(spark, p, "k = 1")
    run_sql(spark, f"ALTER TABLE cow.`{p}` CREATE TAG first AS OF VERSION 1")
    assert cow.resolve_ref(spark, p, "first") == 1


def test_restore_to_tag(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    run_sql(spark, f"ALTER TABLE cow.`{p}` CREATE TAG keep")
    run_sql(spark, f"DELETE FROM cow.`{p}` WHERE k = 2")
    run_sql(spark, f"RESTORE TABLE cow.`{p}` TO VERSION AS OF 'keep'")
    assert cow.read(spark, p).count() == 2


def test_dsv2_reader_resolves_tag(spark, tmp_path):
    from data_warehouse_solution_spark.sources.cow_batch import (
        register_cow_batch,
    )

    register_cow_batch(spark)
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.create_tag(spark, p, "v1")
    cow.delete(spark, p, "k = 1")
    df = (
        spark.read.format("cow")
        .option("tablePath", p)
        .option("versionAsOf", "v1")
        .load()
    )
    assert df.count() == 2
    with pytest.raises(Exception, match="unknown tag"):
        (
            spark.read.format("cow")
            .option("tablePath", p)
            .option("versionAsOf", "ghost")
            .load()
            .count()
        )


def test_named_table_tags_through_catalog(spark, tmp_path):
    from data_warehouse_solution_spark import catalog as cat

    p = str(tmp_path / "t")
    _mk(spark, p)
    name = "tags_named_t"
    cat.register(spark, name, p)
    try:
        run_sql(spark, f"ALTER TABLE {name} CREATE TAG v1")
        run_sql(spark, f"DELETE FROM {name} WHERE k = 1")
        n = run_sql(
            spark, f"SELECT count(*) AS n FROM {name} VERSION AS OF 'v1'"
        ).collect()[0]["n"]
        assert n == 2
        got = {
            (r["tag"], r["snapshot_id"])
            for r in run_sql(spark, f"SHOW TAGS {name}").collect()
        }
        assert got == {("v1", 1)}
    finally:
        cat.unregister(spark, name)


def test_tags_survive_in_place_replace(spark, tmp_path):
    """Tags are snapshot refs, not layout: an in-place CREATE OR
    REPLACE keeps old snapshots readable (time travel crosses it), so
    the tag map — and the vacuum retention it promises — carries."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.create_tag(spark, p, "pre")
    cow.replace_table(
        spark, p, spark.createDataFrame([(9, "z")], "k long, v string")
    )
    assert cow.tags(spark, p) == {"pre": 1}
    assert cow.read(spark, p, cow.resolve_ref(spark, p, "pre")).count() == 2
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    # the tagged pre-replace snapshot survived the tightest window
    assert cow.read(spark, p, cow.resolve_ref(spark, p, "pre")).count() == 2


def test_cdc_ignores_tag_commits(spark, tmp_path):
    """A tag commit changes no files — batch CDC must attribute zero
    change rows to it (metadata-only commits are invisible to change
    capture) while neighboring DML still streams through."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.create_tag(spark, p, "v1")  # snapshot 2, metadata-only
    cow.delete(spark, p, "k = 1")  # snapshot 3
    ch = cow.changes(spark, p, 1, 3)
    rows = ch.collect()
    assert all(r["_commit_snapshot"] != 2 for r in rows)
    assert any(r["_change_type"] == "delete" for r in rows)


def test_restore_keeps_tags_and_identity_high_water(spark, tmp_path):
    """RESTORE must not rewind TABLE-level state: tags are durable
    refs to snapshots that all remain readable after the restore, and
    the identity counter must stay monotone or post-restore INSERTs
    re-issue ids present in still-readable newer snapshots."""
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        identity_columns={"id": {"start": 10, "step": 1}},
    )
    cow.create_tag(spark, p, "keep")  # snapshot 2
    cow.append(spark, p, spark.createDataFrame([(3, "c")], "k long, v string"))
    cow.create_tag(spark, p, "late")
    hwm_before = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))[
        "identity_columns"
    ]["id"]["high_water"]
    cow.rollback(spark, p, 2)
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    # both tags survive (the late one's snapshot is still readable)
    assert set(m["tags"]) == {"keep", "late"}
    # the counter did NOT rewind to snapshot 2's mark
    assert m["identity_columns"]["id"]["high_water"] == hwm_before
    cow.append(spark, p, spark.createDataFrame([(4, "d")], "k long, v string"))
    ids = [r["id"] for r in cow.read(spark, p).collect()]
    assert len(set(ids)) == len(ids)
    # vacuum still honors both tags after the restore
    cow.vacuum(spark, p, keep_last=1, min_file_age_seconds=0)
    assert cow.read(spark, p, cow.resolve_ref(spark, p, "keep")).count() == 2


def test_cowcdc_starting_timestamp_and_tag(spark, tmp_path):
    """cowcdc stream start options (r11 late): startingTimestamp is
    INCLUSIVE — the first snapshot committed at-or-after the instant
    streams as the first batch (Delta CDF parity; r12 fix: a commit
    stamped exactly at the timestamp used to be excluded) — and a
    non-numeric startingSnapshot resolves as a TAG name."""
    from data_warehouse_solution_spark.sources.cow_cdc import (
        register_cow_cdc,
    )

    register_cow_cdc(spark)
    p = str(tmp_path / "t")
    _mk(spark, p)  # snapshot 1
    cow.create_tag(spark, p, "v1")  # snapshot 2
    t_after_tag = cow._load_manifest(spark, p, 2)["committed_at"]
    cow.delete(spark, p, "k = 1")  # snapshot 3
    cow.append(spark, p, spark.createDataFrame([(9, "z")], "k long, v string"))

    def _drain(reader):
        q = (
            reader.load()
            .writeStream.format("memory")
            .queryName(f"cdcstart_{abs(hash(p)) % 10**8}")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(f"SELECT * FROM cdcstart_{abs(hash(p)) % 10**8}")

    got = _drain(
        spark.readStream.format("cowcdc")
        .option("tablePath", p)
        .option("startingTimestamp", t_after_tag)
    ).collect()
    # snapshot 2 (tag, stamped exactly at the timestamp — inclusive,
    # but a metadata commit emits no change rows) + the delete
    # (snapshot 3) + the insert (snapshot 4); nothing from the create
    kinds = sorted((r["_change_type"], r["k"]) for r in got)
    assert kinds == [("delete", 1), ("insert", 9)]
    # inclusivity pinned on a DATA commit: starting exactly at the
    # delete's own timestamp must stream the delete itself
    t_delete = cow._load_manifest(spark, p, 3)["committed_at"]
    got_incl = _drain(
        spark.readStream.format("cowcdc")
        .option("tablePath", p)
        .option("startingTimestamp", t_delete)
    ).collect()
    assert sorted((r["_change_type"], r["k"]) for r in got_incl) == [
        ("delete", 1),
        ("insert", 9),
    ]
    got2 = _drain(
        spark.readStream.format("cowcdc")
        .option("tablePath", p)
        .option("startingSnapshot", "v1")
    ).collect()
    assert sorted((r["_change_type"], r["k"]) for r in got2) == [
        ("delete", 1),
        ("insert", 9),
    ]
    import pytest as _pt

    with _pt.raises(Exception, match="unknown tag"):
        _drain(
            spark.readStream.format("cowcdc")
            .option("tablePath", p)
            .option("startingSnapshot", "ghost")
        )
    with _pt.raises(Exception, match="not both"):
        _drain(
            spark.readStream.format("cowcdc")
            .option("tablePath", p)
            .option("startingSnapshot", "1")
            .option("startingTimestamp", t_after_tag)
        )
