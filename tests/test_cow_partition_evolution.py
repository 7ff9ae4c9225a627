"""Partition-spec evolution (r11 punch #1): ``ALTER TABLE ... ADD /
DROP PARTITION FIELD`` re-layouts a COW table with ZERO data
rewritten — Iceberg's signature lake capability. A file's spec
vintage is its path shape (``cowtable._part_keys``); reads group
scans per vintage, per-file stats prune under each file's own spec,
and rewrites migrate touched files to the current spec. The
reference's only layout-change answer is a full reload
(``pipeline.py:213``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, tmp_path, name="evo", partition_by=("region",), n=24, **kw):
    p = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"r{i % 3}", f"p{i % 2}", i * 10) for i in range(n)],
        "k long, region string, prio string, v long",
    ).coalesce(2)  # multi-row files, so rewrites have survivors
    cow.create(spark, p, df, partition_by=list(partition_by), **kw)
    return p, df


def test_add_field_is_metadata_only(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    m1 = cow._load_manifest(spark, p, 1)
    snap = cow.alter_add_partition_field(spark, p, "prio")
    m2 = cow._load_manifest(spark, p, snap)
    assert m2["files"] == m1["files"]  # zero rewrite
    assert m2["partition_by"] == ["region", "prio"]
    assert [s["fields"] for s in m2["partition_specs"]] == [
        ["region"],
        ["region", "prio"],
    ]
    assert m2["default_spec_id"] == 1
    # content identical across the commit
    assert cow.read(spark, p).count() == cow.read(spark, p, snapshot=1).count()


def test_mixed_vintage_read_and_pruning(spark, tmp_path):
    p, df = _mk(spark, tmp_path)
    cow.alter_add_partition_field(spark, p, "prio")
    extra = spark.createDataFrame(
        [(100 + i, f"r{i % 3}", f"p{i % 2}", 7) for i in range(6)],
        "k long, region string, prio string, v long",
    )
    cow.append(spark, p, extra)
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    vintages = {cow._part_keys(f["name"]) for f in m["files"]}
    assert vintages == {("region",), ("region", "prio")}
    out = cow.read(spark, p)
    assert out.count() == 30
    # the added field reads correctly from BOTH vintages (old: data
    # bytes, new: directory name)
    assert out.filter("prio = 'p0'").count() == 12 + 3
    # pruning holds per vintage: region prunes everywhere, prio
    # prunes at least the new vintage's other-prio directories
    n_all = len(m["files"])
    assert len(cow.stats_candidate_files(m, "region = 'r1'")) < n_all
    assert len(cow.stats_candidate_files(m, "prio = 'p1'")) < n_all
    # old-vintage entries carry only their own spec's values
    old = [f for f in m["files"] if cow._part_keys(f["name"]) == ("region",)]
    assert all(set(f.get("partition", {})) == {"region"} for f in old)
    # the .files metadata table surfaces each file's spec vintage
    mf = cow.metadata_files(spark, p).collect()
    assert {r["spec_id"] for r in mf} == {0, 1}


def test_dml_spans_vintages_and_migrates(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    cow.alter_add_partition_field(spark, p, "prio")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(200, "r0", "p0", 1), (201, "r1", "p1", 2)],
            "k long, region string, prio string, v long",
        ),
    )
    # DELETE on the ADDED field hits rows in old files (data bytes)
    # and new files (dir value)
    st = cow.delete(spark, p, "prio = 'p0'")
    assert st["files_rewritten"] >= 1
    out = cow.read(spark, p)
    assert out.filter("prio = 'p0'").count() == 0
    assert out.count() == 12 + 1
    # every REWRITTEN survivor landed under the CURRENT spec
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    snap_tag = f"snap{m['snapshot_id']:08d}"
    rewritten = [f["name"] for f in m["files"] if snap_tag in f["name"]]
    assert rewritten and all(
        cow._part_keys(n) == ("region", "prio") for n in rewritten
    )
    # UPDATE across vintages too
    cow.update(spark, p, "prio = 'p1' AND k < 6", {"v": "-1"})
    assert cow.read(spark, p).filter("v = -1").count() == 3


def test_drop_field_and_round_trip(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    cow.alter_add_partition_field(spark, p, "prio")
    snap = cow.alter_drop_partition_field(spark, p, "region")
    m = cow._load_manifest(spark, p, snap)
    assert m["partition_by"] == ["prio"]
    assert len(m["partition_specs"]) == 3
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(300, "rZ", "p0", 5)], "k long, region string, prio string, v long"
        ),
    )
    out = cow.read(spark, p)
    assert out.count() == 25
    assert out.filter("region = 'rZ'").first().v == 5
    # re-adding an old field REUSES its spec id (no unbounded growth)
    snap = cow.alter_add_partition_field(spark, p, "region")
    m = cow._load_manifest(spark, p, snap)
    assert m["partition_by"] == ["prio", "region"]


def test_compact_migrates_all_vintages(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    cow.alter_add_partition_field(spark, p, "prio")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(400, "r0", "p1", 9)], "k long, region string, prio string, v long"
        ),
    )
    cow.compact(spark, p)
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert {cow._part_keys(f["name"]) for f in m["files"]} == {
        ("region", "prio")
    }
    assert cow.read(spark, p).count() == 25


def test_time_travel_uses_snapshot_spec(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    cow.alter_add_partition_field(spark, p, "prio")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(500, "r9", "p9", 1)], "k long, region string, prio string, v long"
        ),
    )
    # snapshot 1 predates the evolution entirely
    old = cow.read(spark, p, snapshot=1)
    assert old.count() == 24
    assert old.filter("region = 'r9'").count() == 0
    # history records the evolution operations
    ops = [h["operation"] for h in cow.history(spark, p)]
    assert "add_partition_field_prio" in ops


def test_refusals(spark, tmp_path):
    p, _ = _mk(spark, tmp_path, bucket_by=["k"], num_buckets=4)
    with pytest.raises(ValueError, match="does not exist"):
        cow.alter_add_partition_field(spark, p, "ghost")
    with pytest.raises(ValueError, match="already a partition field"):
        cow.alter_add_partition_field(spark, p, "region")
    with pytest.raises(ValueError, match="bucket"):
        cow.alter_add_partition_field(spark, p, "k")
    with pytest.raises(ValueError, match="not a partition field"):
        cow.alter_drop_partition_field(spark, p, "prio")
    # renamed columns refuse (directory names bypass column mapping)
    p2, _ = _mk(spark, tmp_path, name="evo_rn")
    cow.alter_rename_column(spark, p2, "prio", "prio2")
    with pytest.raises(ValueError, match="renamed"):
        cow.alter_add_partition_field(spark, p2, "prio2")
    # once-partitioned columns refuse drop/rename/widen forever (old
    # files' bytes live in their directory names)
    p3, _ = _mk(spark, tmp_path, name="evo_guard")
    cow.alter_add_partition_field(spark, p3, "prio")
    cow.alter_drop_partition_field(spark, p3, "prio")
    with pytest.raises(ValueError, match="partition column"):
        cow.alter_drop_column(spark, p3, "prio")
    with pytest.raises(ValueError, match="partition column"):
        cow.alter_rename_column(spark, p3, "prio", "p9")


def test_sql_gate_route_and_describe(spark, tmp_path):
    p, _ = _mk(spark, tmp_path, name="evo_sql")
    run_sql(spark, f"ALTER TABLE `{p}` ADD PARTITION FIELD prio")
    rows = {
        r.col_name: r.data_type
        for r in run_sql(spark, f"DESCRIBE TABLE `{p}`").collect()
    }
    assert rows["# partition_by"] == "region, prio"
    assert rows["# partition_spec[0]"] == "region"
    assert rows["# partition_spec[1]"] == "region, prio (default)"
    run_sql(spark, f"ALTER TABLE `{p}` DROP PARTITION FIELD region")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert m["partition_by"] == ["prio"]


def test_bucketed_view_refuses_mixed_vintage(spark, tmp_path):
    p, _ = _mk(
        spark, tmp_path, name="evo_bkt", partition_by=("region",),
        bucket_by=["k"], num_buckets=4,
    )
    cow.alter_add_partition_field(spark, p, "prio")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(600, "r0", "p0", 3)], "k long, region string, prio string, v long"
        ),
    )
    with pytest.raises(ValueError, match="partition spec"):
        cow.bucketed_view(spark, p, "evo_bkt_view")
    # compact migrates every vintage; the view then registers fine
    cow.compact(spark, p)
    assert cow.bucketed_view(spark, p, "evo_bkt_view").count() == 25
    spark.sql("DROP TABLE IF EXISTS evo_bkt_view")


def test_dsv2_batch_reader_mixed_vintage(spark, tmp_path):
    """The DSv2 ``cow`` batch reader is per-file (partition values
    from each file's OWN path), so mixed spec vintages read without
    any special-casing — pinned here against the engine read."""
    from data_warehouse_solution_spark.sources.cow_batch import (
        register_cow_batch,
    )

    p, _ = _mk(spark, tmp_path, name="evo_dsv2")
    cow.alter_add_partition_field(spark, p, "prio")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(700, "r0", "p1", 42)], "k long, region string, prio string, v long"
        ),
    )
    register_cow_batch(spark)
    df = spark.read.format("cow").option("tablePath", p).load()
    assert df.count() == 25
    assert df.filter("prio = 'p1'").count() == 12 + 1
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, cow.read(spark, p).collect())
    )


def test_partition_transform_via_generated_column(spark, tmp_path):
    """Iceberg's TRANSFORM partitioning (days(ts), truncate(col))
    composes from existing levers: a GENERATED column materializes
    the transform, partition evolution moves the layout onto it —
    no new spec machinery, and every writer (engine, gate, DSv2)
    recomputes the transform before staging."""
    import datetime

    p = str(tmp_path / "evo_gen")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 3, 6 + i % 12), i * 2)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v long").coalesce(2)
    cow.create(
        spark,
        p,
        df,
        generated_columns={"day": "CAST(date_trunc('DAY', ts) AS DATE)"},
    )
    cow.alter_add_partition_field(spark, p, "day")
    cow.append(
        spark,
        p,
        spark.createDataFrame(
            [(100, datetime.datetime(2024, 1, 9, 3), 7)],
            "k long, ts timestamp, v long",
        ),
    )
    out = cow.read(spark, p)
    assert out.count() == 13
    # the generated transform column reads correctly from BOTH
    # vintages (old: data bytes; new: typed directory value)
    assert out.filter("day = DATE'2024-01-09'").first().k == 100
    assert out.filter("day = DATE'2024-01-02'").count() == 4
    # new files landed under day= directories
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    new = [f for f in m["files"] if "day=" in f["name"]]
    assert new and all(f["partition"].get("day") == "2024-01-09" for f in new)
    # DML preserves the transform layout across vintages
    cow.delete(spark, p, "day = DATE'2024-01-01'")
    assert cow.read(spark, p).count() == 13 - 4


def test_dsv2_batch_writer_lands_under_current_spec(spark, tmp_path):
    """A DSv2 batch write planned AFTER an evolution stages under the
    CURRENT spec (two-level dirs) while old-vintage files stay put —
    the writer needs no special-casing because it captures
    partition_by from the head manifest at planning."""
    from data_warehouse_solution_spark.sources.cow_batch import (
        register_cow_batch,
    )

    p, _ = _mk(spark, tmp_path, name="evo_wr")
    cow.alter_add_partition_field(spark, p, "prio")
    register_cow_batch(spark)
    (
        spark.createDataFrame(
            [(900, "r1", "p0", 3)], "k long, region string, prio string, v long"
        )
        .write.format("cow")
        .option("tablePath", p)
        .mode("append")
        .save()
    )
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    new = [f for f in m["files"] if f.get("partition", {}).get("prio")]
    assert new and all(
        cow._part_keys(f["name"]) == ("region", "prio") for f in new
    )
    assert cow.read(spark, p).filter("k = 900").count() == 1
    assert cow.read(spark, p).count() == 25
