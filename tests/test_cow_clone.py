"""SHALLOW CLONE (r11 late): zero-copy writable snapshots via
symlinked data files — independence in both directions, layout/stat
carriage, DV links, time-travel clones, the vacuum-on-source hazard,
and the gate SQL route (paths and registered names)."""

from __future__ import annotations

import os

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path, **kw):
    cow.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ).repartition(2),
        **kw,
    )


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    _mk(spark, src)
    cow.shallow_clone(spark, src, dst)
    # every clone data file is a symlink into the source
    ddir = os.path.join(dst, "data")
    links = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
    assert links and all(os.path.islink(os.path.join(ddir, f)) for f in links)
    # DML on the clone writes its own files; the source never moves
    cow.delete(spark, dst, "k = 1")
    cow.append(spark, dst, spark.createDataFrame([(9, "z")], "k long, v string"))
    assert sorted(r["k"] for r in cow.read(spark, dst).collect()) == [2, 3, 9]
    assert sorted(r["k"] for r in cow.read(spark, src).collect()) == [1, 2, 3]
    assert cow.current_snapshot(spark, src) == 1
    # DML on the source never reaches the clone either
    cow.delete(spark, src, "k = 2")
    assert sorted(r["k"] for r in cow.read(spark, dst).collect()) == [2, 3, 9]


def test_clone_carries_layout_but_not_tags(spark, tmp_path):
    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    _mk(
        spark,
        src,
        check_constraints={"pos": "k > 0"},
        column_defaults={"v": "'d'"},
    )
    cow.create_tag(spark, src, "pin")
    cow.shallow_clone(spark, src, dst)
    m = cow._load_manifest(spark, dst, 1)
    assert m["check_constraints"] == {"pos": "k > 0"}
    assert m["column_defaults"] == {"v": "'d'"}
    assert "tags" not in m
    # the CHECK enforces on the clone's own writes
    with pytest.raises(Exception):
        cow.append(spark, dst, spark.createDataFrame([(-1,)], "k long"))
    # the default fills on the clone's own writes
    cow.append(spark, dst, spark.createDataFrame([(7,)], "k long"))
    assert (7, "d") in {(r["k"], r["v"]) for r in cow.read(spark, dst).collect()}


def test_clone_at_version_and_tag(spark, tmp_path):
    src = str(tmp_path / "s")
    _mk(spark, src)
    cow.create_tag(spark, src, "v1")
    cow.delete(spark, src, "k = 1")
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    cow.shallow_clone(spark, src, d1, snapshot=1)
    assert cow.read(spark, d1).count() == 3
    run_sql(
        spark,
        f"CREATE TABLE cow.`{d2}` SHALLOW CLONE cow.`{src}` "
        f"VERSION AS OF 'v1'",
    )
    assert cow.read(spark, d2).count() == 3


def test_clone_mor_source_links_deletion_vectors(spark, tmp_path):
    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    _mk(spark, src, write_mode="mor")
    cow.delete(spark, src, "k = 1")  # DV, no rewrite
    cow.shallow_clone(spark, src, dst)
    assert sorted(r["k"] for r in cow.read(spark, dst).collect()) == [2, 3]


def test_clone_refusals_and_vacuum_hazard(spark, tmp_path):
    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    _mk(spark, src)
    cow.shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="already exists"):
        cow.shallow_clone(spark, src, dst)
    # vacuum on the SOURCE strands clone links (Delta's documented
    # hazard): expire the source's snapshot-1 files and the clone read
    # fails loudly rather than silently returning partial data
    cow.delete(spark, src, "k = 1")  # snapshot 2 rewrites a file
    cow.vacuum(spark, src, keep_last=1, min_file_age_seconds=0)
    with pytest.raises(Exception):
        cow.read(spark, dst).count()
    # cloning a vacuumed snapshot refuses up front (either the expired
    # manifest or the missing-file check fires — both name vacuum)
    with pytest.raises(ValueError, match="vacuum"):
        cow.shallow_clone(spark, src, str(tmp_path / "d3"), snapshot=1)


def test_gate_clone_registers_names(spark, tmp_path):
    from data_warehouse_solution_spark import catalog as cat

    src = str(tmp_path / "s")
    _mk(spark, src)
    name = "clone_named_t"
    try:
        run_sql(spark, f"CREATE TABLE {name} SHALLOW CLONE cow.`{src}`")
        n = run_sql(
            spark, f"SELECT count(*) AS n FROM {name}"
        ).collect()[0]["n"]
        assert n == 3
        run_sql(spark, f"DELETE FROM {name} WHERE k = 1")
        assert cow.read(spark, src).count() == 3
    finally:
        run_sql(spark, f"DROP TABLE {name}")
    with pytest.raises(ValueError, match="not a COW"):
        run_sql(
            spark,
            f"CREATE TABLE cow.`{tmp_path / 'x'}` SHALLOW CLONE "
            f"cow.`{tmp_path / 'ghost'}`",
        )


def test_failed_clone_leaves_no_partial_destination(spark, tmp_path):
    """r12 review fix: shallow_clone pre-scans EVERY source file
    before creating any link, so a missing file discovered anywhere
    in the list refuses without touching the destination — it used to
    link files in manifest order and a mid-list miss stranded a
    half-built data/ dir that made the retry die on
    os.symlink FileExistsError instead of the clean error."""
    src = str(tmp_path / "src")
    _mk(spark, src)  # >1 data file (_mk repartitions)
    m = cow._load_manifest(spark, src, cow.current_snapshot(spark, src))
    assert len(m["files"]) > 1
    # simulate vacuum racing the clone: the LAST manifest-order file
    # disappears, so the old code would already have linked the others
    victim = os.path.join(src, "data", m["files"][-1]["name"])
    backup = victim + ".bak"
    os.rename(victim, backup)
    dst = str(tmp_path / "dst")
    with pytest.raises(ValueError, match="vacuumed"):
        cow.shallow_clone(spark, src, dst)
    assert not os.path.exists(os.path.join(dst, "data")), (
        "refused clone left a partial data/ dir behind"
    )
    # the same destination path retries CLEANLY once the source heals
    os.rename(backup, victim)
    cow.shallow_clone(spark, src, dst)
    assert cow.read(spark, dst).count() == cow.read(spark, src).count()
