"""Type widening (``alter_widen_column``): metadata-only lossless
type changes — old files' parquet physical types upcast at scan time,
narrowings refused, pruning stays sound across mixed vintages."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow


def _mk(spark, path, **kw):
    df = spark.createDataFrame(
        [(i, i * 10, float(i)) for i in range(50)], "k int, n int, v float"
    ).repartition(3)
    cow.create(spark, path, df, **kw)


def test_widen_reads_old_and_new_vintages(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.alter_widen_column(spark, p, "k", "bigint")
    cow.alter_widen_column(spark, p, "v", "double")
    df = cow.read(spark, p)
    assert dict(df.dtypes) == {"k": "bigint", "n": "int", "v": "double"}
    # a value only representable in the wider type lands in a NEW file
    cow.append(
        spark,
        p,
        spark.createDataFrame([(2**40, 1, 1.5)], "k long, n int, v double"),
    )
    got = {r["k"] for r in cow.read(spark, p).filter("k > 40").collect()}
    assert got == {41, 42, 43, 44, 45, 46, 47, 48, 49, 2**40}


def test_widen_refuses_narrowing_and_cross_family(spark, tmp_path):
    p = str(tmp_path / "bad")
    _mk(spark, p)
    with pytest.raises(ValueError, match="lossless"):
        cow.alter_widen_column(spark, p, "k", "smallint")
    with pytest.raises(ValueError, match="lossless"):
        cow.alter_widen_column(spark, p, "k", "string")
    with pytest.raises(ValueError, match="lossless"):
        cow.alter_widen_column(spark, p, "v", "int")
    with pytest.raises(ValueError, match="does not exist"):
        cow.alter_widen_column(spark, p, "nope", "bigint")


def test_widen_then_dml_and_pruning(spark, tmp_path):
    p = str(tmp_path / "dml")
    df = spark.range(0, 600).selectExpr("cast(id as int) as k", "cast(id as float) as v")
    cow.create(spark, p, df.repartitionByRange(4, "k"))
    cow.alter_widen_column(spark, p, "k", "bigint")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    # int-valued stats still prune under the widened type
    assert len(cow.stats_candidate_files(m, "k = 5")) == 1
    st = cow.delete(spark, p, "k < 10")
    assert st["files_rewritten"] == 1
    assert cow.read(spark, p).count() == 590


def test_widen_bloom_column_stays_sound(spark, tmp_path):
    p = str(tmp_path / "bloom")
    df = spark.createDataFrame([(i,) for i in range(300)], "k int").repartition(3)
    cow.create(spark, p, df, bloom_columns=["k"])
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    n_bloomed = len(cow.stats_candidate_files(m, "k = -5"))
    assert n_bloomed == 0  # bloom refutes the absent key
    cow.alter_widen_column(spark, p, "k", "double")
    m2 = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    # double column: blooms no longer consulted (sound degradation) —
    # min/max still refute the out-of-range probe
    assert cow.stats_candidate_files(m2, "k = 1000") == []
    # and the value itself is still findable (exactness)
    assert cow.read(spark, p).filter("k = 7.0").count() == 1


def test_widen_through_gate_sql(spark, tmp_path):
    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "sql")
    _mk(spark, p)
    run_sql(spark, f"ALTER TABLE cow.`{p}` ALTER COLUMN k TYPE bigint")
    run_sql(spark, f"ALTER TABLE `{p}` ALTER COLUMN v SET DATA TYPE double")
    df = cow.read(spark, p)
    assert dict(df.dtypes)["k"] == "bigint" and dict(df.dtypes)["v"] == "double"
    with pytest.raises(ValueError, match="lossless"):
        run_sql(spark, f"ALTER TABLE cow.`{p}` ALTER COLUMN n TYPE smallint")


def test_widen_with_mor_and_cdc(spark, tmp_path):
    p = str(tmp_path / "mor")
    _mk(spark, p, write_mode="mor")
    s0 = cow.current_snapshot(spark, p)
    cow.alter_widen_column(spark, p, "v", "double")
    st = cow.delete(spark, p, "v < 3")
    assert st["files_rewritten"] == 0
    ch = cow.changes(spark, p, s0, st["snapshot_id"]).collect()
    assert {r["v"] for r in ch} == {0.0, 1.0, 2.0}
    assert cow.read(spark, p).count() == 47
