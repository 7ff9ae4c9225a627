"""INSERT OVERWRITE (r12): full-table and static-partition overwrite
as ONE atomic replace_where commit — readers see the old or the new
state, never the TRUNCATE+INSERT gap."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def test_insert_overwrite_full_table(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
    )
    out = run_sql(
        spark,
        f"INSERT OVERWRITE cow.`{p}` SELECT id + 10 AS k, 'n' AS v FROM range(3)",
    ).collect()[0]
    assert out["snapshot_id"] == 2  # ONE commit
    got = sorted((r["k"], r["v"]) for r in cow.read(spark, p).collect())
    assert got == [(10, "n"), (11, "n"), (12, "n")]
    # time travel still sees the old state
    assert cow.read(spark, p, 1).count() == 2


def test_insert_overwrite_static_partition(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "2024-01-01", 1.0), (2, "2024-01-01", 2.0), (3, "2024-01-02", 3.0)],
            "k long, ds string, x double",
        ),
        partition_by=["ds"],
    )
    out = run_sql(
        spark,
        f"INSERT OVERWRITE cow.`{p}` PARTITION (ds = '2024-01-01') "
        "VALUES (7, 7.5), (8, 8.5)",
    ).collect()[0]
    assert out["snapshot_id"] == 2
    got = sorted(
        (r["k"], r["ds"], r["x"]) for r in cow.read(spark, p).collect()
    )
    # day-01 replaced; day-02 untouched (partition-scoped overwrite)
    assert got == [
        (3, "2024-01-02", 3.0),
        (7, "2024-01-01", 7.5),
        (8, "2024-01-01", 8.5),
    ]


def test_insert_overwrite_partition_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1, "a", 1.0)], "k long, ds string, x double"),
        partition_by=["ds"],
    )
    with pytest.raises(ValueError, match="non-partition columns"):
        run_sql(
            spark,
            f"INSERT OVERWRITE cow.`{p}` PARTITION (k = 1) VALUES ('a', 2.0)",
        )
    with pytest.raises(ValueError, match="arity mismatch"):
        run_sql(
            spark,
            f"INSERT OVERWRITE cow.`{p}` PARTITION (ds = 'x') VALUES (1, 'y', 2.0)",
        )
    with pytest.raises(ValueError, match="col = 'value' pairs"):
        run_sql(
            spark,
            f"INSERT OVERWRITE cow.`{p}` PARTITION (ds) VALUES (1, 2.0)",
        )
    # every refusal left the table untouched
    assert cow.current_snapshot(spark, p) == 1
    assert cow.read(spark, p).count() == 1


def test_insert_overwrite_with_identity_and_generated(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame([(1.0,)], "x double"),
        identity_columns={"id": {"start": 1, "step": 1}},
        generated_columns={"x2": "x * 2"},
    )
    run_sql(
        spark,
        f"INSERT OVERWRITE cow.`{p}` SELECT CAST(id AS DOUBLE) AS x FROM range(3)",
    )
    rows = cow.read(spark, p).collect()
    assert sorted(r["x2"] for r in rows) == [0.0, 2.0, 4.0]
    assert len({r["id"] for r in rows}) == 3  # fresh engine-assigned ids


def test_insert_overwrite_dynamic_mode(spark, tmp_path):
    """partitionOverwriteMode=dynamic: only the partitions the
    payload writes are replaced — whole-partition metadata drop, no
    row-level predicate."""
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0), (4, "d3", 4.0)],
            "k long, ds string, x double",
        ),
        partition_by=["ds"],
    )
    d2_files = {
        f["name"]
        for f in cow._load_manifest(spark, p, 1)["files"]
        if f["partition"]["ds"] in ("d2", "d3")
    }
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = run_sql(
            spark,
            f"INSERT OVERWRITE cow.`{p}` "
            "VALUES (7, 'd1', 7.0), (8, 'd4', 8.0)",
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    assert out["snapshot_id"] == 2
    got = sorted((r["k"], r["ds"]) for r in cow.read(spark, p).collect())
    # d1 replaced, d4 created, d2/d3 untouched
    assert got == [(3, "d2"), (4, "d3"), (7, "d1"), (8, "d4")]
    after = {
        f["name"]
        for f in cow._load_manifest(spark, p, 2)["files"]
        if f["partition"]["ds"] in ("d2", "d3")
    }
    assert after == d2_files  # untouched partitions byte-identical


def test_insert_overwrite_dynamic_engine_null_partition(spark, tmp_path):
    """A NULL partition value in the payload replaces exactly the
    Hive default-partition files."""
    import data_warehouse_solution_spark.cowtable as cow_

    p = str(tmp_path / "t")
    cow_.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, None, 1.0), (2, "d1", 2.0)], "k long, ds string, x double"
        ),
        partition_by=["ds"],
    )
    rows = spark.createDataFrame([(9, None, 9.0)], "k long, ds string, x double")
    cow_.insert_overwrite_dynamic(spark, p, rows)
    got = sorted(
        (r["k"], r["ds"]) for r in cow_.read(spark, p).collect()
    )
    assert got == [(2, "d1"), (9, None)]


def test_insert_overwrite_dynamic_refuses_unpartitioned(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="requires a partitioned table"):
        cow.insert_overwrite_dynamic(
            spark, p, spark.createDataFrame([(2,)], "k long")
        )


def test_insert_overwrite_dynamic_refuses_mixed_spec_vintages(spark, tmp_path):
    """A pre-evolution file has no current-spec partition values, so
    payload membership is undecidable — dynamic overwrite must refuse
    (dropping it would delete unrelated rows), not guess."""
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "d1", 1.0), (2, "d2", 2.0)], "k long, ds string, x double"
        ),
    )
    cow.alter_add_partition_field(spark, p, "ds")
    # head now declares ds partitioning but snapshot-1 files predate it
    with pytest.raises(ValueError, match="current partition spec"):
        cow.insert_overwrite_dynamic(
            spark, p,
            spark.createDataFrame([(9, "d1", 9.0)], "k long, ds string, x double"),
        )
    assert cow.read(spark, p).count() == 2  # untouched


def test_insert_overwrite_dynamic_refuses_unstattable_partition_type(
    spark, tmp_path
):
    # ADVICE r12 (medium): a boolean partition column records no typed
    # stat, so partition membership would fall back to a raw-dir-string
    # comparison that never matches — silently turning the overwrite
    # into an append. Must refuse loudly instead.
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, True, 1.0), (2, False, 2.0)], "k long, flag boolean, x double"
        ),
        partition_by=["flag"],
    )
    rows = spark.createDataFrame([(9, True, 9.0)], "k long, flag boolean, x double")
    with pytest.raises(ValueError, match="cannot prove partition membership"):
        cow.insert_overwrite_dynamic(spark, p, rows)
    # the table is untouched — no silent append happened
    assert cow.read(spark, p).count() == 2
