"""DESCRIBE DETAIL (r12, Delta's table-facts verb): one metadata-only
row — format/location/snapshot/commit timestamps/layout columns/file
and row counts/data bytes/write mode/tag and constraint counts."""

from __future__ import annotations

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def test_describe_detail_engine_and_gate(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")],
            "k long, part string, v string",
        ),
        partition_by=["part"],
    )
    cow.delete(spark, p, "k = 1")
    cow.create_tag(spark, p, "v1")
    cow.add_check_constraint(spark, p, "k_pos", "k > 0")
    d = cow.describe_detail(spark, p)
    assert d["format"] == "cow" and d["location"] == p
    assert d["partition_columns"] == ["part"]
    assert d["num_rows_live"] == 2 and d["num_files"] >= 1
    assert d["size_in_bytes"] > 0
    assert d["num_tags"] == 1 and d["num_check_constraints"] == 1
    assert d["num_snapshots"] == 4 and d["snapshot_id"] == 4
    assert d["created_at"] <= d["last_modified"]
    row = run_sql(spark, f"DESCRIBE DETAIL cow.`{p}`").collect()[0]
    assert row["num_rows_live"] == 2
    assert row["partition_columns"] == "part"
    assert row["write_mode"] == "cow"


def test_describe_detail_mor_counts_masked_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(i, "v") for i in range(10)], "k long, v string"
        ).coalesce(1),
        write_mode="mor",
    )
    cow.delete(spark, p, "k < 3")
    d = cow.describe_detail(spark, p)
    assert d["write_mode"] == "mor"
    assert d["num_rows"] == 10 and d["num_rows_live"] == 7


def test_describe_detail_non_cow_falls_through(spark, tmp_path):
    import pytest

    # non-COW target: DESCRIBE DETAIL is not handled by the gate and
    # the DESCRIBE fallback treats it as a table ref that is not COW
    with pytest.raises(Exception):
        run_sql(spark, f"DESCRIBE DETAIL `{tmp_path}/nope`")


def test_show_partitions(spark, tmp_path):
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "d1", "x"), (2, "d2", "x"), (3, "d1", "y")],
            "k long, ds string, g string",
        ),
        partition_by=["ds", "g"],
    )
    got = [r["partition"] for r in run_sql(spark, f"SHOW PARTITIONS cow.`{p}`").collect()]
    assert got == ["ds=d1/g=x", "ds=d1/g=y", "ds=d2/g=x"]
    # DML that empties a partition removes it from the listing
    cow.delete(spark, p, "ds = 'd2'")
    got = [r["partition"] for r in run_sql(spark, f"SHOW PARTITIONS cow.`{p}`").collect()]
    assert got == ["ds=d1/g=x", "ds=d1/g=y"]


def test_show_partitions_refuses_unpartitioned(spark, tmp_path):
    import pytest

    p = str(tmp_path / "t")
    cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="not partitioned"):
        run_sql(spark, f"SHOW PARTITIONS cow.`{p}`")
