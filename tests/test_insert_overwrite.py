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
