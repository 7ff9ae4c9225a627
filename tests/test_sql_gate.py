"""Tests for the SQL verb whitelist gate (reference A7) and ORC
ingest round-trip."""

from __future__ import annotations

import pytest

from data_warehouse_solution_spark.ingest import IngestJob, ingest, read_source
from data_warehouse_solution_spark.operators.analytics_extra import sampling_repeatable
from data_warehouse_solution_spark.sql_gate import filter_sql_commands, run_sql

from .conftest import SF_ORACLE


def test_filter_keeps_whitelisted_only():
    cmds = [
        "SELECT 1",
        "create table t (a int)",
        "EXPLAIN SELECT 1",
        "SET spark.foo=bar",
        "  INSERT INTO t VALUES (1)",
        "",
        "VALUES (1, 2)",
    ]
    kept = filter_sql_commands(cmds)
    assert kept == ["SELECT 1", "create table t (a int)", "  INSERT INTO t VALUES (1)", "VALUES (1, 2)"]


def test_run_sql_executes_select(spark):
    assert run_sql(spark, "SELECT 1 AS x").collect()[0]["x"] == 1
    assert run_sql(spark, "WITH t AS (SELECT 2 AS x) SELECT * FROM t").collect()[0]["x"] == 2


def test_run_sql_rejects_non_whitelisted(spark):
    with pytest.raises(ValueError, match="not in the allowed set"):
        run_sql(spark, "EXPLAIN SELECT 1")
    with pytest.raises(ValueError, match="not in the allowed set"):
        run_sql(spark, "SET spark.sql.shuffle.partitions=1")
    with pytest.raises(ValueError, match="not in the allowed set"):
        run_sql(spark, "")


def test_orc_ingest_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    orc_dir = str(tmp_path / "demo_orc")
    src.write.orc(orc_dir)
    df = read_source(spark, IngestJob(path=orc_dir, fmt="orc"))
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    table = ingest(spark, IngestJob(path=orc_dir, fmt="orc", table="orc_demo"))
    assert spark.table(table).count() == 2
    spark.sql("DROP TABLE orc_demo")


def test_sampling_repeatable_and_fractional(spark):
    a = sampling_repeatable(spark, SF_ORACLE)
    b = sampling_repeatable(spark, SF_ORACLE)
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb  # seeded => repeatable
    # fraction within loose bounds of 10%
    assert 0.05 < len(ra) / 60000 < 0.15


def test_jdbc_sink_roundtrip_derby(spark, tmp_path):
    from data_warehouse_solution_spark.ingest import write_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "name"])
    write_jdbc(src, url, "demo_sink", driver=driver)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "demo_sink")
        .option("driver", driver)
        .load()
    )
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    # append mode adds rows
    write_jdbc(src, url, "demo_sink", mode="append", driver=driver)
    assert (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "demo_sink")
        .option("driver", driver)
        .load()
        .count()
        == 6
    )
