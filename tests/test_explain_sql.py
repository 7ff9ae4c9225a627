"""EXPLAIN through the gate (r14, VERDICT r13 punch #6): the
observability verb over the rewrite machinery. Pinned invariants:
EXPLAIN never executes (zero snapshot commits, zero Spark jobs beyond
planning), a view/matview/name/cow-ref statement shows the EXPANDED
plan, and COW DML explains as the engine's DML route header."""

from __future__ import annotations

import pytest

from data_warehouse_solution_spark import catalog
from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


@pytest.fixture()
def cat_dir(spark, tmp_path):
    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    d = str(tmp_path / "_catalog")
    spark.conf.set("spark.dws.cow.catalogDir", d)
    yield d
    if old is None:
        spark.conf.unset("spark.dws.cow.catalogDir")
    else:
        spark.conf.set("spark.dws.cow.catalogDir", old)


@pytest.fixture()
def base(spark, cat_dir, tmp_path):
    p = str(tmp_path / "exb")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "k long, g string, v double",
        ),
    )
    catalog.register(spark, "exbase", p)
    return p


def _njobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def _plan(spark, stmt) -> str:
    return run_sql(spark, stmt).collect()[0]["plan"]


def test_explain_expands_views_without_jobs(spark, base):
    run_sql(
        spark,
        "CREATE VIEW exv AS SELECT g, SUM(v) AS s FROM exbase GROUP BY g",
    )
    j0 = _njobs(spark)
    df = run_sql(spark, "EXPLAIN FORMATTED SELECT * FROM exv WHERE s > 5")
    j1 = _njobs(spark)
    assert j1 == j0, "EXPLAIN submitted Spark jobs during planning"
    txt = df.collect()[0]["plan"]
    # expanded: the view name is gone, the real parquet scan + agg show
    assert "exv" not in txt
    assert "Scan parquet" in txt and "HashAggregate" in txt
    assert "ReadSchema: struct<g:string,v:double>" in txt  # pruned
    run_sql(spark, "DROP VIEW exv")


def test_explain_matview_resolves_backing(spark, base):
    run_sql(
        spark,
        "CREATE MATERIALIZED VIEW exm AS SELECT g, COUNT(*) AS n "
        "FROM exbase GROUP BY g",
    )
    txt = _plan(spark, "EXPLAIN SELECT * FROM exm")
    # a matview read is the backing table scan — no re-aggregation
    assert "Scan parquet" in txt and "HashAggregate" not in txt
    run_sql(spark, "DROP MATERIALIZED VIEW exm")


def test_explain_pushdown_visible_through_name(spark, base):
    txt = _plan(spark, "EXPLAIN FORMATTED SELECT k FROM exbase WHERE k = 2")
    assert "PushedFilters" in txt and "EqualTo(k,2)" in txt.replace(" ", "")
    assert "ReadSchema: struct<k:bigint>" in txt  # column pruning


def test_explain_dml_never_commits(spark, base):
    snap0 = cow.current_snapshot(spark, base)
    rows0 = sorted(map(tuple, cow.read(spark, base).collect()))
    d = _plan(spark, "EXPLAIN DELETE FROM exbase WHERE k = 1")
    assert "CowDelete" in d and "not executed" in d and "k = 1" in d
    u = _plan(spark, "EXPLAIN UPDATE exbase SET v = v + 1 WHERE g = 'a'")
    assert "CowUpdate" in u
    i = _plan(spark, "EXPLAIN INSERT INTO exbase SELECT k + 10, g, v FROM exbase")
    assert "CowAppend" in i and "payload:" in i and "Scan parquet" in i
    m = _plan(
        spark,
        "EXPLAIN MERGE INTO exbase t USING exbase s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
    )
    assert "CowMerge" in m and "stat-prunes" in m
    o = _plan(
        spark,
        "EXPLAIN INSERT OVERWRITE exbase SELECT k, g, v FROM exbase",
    )
    assert "CowOverwrite" in o
    assert cow.current_snapshot(spark, base) == snap0
    assert sorted(map(tuple, cow.read(spark, base).collect())) == rows0


def test_explain_time_travel_and_modes(spark, base):
    cow.append(
        spark, base, spark.createDataFrame([(9, "z", 1.0)], "k long, g string, v double")
    )
    txt = _plan(
        spark,
        f"EXPLAIN SELECT COUNT(*) AS n FROM cow.`{base}` VERSION AS OF 1",
    )
    assert "HashAggregate" in txt or "Aggregate" in txt
    ext = _plan(spark, "EXPLAIN EXTENDED SELECT k FROM exbase")
    assert "== Parsed Logical Plan ==" in ext and "== Physical Plan ==" in ext


def test_explain_refusals(spark, base):
    for stmt in (
        "EXPLAIN DROP TABLE exbase",
        "EXPLAIN TRUNCATE TABLE exbase",
        "EXPLAIN OPTIMIZE exbase",
        "EXPLAIN CREATE TABLE nope USING cow AS SELECT 1 AS x",
    ):
        with pytest.raises(ValueError, match="EXPLAIN does not support"):
            run_sql(spark, stmt)
    # the whole gate still refuses EXPLAIN-of-nothing gracefully
    with pytest.raises(Exception):
        run_sql(spark, "EXPLAIN")


def test_explain_analyze_reports_measured_metrics(spark, base):
    # r14: EXPLAIN ANALYZE executes the query ONCE through the noop
    # sink and prepends measured SQLMetrics — still zero commits, and
    # DML refuses (executing it would commit)
    snap0 = cow.current_snapshot(spark, base)
    txt = _plan(
        spark,
        "EXPLAIN ANALYZE SELECT g, COUNT(*) AS n FROM exbase GROUP BY g",
    )
    assert "== Measured Metrics" in txt
    assert "output_rows: 2" in txt  # two groups
    assert "scan_rows: 3" in txt  # three base rows scanned
    assert "spill_bytes: 0" in txt
    assert "== Physical Plan ==" in txt
    assert cow.current_snapshot(spark, base) == snap0
    with pytest.raises(ValueError, match="QUERIES only"):
        run_sql(spark, "EXPLAIN ANALYZE DELETE FROM exbase WHERE k = 1")
    assert cow.current_snapshot(spark, base) == snap0
