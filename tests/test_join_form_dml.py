"""Join-form DML (r13): ``UPDATE t SET ... FROM src WHERE ...`` /
``DELETE FROM t USING src WHERE ...`` — the DuckDB/Postgres idiom for
the reference's whitelisted UPDATE/DELETE verbs (``pipeline.py:111-
113``), gate-rewritten onto the engine's multi-clause MERGE: same-name
WHERE equalities become merge keys, residual conjuncts the matched
condition, and the merge ambiguity guard replaces Postgres' arbitrary
multi-match winner with a refusal."""

from __future__ import annotations

import pytest

from data_warehouse_solution_spark import catalog
from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


@pytest.fixture()
def cat_dir(spark, tmp_path):
    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    spark.conf.set("spark.dws.cow.catalogDir", str(tmp_path / "_catalog"))
    yield
    if old is None:
        spark.conf.unset("spark.dws.cow.catalogDir")
    else:
        spark.conf.set("spark.dws.cow.catalogDir", old)


def _mk(spark, tmp_path):
    p = str(tmp_path / "jt")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
            "k long, s string, v double",
        ).repartition(2),
    )
    catalog.register(spark, "jt", p)
    return p


def test_update_from_temp_view_source(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    spark.createDataFrame(
        [(1, 100.0), (3, 300.0), (9, 900.0)], "k long, nv double"
    ).createOrReplaceTempView("jf_src")
    st = run_sql(
        spark,
        "UPDATE jt SET v = src.nv FROM jf_src src "
        "WHERE jt.k = src.k AND src.nv > 150",
    ).collect()[0]
    got = {r["k"]: r["v"] for r in cow.read(spark, p).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 300.0, 4: 40.0}
    assert st["snapshot_id"] == 2  # one commit


def test_update_from_expression_referencing_both_sides(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    run_sql(
        spark,
        f"UPDATE cow.`{p}` SET v = t.v + s.bump "
        "FROM (SELECT 2 AS k, 5.0 AS bump) s WHERE k = k",
    )
    got = {r["k"]: r["v"] for r in cow.read(spark, p).collect()}
    assert got[2] == 25.0 and got[1] == 10.0


def test_delete_using_with_aliases(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    spark.createDataFrame([(1,), (4,)], "k long").createOrReplaceTempView("jf_del")
    run_sql(spark, "DELETE FROM jt a USING jf_del b WHERE a.k = b.k")
    assert sorted(r["k"] for r in cow.read(spark, p).collect()) == [2, 3]


def test_delete_using_residual_condition(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    spark.createDataFrame(
        [(1, True), (2, False)], "k long, kill boolean"
    ).createOrReplaceTempView("jf_flag")
    run_sql(spark, "DELETE FROM jt USING jf_flag f WHERE jt.k = f.k AND f.kill")
    assert sorted(r["k"] for r in cow.read(spark, p).collect()) == [2, 3, 4]


def test_join_form_refusals(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    spark.createDataFrame([(1, 1.0)], "k long, nv double").createOrReplaceTempView(
        "jf_r"
    )
    with pytest.raises(ValueError, match="same-name column equality"):
        run_sql(spark, "UPDATE jt SET v = 1 FROM jf_r s WHERE s.nv > 1")
    with pytest.raises(ValueError, match="WHERE join condition"):
        run_sql(spark, "DELETE FROM jt USING jf_r")
    with pytest.raises(ValueError, match="WHERE join condition"):
        run_sql(spark, "UPDATE jt SET v = s.nv FROM jf_r s")
    # table untouched by the refusals
    assert cow.current_snapshot(spark, p) == 1


def test_join_form_multi_match_refuses(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    spark.createDataFrame(
        [(2, 1.0), (2, 2.0)], "k long, nv double"
    ).createOrReplaceTempView("jf_dup")
    with pytest.raises(Exception, match="ambiguous"):
        run_sql(spark, "UPDATE jt SET v = s.nv FROM jf_dup s WHERE jt.k = s.k")
    assert cow.current_snapshot(spark, p) == 1


def test_plain_update_delete_still_work(spark, cat_dir, tmp_path):
    p = _mk(spark, tmp_path)
    run_sql(spark, "UPDATE jt SET v = v + 1 WHERE k = 1")
    run_sql(spark, "DELETE FROM jt WHERE k = 4")
    got = {r["k"]: r["v"] for r in cow.read(spark, p).collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0}
    # a scalar subquery containing FROM inside parens is NOT the join form
    run_sql(spark, "DELETE FROM jt WHERE k IN (SELECT 2 AS k FROM range(1))")
    assert sorted(got for got in (r["k"] for r in cow.read(spark, p).collect())) == [1, 3]
