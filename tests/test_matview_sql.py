"""Materialized views through the gate (r14, VERDICT r13 punch #2):
CREATE/REFRESH/SHOW/DROP MATERIALIZED VIEW over the CDF-incremental
maintenance algebra (operators/matview.py), Dremio's reflection model
(README.md:3-4). The invariant under test everywhere: REFRESH's
incremental fold equals a full recompute of the definition over the
base's current state."""

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


def _base(spark, tmp_path, name="mvb"):
    p = str(tmp_path / name)
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "b", None)],
            "k long, g string, v double",
        ),
    )
    catalog.register(spark, name, p)
    return p


def _recompute(spark, sql):
    return sorted(map(tuple, run_sql(spark, sql).collect()))


def test_matview_stale_before_fresh_after(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    defn = (
        "SELECT g, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx "
        "FROM mvb GROUP BY g"
    )
    st = run_sql(spark, f"CREATE MATERIALIZED VIEW m1 AS {defn}").collect()[0]
    assert st["mode"] == "incremental" and st["base_snapshot"] == 1
    before = _recompute(spark, "SELECT * FROM m1")
    assert before == _recompute(spark, defn)
    # base DML: the matview read must stay STALE until REFRESH
    run_sql(spark, "INSERT INTO mvb VALUES (5, 'c', 5.5)")
    run_sql(spark, "DELETE FROM mvb WHERE k = 1")
    run_sql(spark, "UPDATE mvb SET v = v + 1 WHERE k = 2")
    assert _recompute(spark, "SELECT * FROM m1") == before
    st = run_sql(spark, "REFRESH MATERIALIZED VIEW m1").collect()[0]
    assert st["refreshed"] is True
    assert _recompute(spark, "SELECT * FROM m1") == _recompute(spark, defn)
    # no-op refresh: base unchanged -> refreshed=False, snapshot kept
    st2 = run_sql(spark, "REFRESH MATERIALIZED VIEW m1").collect()[0]
    assert st2["refreshed"] is False
    assert st2["base_snapshot"] == st["base_snapshot"]


def test_matview_group_lifecycle_and_null_sums(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    defn = (
        "SELECT g, COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS s "
        "FROM mvb WHERE k > 0 GROUP BY g"
    )
    run_sql(spark, f"CREATE MATERIALIZED VIEW m2 AS {defn}")
    # new group appears, an old group disappears, an all-NULL group's
    # SUM must be NULL (hidden non-null counter), WHERE is honored
    run_sql(spark, "INSERT INTO mvb VALUES (6, 'z', NULL)")
    run_sql(spark, "INSERT INTO mvb VALUES (-7, 'neg', 99.0)")  # WHERE-excluded
    run_sql(spark, "DELETE FROM mvb WHERE g = 'a'")
    run_sql(spark, "REFRESH MATERIALIZED VIEW m2")
    got = _recompute(spark, "SELECT * FROM m2")
    assert got == _recompute(spark, defn)
    by_g = {t[0]: t for t in got}
    assert "a" not in by_g and by_g["z"] == ("z", 1, 0, None)
    assert "neg" not in by_g


def test_matview_minmax_recompute_split(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    defn = "SELECT g, MIN(v) AS mn, MAX(v) AS mx FROM mvb GROUP BY g"
    run_sql(spark, f"CREATE MATERIALIZED VIEW m3 AS {defn}")
    # delete the stored extreme: least/greatest is unsound there; the
    # scoped recompute branch must reconstruct the runner-up
    run_sql(spark, "DELETE FROM mvb WHERE v = 30.0")  # g='a' max
    run_sql(spark, "REFRESH MATERIALIZED VIEW m3")
    assert _recompute(spark, "SELECT * FROM m3") == _recompute(spark, defn)


def test_matview_full_mode_fallback(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    defn = (
        "SELECT x.g, COUNT(*) AS n FROM mvb x JOIN mvb y ON x.k = y.k "
        "GROUP BY x.g"
    )
    st = run_sql(spark, f"CREATE MATERIALIZED VIEW m4 AS {defn}").collect()[0]
    assert st["mode"] == "full"
    run_sql(spark, "INSERT INTO mvb VALUES (9, 'q', 1.0)")
    before = _recompute(spark, "SELECT * FROM m4")
    assert ("q", 1) not in before  # stale
    run_sql(spark, "REFRESH MATERIALIZED VIEW m4")
    assert _recompute(spark, "SELECT * FROM m4") == _recompute(spark, defn)


def test_matview_refusals_and_namespace(spark, cat_dir, tmp_path):
    p = _base(spark, tmp_path)
    run_sql(
        spark,
        "CREATE MATERIALIZED VIEW m5 AS SELECT g, COUNT(*) AS n FROM mvb "
        "GROUP BY g",
    )
    with pytest.raises(ValueError, match="already exists"):
        run_sql(
            spark,
            "CREATE MATERIALIZED VIEW m5 AS SELECT g, COUNT(*) AS n "
            "FROM mvb GROUP BY g",
        )
    for stmt in (
        "INSERT INTO m5 VALUES ('x', 1)",
        "DELETE FROM m5 WHERE n = 1",
        "UPDATE m5 SET n = 2 WHERE n = 1",
        "OPTIMIZE m5",
        "TRUNCATE TABLE m5",
    ):
        with pytest.raises(ValueError, match="MATERIALIZED VIEW"):
            run_sql(spark, stmt)
    with pytest.raises(ValueError, match="DROP MATERIALIZED VIEW"):
        run_sql(spark, "DROP TABLE m5")
    with pytest.raises(ValueError, match="DROP MATERIALIZED VIEW"):
        run_sql(spark, "DROP VIEW m5")
    with pytest.raises(ValueError, match="snapshot TABLES only"):
        run_sql(spark, "SELECT * FROM m5 VERSION AS OF 1")
    with pytest.raises(ValueError, match="registered MATVIEW"):
        run_sql(spark, "CREATE TABLE m5 USING cow AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="registered MATVIEW"):
        run_sql(spark, "CREATE VIEW m5 AS SELECT 1 AS x")
    # and the converse: matview names cannot steal a table/view name
    with pytest.raises(ValueError, match="already"):
        run_sql(
            spark,
            "CREATE MATERIALIZED VIEW mvb AS SELECT g, COUNT(*) AS n "
            "FROM mvb GROUP BY g",
        )
    with pytest.raises(ValueError, match="does not plan"):
        run_sql(
            spark,
            "CREATE MATERIALIZED VIEW m6 AS SELECT nope, COUNT(*) AS n "
            "FROM mvb GROUP BY nope",
        )
    assert "m6" not in catalog.matviews(spark)
    with pytest.raises(ValueError, match="must be a query"):
        run_sql(spark, "CREATE MATERIALIZED VIEW m7 AS DROP TABLE mvb")
    # a refused CREATE leaves no backing table behind
    import os

    assert not os.path.exists(f"{cat_dir}/matviews/m6")
    assert not os.path.exists(f"{cat_dir}/matviews/m7")
    assert cow.is_cow_table(spark, p)


def test_matview_show_and_drop(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(
        spark,
        "CREATE MATERIALIZED VIEW shown1 AS SELECT g, COUNT(*) AS n "
        "FROM mvb GROUP BY g",
    )
    run_sql(
        spark,
        "CREATE MATERIALIZED VIEW shown2 AS SELECT g, SUM(v) AS s "
        "FROM mvb GROUP BY g",
    )
    rows = run_sql(spark, "SHOW MATERIALIZED VIEWS").collect()
    assert {r["name"] for r in rows} == {"shown1", "shown2"}
    assert all(r["mode"] == "incremental" for r in rows)
    like = run_sql(spark, "SHOW MATERIALIZED VIEWS LIKE 'shown1'").collect()
    assert [r["name"] for r in like] == ["shown1"]
    backing = {r["name"]: r["backing_table"] for r in rows}
    assert run_sql(spark, "DROP MATERIALIZED VIEW shown2").collect()[0][
        "dropped"
    ]
    assert not cow.is_cow_table(spark, backing["shown2"])
    assert "shown2" not in catalog.matviews(spark)
    with pytest.raises(ValueError, match="unknown materialized view"):
        run_sql(spark, "DROP MATERIALIZED VIEW shown2")
    assert (
        run_sql(spark, "DROP MATERIALIZED VIEW IF EXISTS shown2").collect()[0][
            "dropped"
        ]
        is False
    )
    with pytest.raises(ValueError, match="materialized views only"):
        run_sql(spark, "DROP MATERIALIZED VIEW mvb")


def test_matview_or_replace(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(
        spark,
        "CREATE MATERIALIZED VIEW mr AS SELECT g, COUNT(*) AS n FROM mvb "
        "GROUP BY g",
    )
    run_sql(
        spark,
        "CREATE OR REPLACE MATERIALIZED VIEW mr AS SELECT g, SUM(v) AS s "
        "FROM mvb GROUP BY g",
    )
    assert run_sql(spark, "SELECT * FROM mr").columns == ["g", "s"]
    # a malformed OR REPLACE leaves the old definition intact
    with pytest.raises(ValueError, match="does not plan"):
        run_sql(
            spark,
            "CREATE OR REPLACE MATERIALIZED VIEW mr AS SELECT ghost, "
            "COUNT(*) AS n FROM mvb GROUP BY ghost",
        )
    assert run_sql(spark, "SELECT * FROM mr").columns == ["g", "s"]


def test_matview_streaming_maintenance_matches_batch(
    spark, cat_dir, tmp_path
):
    # r14 punch #7: the SQL-defined incremental matview maintained by
    # the cowcdc streaming transport (foreachBatch) converges to the
    # same state as a full recompute — batch REFRESH and streaming
    # share ONE fold (matview_sql.refresh_matview_streaming)
    from data_warehouse_solution_spark.matview_sql import (
        refresh_matview_streaming,
    )

    _base(spark, tmp_path)
    defn = (
        "SELECT g, COUNT(*) AS n, SUM(v) AS s FROM mvb WHERE k > 0 "
        "GROUP BY g"
    )
    run_sql(spark, f"CREATE MATERIALIZED VIEW ms AS {defn}")
    run_sql(spark, "INSERT INTO mvb VALUES (5, 'c', 5.5)")
    run_sql(spark, "DELETE FROM mvb WHERE k = 1")
    run_sql(spark, "UPDATE mvb SET v = v + 1 WHERE k = 2")
    out = refresh_matview_streaming(spark, "ms")
    assert out["epochs"] >= 1
    assert _recompute(spark, "SELECT * FROM ms") == _recompute(spark, defn)
    # the stream advanced the recorded snapshot: batch REFRESH no-ops
    st = run_sql(spark, "REFRESH MATERIALIZED VIEW ms").collect()[0]
    assert st["refreshed"] is False


def test_matview_rebaseline_on_replaced_base(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    defn = "SELECT g, COUNT(*) AS n FROM mvb GROUP BY g"
    run_sql(spark, f"CREATE MATERIALIZED VIEW mb AS {defn}")
    # CREATE OR REPLACE moves the base to a NEW location: folding the
    # old feed would be wrong — REFRESH must re-baseline (recompute)
    newloc = str(tmp_path / "moved")
    run_sql(
        spark,
        f"CREATE OR REPLACE TABLE mvb USING cow LOCATION '{newloc}' AS "
        "SELECT CAST(1 AS LONG) AS k, 'only' AS g, CAST(1.0 AS DOUBLE) AS v",
    )
    st = run_sql(spark, "REFRESH MATERIALIZED VIEW mb").collect()[0]
    assert st["refreshed"] is True
    assert _recompute(spark, "SELECT * FROM mb") == [("only", 1)]


def test_matview_describe_show_create_roundtrip(spark, cat_dir, tmp_path):
    # r14 polish: SHOW CREATE TABLE round-trips a matview; DESCRIBE
    # shows user columns + maintenance state; IF NOT EXISTS no-ops on
    # an existing matview and still refuses table/view names
    _base(spark, tmp_path)
    defn = "SELECT g, COUNT(*) AS n, SUM(v) AS s FROM mvb GROUP BY g"
    run_sql(spark, f"CREATE MATERIALIZED VIEW mrt AS {defn}")
    stmt = run_sql(spark, "SHOW CREATE TABLE mrt").collect()[0][
        "createtab_stmt"
    ]
    assert stmt == f"CREATE MATERIALIZED VIEW mrt AS {defn}"
    run_sql(spark, "DROP MATERIALIZED VIEW mrt")
    run_sql(spark, stmt)  # round-trips
    assert run_sql(spark, "SELECT * FROM mrt").columns == ["g", "n", "s"]
    d = {r["col_name"]: (r["data_type"]) for r in run_sql(
        spark, "DESCRIBE TABLE mrt"
    ).collect()}
    assert d["g"] == "string" and d["n"] == "bigint"
    assert d["# kind"] == "materialized view"
    assert d["# mode"] == "incremental"
    assert "__mv_n" not in d  # hidden maintenance cols stay hidden
    # IF NOT EXISTS: existing matview -> no-op, definition unchanged
    st = run_sql(
        spark,
        "CREATE MATERIALIZED VIEW IF NOT EXISTS mrt AS "
        "SELECT g, MAX(v) AS m FROM mvb GROUP BY g",
    ).collect()[0]
    assert st["refreshed"] is False
    assert run_sql(spark, "SELECT * FROM mrt").columns == ["g", "n", "s"]
    with pytest.raises(ValueError, match="already"):
        run_sql(
            spark,
            "CREATE MATERIALIZED VIEW IF NOT EXISTS mvb AS "
            "SELECT g, COUNT(*) AS n FROM mvb GROUP BY g",
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_sql(
            spark,
            "CREATE OR REPLACE MATERIALIZED VIEW IF NOT EXISTS mrt AS "
            f"{defn}",
        )


def test_matview_avg_incremental_and_decimal_demotion(
    spark, cat_dir, tmp_path
):
    # r14: AVG maintains from hidden sum+count (re-divided, cast back
    # to the stored type); a DECIMAL summand demotes to full mode at
    # parse rather than risk off-by-ulp re-division
    _base(spark, tmp_path)
    defn = "SELECT g, AVG(v) AS av, COUNT(*) AS n FROM mvb GROUP BY g"
    st = run_sql(spark, f"CREATE MATERIALIZED VIEW mavg AS {defn}").collect()[0]
    assert st["mode"] == "incremental"
    run_sql(spark, "INSERT INTO mvb VALUES (5, 'a', 50.0), (6, 'z', NULL)")
    run_sql(spark, "DELETE FROM mvb WHERE k = 1")
    run_sql(spark, "UPDATE mvb SET v = v * 2 WHERE k = 2")
    run_sql(spark, "REFRESH MATERIALIZED VIEW mavg")
    got = {
        t[0]: t for t in _recompute(spark, "SELECT * FROM mavg")
    }
    exp = {t[0]: t for t in _recompute(spark, defn)}
    assert set(got) == set(exp)
    for g in got:
        assert got[g][2] == exp[g][2]
        if exp[g][1] is None:
            assert got[g][1] is None  # all-NULL group's AVG stays NULL
        else:
            assert abs(got[g][1] - exp[g][1]) < 1e-9
    # decimal summand -> full mode
    p2 = str(tmp_path / "decbase")
    cow.create(
        spark,
        p2,
        spark.createDataFrame(
            [(1, "a", 10.0)], "k long, g string, v double"
        ).selectExpr("k", "g", "CAST(v AS DECIMAL(10,2)) AS d"),
    )
    catalog.register(spark, "decbase", p2)
    st2 = run_sql(
        spark,
        "CREATE MATERIALIZED VIEW mdec AS SELECT g, AVG(d) AS ad "
        "FROM decbase GROUP BY g",
    ).collect()[0]
    assert st2["mode"] == "full"
