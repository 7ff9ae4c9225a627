"""CREATE VIEW / SHOW VIEWS / DROP VIEW through the gate (r13): the
reference's warehouse is Dremio, whose primary modeling surface is the
virtual dataset — a named stored SELECT re-planned at every read
(``README.md:3-4``). Views share the catalog namespace with tables
(collisions refuse both ways), expand inline at FROM/JOIN position
(composing with CTEs, cow.`path` refs, and other views), and refuse
every write/maintenance/time-travel form."""

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


def _base(spark, tmp_path, name="vbase"):
    p = str(tmp_path / name)
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "k long, g string, v double",
        ),
    )
    catalog.register(spark, name, p)
    return p


def test_view_reflects_base_dml(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW v_agg AS SELECT g, SUM(v) AS s FROM vbase GROUP BY g")
    got = {r["g"]: r["s"] for r in run_sql(spark, "SELECT * FROM v_agg").collect()}
    assert got == {"a": 40.0, "b": 20.0}
    run_sql(spark, "INSERT INTO vbase VALUES (4, 'b', 5.0)")
    run_sql(spark, "DELETE FROM vbase WHERE k = 1")
    got = {r["g"]: r["s"] for r in run_sql(spark, "SELECT * FROM v_agg").collect()}
    assert got == {"a": 30.0, "b": 25.0}  # re-planned, not materialized


def test_view_over_view_and_joins(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW v1 AS SELECT k, v FROM vbase WHERE v > 10")
    run_sql(spark, "CREATE VIEW v2 AS SELECT k, v * 2 AS v2 FROM v1")
    rows = run_sql(
        spark,
        "SELECT b.g, x.v2 FROM v2 x JOIN vbase b ON x.k = b.k ORDER BY x.v2",
    ).collect()
    assert [(r["g"], r["v2"]) for r in rows] == [("b", 40.0), ("a", 60.0)]


def test_view_name_precedence_cte_shadows(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vshadow AS SELECT k FROM vbase")
    got = run_sql(
        spark,
        "WITH vshadow AS (SELECT 99 AS k) SELECT * FROM vshadow",
    ).collect()
    assert [r["k"] for r in got] == [99]  # CTE wins over the view


def test_view_refusals(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vr AS SELECT * FROM vbase")
    with pytest.raises(ValueError, match="is a VIEW"):
        run_sql(spark, "INSERT INTO vr VALUES (9, 'z', 1.0)")
    with pytest.raises(ValueError, match="is a VIEW"):
        run_sql(spark, "DELETE FROM vr WHERE k = 1")
    with pytest.raises(ValueError, match="use DROP VIEW"):
        run_sql(spark, "DROP TABLE vr")
    with pytest.raises(ValueError, match="use DROP TABLE"):
        run_sql(spark, "DROP VIEW vbase")
    with pytest.raises(ValueError, match="snapshot TABLES only"):
        run_sql(spark, "SELECT * FROM vr VERSION AS OF 1")
    with pytest.raises(ValueError, match="snapshot TABLES only"):
        run_sql(spark, "SELECT * FROM vr TIMESTAMP AS OF '2026-01-01'")
    with pytest.raises(ValueError, match="is a VIEW"):
        run_sql(spark, "OPTIMIZE vr")
    # name collisions, both directions
    with pytest.raises(ValueError, match="already a registered TABLE"):
        run_sql(spark, "CREATE VIEW vbase AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="already registered"):
        run_sql(spark, "CREATE VIEW vr AS SELECT 1 AS x")
    # body must be a query, and must plan
    with pytest.raises(ValueError, match="must be a query"):
        run_sql(spark, "CREATE VIEW vbad AS DROP TABLE vbase")
    with pytest.raises(ValueError, match="does not plan"):
        run_sql(spark, "CREATE VIEW vbad AS SELECT * FROM no_such_table_xyz")
    assert "vbad" not in catalog.views(spark)


def test_view_or_replace_and_drop(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vv AS SELECT k FROM vbase")
    run_sql(spark, "CREATE OR REPLACE VIEW vv AS SELECT g FROM vbase")
    assert run_sql(spark, "SELECT * FROM vv").columns == ["g"]
    assert run_sql(spark, "DROP VIEW vv").collect()[0]["dropped"] is True
    assert catalog.views(spark) == {}
    assert run_sql(spark, "DROP VIEW IF EXISTS vv").collect()[0]["dropped"] is False


def test_show_views_like(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW rpt_a AS SELECT 1 AS x")
    run_sql(spark, "CREATE VIEW rpt_b AS SELECT 2 AS x")
    run_sql(spark, "CREATE VIEW other AS SELECT 3 AS x")
    names = [r["name"] for r in run_sql(spark, "SHOW VIEWS").collect()]
    assert names == ["other", "rpt_a", "rpt_b"]
    liked = [r["name"] for r in run_sql(spark, "SHOW VIEWS LIKE 'rpt%'").collect()]
    assert liked == ["rpt_a", "rpt_b"]
    # tables listing never leaks views and vice versa
    assert "rpt_a" not in catalog.tables(spark)
    assert "vbase" not in catalog.views(spark)


def test_view_cycle_guard(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vc AS SELECT k FROM vbase")
    # OR REPLACE lets a view reference its own name (validated against
    # the OLD definition) — the read-time depth cap must refuse
    run_sql(spark, "CREATE OR REPLACE VIEW vc AS SELECT k FROM vc")
    with pytest.raises(ValueError, match="depth"):
        run_sql(spark, "SELECT * FROM vc").collect()


def test_view_temp_views_stay_native(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE OR REPLACE TEMPORARY VIEW native_tv AS SELECT 7 AS x")
    assert run_sql(spark, "SELECT * FROM native_tv").collect()[0]["x"] == 7
    assert catalog.views(spark) == {}  # never entered the lake catalog
    spark.catalog.dropTempView("native_tv")


def test_view_composes_with_cow_path_refs(spark, cat_dir, tmp_path):
    p = _base(spark, tmp_path)
    run_sql(
        spark,
        f"CREATE VIEW vpath AS SELECT COUNT(*) AS n FROM cow.`{p}`",
    )
    assert run_sql(spark, "SELECT * FROM vpath").collect()[0]["n"] == 3
    run_sql(spark, f"INSERT INTO cow.`{p}` VALUES (9, 'z', 1.0)")
    assert run_sql(spark, "SELECT * FROM vpath").collect()[0]["n"] == 4


def test_describe_view(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vdesc AS SELECT g, SUM(v) AS s FROM vbase GROUP BY g")
    rows = {r["col_name"]: r["data_type"] for r in
            run_sql(spark, "DESCRIBE TABLE vdesc").collect()}
    assert rows["g"] == "string" and rows["s"] == "double"
    assert rows["# kind"] == "view"
    assert "GROUP BY g" in rows["# sql"]


def test_show_create_view_roundtrips(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vsc AS SELECT k FROM vbase WHERE v > 10")
    stmt = run_sql(spark, "SHOW CREATE TABLE vsc").collect()[0]["createtab_stmt"]
    assert stmt == "CREATE VIEW vsc AS SELECT k FROM vbase WHERE v > 10"
    run_sql(spark, "DROP VIEW vsc")
    run_sql(spark, stmt)  # round-trips
    assert [r["k"] for r in run_sql(spark, "SELECT * FROM vsc ORDER BY k").collect()] == [2, 3]


def test_create_view_if_not_exists(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vine AS SELECT k FROM vbase")
    # existing view: no-op, definition unchanged
    run_sql(spark, "CREATE VIEW IF NOT EXISTS vine AS SELECT g FROM vbase")
    assert run_sql(spark, "SELECT * FROM vine").columns == ["k"]
    # fresh name: creates
    run_sql(spark, "CREATE VIEW IF NOT EXISTS vine2 AS SELECT g FROM vbase")
    assert run_sql(spark, "SELECT * FROM vine2").columns == ["g"]
    # a TABLE under the name still refuses, IF NOT EXISTS or not
    with pytest.raises(ValueError, match="already a registered TABLE"):
        run_sql(spark, "CREATE VIEW IF NOT EXISTS vbase AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_sql(spark, "CREATE OR REPLACE VIEW IF NOT EXISTS vine AS SELECT 1 AS x")


def test_alter_view_redefines(spark, cat_dir, tmp_path):
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW valter AS SELECT k FROM vbase")
    run_sql(spark, "ALTER VIEW valter AS SELECT g, v FROM vbase")
    assert run_sql(spark, "SELECT * FROM valter").columns == ["g", "v"]
    with pytest.raises(ValueError, match="is a registered TABLE"):
        run_sql(spark, "ALTER VIEW vbase AS SELECT 1 AS x")
    with pytest.raises(Exception):  # unknown name falls through to Spark
        run_sql(spark, "ALTER VIEW nosuch_view_xyz AS SELECT 1 AS x")
    # native temp views keep working through the same verb
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ntv AS SELECT 1 AS a")
    run_sql(spark, "ALTER VIEW ntv AS SELECT 2 AS b")
    assert run_sql(spark, "SELECT * FROM ntv").columns == ["b"]
    spark.catalog.dropTempView("ntv")

def test_view_body_trailing_line_comment(spark, cat_dir, tmp_path):
    # ADVICE r13 (low): a body ending in an EOF-reaching line comment
    # planned fine at CREATE but swallowed the closing paren of the
    # '(body)' inline form at every read. The comment is stripped at
    # CREATE time; mid-body comments stay and keep working.
    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vcmt AS SELECT k FROM vbase -- note")
    assert sorted(
        r["k"] for r in run_sql(spark, "SELECT * FROM vcmt").collect()
    ) == [1, 2, 3]
    assert catalog.views(spark)["vcmt"].endswith("FROM vbase")
    run_sql(
        spark,
        "CREATE VIEW vcmt2 AS SELECT k -- keep the key\nFROM vbase"
        "\n-- trailing full-line comment",
    )
    assert sorted(
        r["k"] for r in run_sql(spark, "SELECT * FROM vcmt2").collect()
    ) == [1, 2, 3]
    # quoted '--' is a literal, not a comment: body stays intact
    run_sql(spark, "CREATE VIEW vcmt3 AS SELECT '--' AS dash FROM vbase")
    assert run_sql(spark, "SELECT DISTINCT dash FROM vcmt3").collect()[0][
        "dash"
    ] == "--"


def test_create_table_over_view_refuses_without_orphans(
    spark, cat_dir, tmp_path
):
    # ADVICE r13 (low): CREATE TABLE <name> over a VIEW name used to
    # create the COW directory first and only then refuse at
    # registration, orphaning the files. Must refuse upfront.
    import os

    _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vt AS SELECT k FROM vbase")
    with pytest.raises(ValueError, match="registered VIEW"):
        run_sql(spark, "CREATE TABLE vt USING cow AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="registered VIEW"):
        run_sql(
            spark, "CREATE OR REPLACE TABLE vt USING cow AS SELECT 1 AS x"
        )
    assert not os.path.exists(f"{cat_dir}/tables/vt")
    assert catalog.views(spark).get("vt") is not None  # view intact


def test_register_replace_never_flips_kind(spark, cat_dir, tmp_path):
    # ADVICE r13 (low): register(replace=True) must not silently
    # destroy a stored VIEW entry (nor register_view a TABLE entry).
    p = _base(spark, tmp_path)
    run_sql(spark, "CREATE VIEW vk AS SELECT k FROM vbase")
    with pytest.raises(ValueError, match="cannot replace"):
        catalog.register(spark, "vk", p, replace=True)
    assert catalog.views(spark).get("vk") is not None
    with pytest.raises(ValueError, match="already a registered TABLE"):
        catalog.register_view(spark, "vbase", "SELECT 1 AS x", replace=True)
    assert catalog.resolve(spark, "vbase") == p
