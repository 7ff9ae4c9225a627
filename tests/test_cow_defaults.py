"""Column DEFAULT values (r11, Delta/Spark 3.4 surface): declaration
via create()/CREATE DEFAULTS clause, INSERT fill semantics (engine
append, gate column-list and short-VALUES forms, MERGE not-matched
inserts), ALTER SET/DROP DEFAULT, schema-evolution interactions, and
the refusal surface (non-constant expressions, generated columns)."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path, defaults=None):
    cow.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10.0)], "k long, s string, v double"
        ),
        column_defaults=defaults,
    )


def test_append_fills_default_then_null_after_drop(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p, defaults={"s": "'dflt'", "v": "2.5"})
    cow.append(spark, p, spark.createDataFrame([(2,)], "k long"))
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert (2, "dflt", 2.5) in got
    cow.alter_drop_column_default(spark, p, "v")
    cow.append(spark, p, spark.createDataFrame([(3,)], "k long"))
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert (3, "dflt", None) in got


def test_defaults_are_not_backfill(spark, tmp_path):
    """SET DEFAULT affects future INSERTs only — existing rows and
    rows inserted before the ALTER keep their values (Delta's rule)."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    cow.append(spark, p, spark.createDataFrame([(2,)], "k long"))
    cow.alter_set_column_default(spark, p, "s", "'late'")
    cow.append(spark, p, spark.createDataFrame([(3,)], "k long"))
    got = {(r["k"], r["s"]) for r in cow.read(spark, p).collect()}
    assert got == {(1, "a"), (2, None), (3, "late")}


def test_declaration_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    with pytest.raises(ValueError, match="must be a constant"):
        cow.create(
            spark,
            p,
            spark.createDataFrame([(1, "a")], "k long, s string"),
            column_defaults={"s": "concat(s, '!')"},
        )
    with pytest.raises(ValueError, match="unknown column"):
        cow.create(
            spark,
            p,
            spark.createDataFrame([(1, "a")], "k long, s string"),
            column_defaults={"nope": "'x'"},
        )
    with pytest.raises(ValueError, match="GENERATED"):
        cow.create(
            spark,
            p,
            spark.createDataFrame([(1, "a")], "k long, s string"),
            generated_columns={"s": "upper(cast(k as string))"},
            column_defaults={"s": "'x'"},
        )


def test_rename_moves_default_and_drop_retires_it(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p, defaults={"s": "'d'"})
    cow.alter_rename_column(spark, p, "s", "s2")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert m["column_defaults"] == {"s2": "'d'"}
    cow.append(spark, p, spark.createDataFrame([(2,)], "k long"))
    assert (2, "d", None) in {tuple(r) for r in cow.read(spark, p).collect()}
    cow.alter_drop_column(spark, p, "s2")
    m = cow._load_manifest(spark, p, cow.current_snapshot(spark, p))
    assert "column_defaults" not in m


def test_merge_not_matched_insert_fills_defaults(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p, defaults={"s": "'merged'", "v": "9.0"})
    src = spark.createDataFrame([(5,)], "k long")
    cow.merge(
        spark,
        p,
        src,
        ["k"],
        [{"when": "not_matched", "then": "insert", "values": {"k": "s.k"}}],
    )
    assert (5, "merged", 9.0) in {
        tuple(r) for r in cow.read(spark, p).collect()
    }


def test_gate_create_defaults_and_insert_forms(spark, tmp_path):
    p = str(tmp_path / "t")
    run_sql(
        spark,
        f"""CREATE TABLE cow.`{p}` USING cow
            DEFAULTS (s AS ('new'), v AS (CAST(1.5 AS DOUBLE)))
            AS SELECT k, s, CAST(v AS DOUBLE) AS v
               FROM VALUES (1, 'a', 10.0) AS t(k, s, v)""",
    )
    run_sql(spark, f"INSERT INTO cow.`{p}` (k, v) VALUES (2, 7.0)")
    run_sql(spark, f"INSERT INTO cow.`{p}` VALUES (3)")  # trailing fill
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert got == {(1, "a", 10.0), (2, "new", 7.0), (3, "new", 1.5)}
    # short row where a trailing column has NO default refuses
    run_sql(spark, f"ALTER TABLE cow.`{p}` ALTER COLUMN v DROP DEFAULT")
    with pytest.raises(ValueError, match="arity"):
        run_sql(spark, f"INSERT INTO cow.`{p}` VALUES (4)")


def test_gate_alter_default_and_show_create_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    p2 = str(tmp_path / "t2")
    _mk(spark, p)
    run_sql(
        spark,
        f"ALTER TABLE cow.`{p}` ALTER COLUMN s SET DEFAULT upper('x')",
    )
    stmts = [
        r["createtab_stmt"]
        for r in run_sql(spark, f"SHOW CREATE TABLE cow.`{p}`").collect()
    ]
    assert any("DEFAULTS (s AS (upper('x')))" in s for s in stmts)
    # the emitted DDL round-trips: re-execute on a fresh path and the
    # default fills there too
    ddl = stmts[0].replace(f"cow.`{p}`", f"cow.`{p2}`") + " AS SELECT "
    ddl += "CAST(1 AS BIGINT) AS k, 'a' AS s, CAST(1.0 AS DOUBLE) AS v"
    run_sql(spark, ddl)
    run_sql(spark, f"INSERT INTO cow.`{p2}` (k, v) VALUES (2, 2.0)")
    assert (2, "X", 2.0) in {tuple(r) for r in cow.read(spark, p2).collect()}
    d = {
        r["col_name"]: r["info"]
        for r in run_sql(spark, f"DESCRIBE TABLE cow.`{p}`").collect()
    }
    assert d["s"] == "default (upper('x'))"


def test_gate_set_default_refuses_column_reference(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk(spark, p)
    with pytest.raises(ValueError, match="constant"):
        run_sql(
            spark, f"ALTER TABLE cow.`{p}` ALTER COLUMN s SET DEFAULT k + 1"
        )
    with pytest.raises(ValueError, match="no DEFAULT"):
        run_sql(spark, f"ALTER TABLE cow.`{p}` ALTER COLUMN s DROP DEFAULT")


def test_replace_where_fills_defaults(spark, tmp_path):
    """replace_where introduces content like INSERT, so omitted
    defaulted columns fill their DEFAULT, not NULL (Spark 3.4 applies
    defaults to INSERT ... REPLACE WHERE)."""
    p = str(tmp_path / "t")
    _mk(spark, p, defaults={"s": "'filled'", "v": "5.0"})
    cow.replace_where(
        spark, p, "k >= 2", spark.createDataFrame([(2,)], "k long")
    )
    got = {tuple(r) for r in cow.read(spark, p).collect()}
    assert got == {(1, "a", 10.0), (2, "filled", 5.0)}


def test_declaration_refuses_nonconvertible_constant(spark, tmp_path):
    """r12 review fix: a constant that ANALYZES but cannot CONVERT
    (DEFAULT 'abc' on a DOUBLE column) is refused at declaration —
    it used to pass the analysis-only probe and then silently fill
    NULL on every INSERT (Delta refuses at declaration)."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.0)], "k long, d double")
    with pytest.raises(ValueError, match="not convertible|castable"):
        cow.create(spark, p, df, column_defaults={"d": "'abc'"})
    # NULL itself stays a legal default, and convertible strings pass
    cow.create(spark, p, df, column_defaults={"d": "'3.5'"})
    cow.append(spark, p, spark.createDataFrame([(2,)], "k long"))
    got = {r["k"]: r["d"] for r in cow.read(spark, p).collect()}
    assert got[2] == 3.5
