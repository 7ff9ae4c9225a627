"""Generated columns recompute on EVERY write path, not just create.

The declared invariant (``cowtable._apply_generated``): a generated
column IS its expression — every commit's new bytes carry freshly
recomputed values, and explicitly-supplied values are replaced. These
tests pin the invariant across append / UPDATE (cow + mor) / MERGE /
idempotent append, and the schema-evolution guards that keep the
recompute sound (rename/drop/widen of referenced source columns).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_warehouse_solution_spark import cowtable as cow


@pytest.fixture()
def gen_table(spark, tmp_path):
    path = str(tmp_path / "gen_cow")
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")],
        "id int, amount double, tag string",
    )
    cow.create(
        spark,
        path,
        df,
        generated_columns={"amount_x2": "amount * 2.0", "tag_up": "upper(tag)"},
    )
    return path


def _rows(spark, path):
    return {
        r["id"]: (r["amount"], r["amount_x2"], r["tag"], r["tag_up"])
        for r in cow.read(spark, path).collect()
    }


def test_create_computes_generated(spark, gen_table):
    got = _rows(spark, gen_table)
    assert got[1] == (10.0, 20.0, "a", "A")
    assert got[3] == (30.0, 60.0, "a", "A")


def test_append_recomputes_generated(spark, gen_table):
    # supply WRONG explicit values — recompute-always must replace them
    rows = spark.createDataFrame(
        [(4, 40.0, "c", -1.0, "zzz")],
        "id int, amount double, tag string, amount_x2 double, tag_up string",
    )
    cow.append(spark, gen_table, rows)
    got = _rows(spark, gen_table)
    assert got[4] == (40.0, 80.0, "c", "C")


def test_append_fills_generated_when_absent(spark, gen_table):
    # omit the generated columns entirely: NULL-filled by the schema
    # cast, then recomputed from the source columns
    rows = spark.createDataFrame([(5, 50.0, "d")], "id int, amount double, tag string")
    cow.append(spark, gen_table, rows)
    got = _rows(spark, gen_table)
    assert got[5] == (50.0, 100.0, "d", "D")


def test_update_recomputes_generated(spark, gen_table):
    cow.update(spark, gen_table, "id = 2", {"amount": "amount + 5.0"})
    got = _rows(spark, gen_table)
    assert got[2] == (25.0, 50.0, "b", "B")
    # untouched rows keep their values
    assert got[1] == (10.0, 20.0, "a", "A")


def test_mor_update_recomputes_generated(spark, gen_table):
    cow.update(spark, gen_table, "id = 3", {"amount": "amount * 10.0"}, mode="mor")
    got = _rows(spark, gen_table)
    assert got[3] == (300.0, 600.0, "a", "A")


def test_merge_upsert_recomputes_generated(spark, gen_table):
    src = spark.createDataFrame(
        [(2, 99.0, "e"), (6, 60.0, "f")], "id int, amount double, tag string"
    )
    cow.merge_upsert(spark, gen_table, src, ["id"])
    got = _rows(spark, gen_table)
    assert got[2] == (99.0, 198.0, "e", "E")  # matched: replaced + recomputed
    assert got[6] == (60.0, 120.0, "f", "F")  # unmatched: appended + recomputed


def test_idempotent_append_recomputes_generated(spark, gen_table):
    rows = spark.createDataFrame([(7, 70.0, "g")], "id int, amount double, tag string")
    cow.append(spark, gen_table, rows, txn_app_id="genapp", txn_version=1)
    got = _rows(spark, gen_table)
    assert got[7] == (70.0, 140.0, "g", "G")


def test_rename_source_column_refused(spark, gen_table):
    with pytest.raises(ValueError, match="generated column"):
        cow.alter_rename_column(spark, gen_table, "amount", "amt")


def test_rename_generated_column_follows(spark, gen_table):
    cow.alter_rename_column(spark, gen_table, "amount_x2", "double_amount")
    m = cow._load_manifest(
        spark, gen_table, cow.current_snapshot(spark, gen_table)
    )
    assert "double_amount" in m["generated_columns"]
    assert "amount_x2" not in m["generated_columns"]
    # writes after the rename still recompute under the new name
    rows = spark.createDataFrame([(8, 80.0, "h")], "id int, amount double, tag string")
    cow.append(spark, gen_table, rows)
    got = {
        r["id"]: r["double_amount"] for r in cow.read(spark, gen_table).collect()
    }
    assert got[8] == 160.0


def test_drop_source_column_refused_drop_generated_ok(spark, gen_table):
    with pytest.raises(ValueError, match="generated column"):
        cow.alter_drop_column(spark, gen_table, "tag")
    cow.alter_drop_column(spark, gen_table, "tag_up")
    m = cow._load_manifest(
        spark, gen_table, cow.current_snapshot(spark, gen_table)
    )
    assert "tag_up" not in (m.get("generated_columns") or {})
    # the remaining rule still applies on the next write
    rows = spark.createDataFrame([(9, 90.0, "i")], "id int, amount double, tag string")
    cow.append(spark, gen_table, rows)
    got = {r["id"]: r["amount_x2"] for r in cow.read(spark, gen_table).collect()}
    assert got[9] == 180.0


def test_widen_source_refused_when_generated_type_diverges(spark, tmp_path):
    path = str(tmp_path / "gen_widen")
    df = spark.createDataFrame([(1, 10)], "id int, n int")
    cow.create(spark, path, df, generated_columns={"n2": "n * 2"})
    with pytest.raises(ValueError, match="generated"):
        cow.alter_widen_column(spark, path, "n", "bigint")
    # widening an UNREFERENCED column stays allowed
    cow.alter_widen_column(spark, path, "id", "bigint")


def test_dsv2_writer_recomputes_generated_tables(spark, gen_table):
    """r8 punch-list #5: the DSv2 writer no longer refuses
    generated-column tables — DuckDB-expressible expressions are
    recomputed per task, so the STALE values this frame carries
    (2.0 / 'J' for amount 1.0 / tag 'j') must land OVERWRITTEN with
    the expressions' values, identical to cowtable.append."""
    from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch

    register_cow_batch(spark)
    rows = spark.createDataFrame(
        [(10, 1.0, "j", 2.0, "J")],
        "id int, amount double, tag string, amount_x2 double, tag_up string",
    )
    rows.write.format("cow").option("tablePath", gen_table).mode("append").save()
    got = _rows(spark, gen_table)
    assert got[10] == (1.0, 2.0, "j", "J")  # 1.0*2=2.0 happens to match
    # a value where the stale frame DIVERGES from the expression
    rows2 = spark.createDataFrame(
        [(11, 3.0, "k", -99.0, "WRONG")],
        "id int, amount double, tag string, amount_x2 double, tag_up string",
    )
    rows2.write.format("cow").option("tablePath", gen_table).mode("append").save()
    got = _rows(spark, gen_table)
    assert got[11] == (3.0, 6.0, "k", "K")


def test_dsv2_writer_generated_over_integral_columns(spark, tmp_path):
    """r10 (ADVICE): Spark's schema JSON spells integral types
    'long'/'integer'/'short'/'byte', not the simpleString forms the
    staging probe's type map knows — so a generated expression over a
    bigint/int column was falsely refused at planning ('Referenced
    column not found' → 'not portable ANSI SQL') even though the
    recompute itself handles it. Pin the canonicalization: bigint and
    int source columns must probe AND recompute through the DSv2
    writer."""
    from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch

    register_cow_batch(spark)
    path = str(tmp_path / "gen_int_cow")
    df = spark.createDataFrame([(1, 100, 7)], "k bigint, n int, id int")
    cow.create(
        spark,
        path,
        df,
        generated_columns={"k2": "k + 1", "n2": "n * 2"},
    )
    # stale/WRONG generated values carried by the frame must be
    # overwritten by the per-task recompute
    rows = spark.createDataFrame(
        [(5, 10, 8, -1, -1)],
        "k bigint, n int, id int, k2 bigint, n2 int",
    )
    rows.write.format("cow").option("tablePath", path).mode("append").save()
    got = {r["id"]: (r["k2"], r["n2"]) for r in cow.read(spark, path).collect()}
    assert got[7] == (2, 200)
    assert got[8] == (6, 20)


def test_generated_clause_sql_text(spark, tmp_path):
    """r11: GENERATED (col AS (expr), ...) in gate CREATE SQL — the
    clause survives balanced parens/commas inside expressions, the
    implicit-column-list INSERT targets the non-generated columns,
    SHOW CREATE round-trips the clause, and malformed clauses refuse.
    A payload string literal containing 'GENERATED (...)' is data."""
    from data_warehouse_solution_spark.sql_gate import run_sql

    p = str(tmp_path / "gensql")
    run_sql(
        spark,
        f"CREATE TABLE `{p}` USING cow "
        "GENERATED (g2 AS (greatest(k, 2, (k + 1))), neg AS (0 - k)) "
        "AS SELECT id AS k FROM range(4)",
    )
    rows = {r.k: (r.g2, r.neg) for r in run_sql(spark, f"SELECT * FROM cow.`{p}`").collect()}
    assert rows == {0: (2, 0), 1: (2, -1), 2: (3, -2), 3: (4, -3)}
    # implicit column list = non-generated columns; engine recomputes
    run_sql(spark, f"INSERT INTO `{p}` VALUES (9)")
    assert run_sql(
        spark, f"SELECT g2, neg FROM cow.`{p}` WHERE k = 9"
    ).first()[:] == (10, -9)
    # explicit full arity still accepted (values recomputed anyway)
    run_sql(spark, f"INSERT INTO `{p}` (k, g2, neg) VALUES (5, 0, 0)")
    assert run_sql(
        spark, f"SELECT g2, neg FROM cow.`{p}` WHERE k = 5"
    ).first()[:] == (6, -5)
    # SHOW CREATE emits the clause; re-execution round-trips
    st = run_sql(spark, f"SHOW CREATE TABLE `{p}`").first().createtab_stmt
    assert "GENERATED (g2 AS (greatest(k, 2, (k + 1))), neg AS (0 - k))" in st
    p2 = str(tmp_path / "gensql2")
    run_sql(spark, st.replace(p, p2) + f" AS SELECT k FROM cow.`{p}`")
    d2 = {
        r.col_name: r.info
        for r in run_sql(spark, f"DESCRIBE TABLE `{p2}`").collect()
    }
    assert d2["g2"] == "generated as (greatest(k, 2, (k + 1)))"
    # refusals
    import pytest as _pytest

    for bad in (
        f"CREATE TABLE `{p}x` USING cow GENERATED (g AS k) AS SELECT 1 AS k",
        f"CREATE TABLE `{p}x` USING cow GENERATED () AS SELECT 1 AS k",
        f"CREATE TABLE `{p}x` USING cow GENERATED (g AS (nope(k))) AS SELECT 1 AS k",
    ):
        with _pytest.raises(ValueError):
            run_sql(spark, bad)
    # a literal in the payload is DATA, never a clause
    p3 = str(tmp_path / "genlit")
    run_sql(spark, f"CREATE TABLE `{p3}` USING cow AS SELECT 'GENERATED (x AS (1))' AS s")
    assert run_sql(spark, f"SELECT s FROM cow.`{p3}`").first().s == "GENERATED (x AS (1))"
