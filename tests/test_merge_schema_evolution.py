"""Write-side schema evolution (r12): MERGE WITH SCHEMA EVOLUTION
(Delta's clause) and append ``merge_schema`` — new source columns are
ADDED to the target schema atomically with the writing commit;
pre-existing files NULL-fill on read (zero rewrite outside the write
set); re-added names can never resurrect stale bytes (fresh physical
name via the column-mapping bookkeeping); races with concurrent
schema changes refuse loudly."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _mk(spark, path, mode=None):
    cow.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, v string, x double",
        ),
        write_mode=mode,
    )
    return path


def test_merge_star_evolution_adds_source_columns(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame(
        [(2, "B", 2.5, "new2"), (9, "I", 9.5, "new9")],
        "k long, v string, x double, extra string",
    )
    st = cow.merge(
        spark, p, src, ["k"],
        [
            {"when": "matched", "then": "update", "set": "*"},
            {"when": "not_matched", "then": "insert", "values": "*"},
        ],
        schema_evolution=True,
    )
    assert st["files_written"] >= 1
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert set(rows) == {1, 2, 3, 9}
    assert rows[2]["extra"] == "new2" and rows[2]["v"] == "B"
    assert rows[9]["extra"] == "new9"
    assert rows[1]["extra"] is None and rows[3]["extra"] is None  # carried rows
    # the pre-merge snapshot still reads the OLD schema
    assert "extra" not in cow.read(spark, p, 1).columns


def test_merge_explicit_assignment_evolves_named_source_column(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame(
        [(1, 77), (8, 88)], "k long, score int"
    )
    cow.merge(
        spark, p, src, ["k"],
        [
            {"when": "matched", "then": "update", "set": {"score": "s.score"}},
            {
                "when": "not_matched",
                "then": "insert",
                "values": {"k": "s.k", "score": "s.score"},
            },
        ],
        schema_evolution=True,
    )
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[1]["score"] == 77 and rows[8]["score"] == 88
    assert rows[2]["score"] is None
    assert rows[8]["v"] is None  # unset columns NULL on evolved insert


def test_merge_refuses_unknown_assignment_without_evolution(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame([(1, 77)], "k long, score int")
    with pytest.raises(ValueError, match="schema_evolution"):
        cow.merge(
            spark, p, src, ["k"],
            [{"when": "matched", "then": "update", "set": {"score": "s.score"}}],
        )
    # nothing half-committed
    assert cow.current_snapshot(spark, p) == 1


def test_merge_evolution_refuses_untypeable_column(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="neither the target schema nor"):
        cow.merge(
            spark, p, src, ["k"],
            [{"when": "matched", "then": "update", "set": {"ghost": "42"}}],
            schema_evolution=True,
        )


def test_merge_evolution_without_new_columns_is_plain_merge(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame([(2, "B", 2.5)], "k long, v string, x double")
    cow.merge(
        spark, p, src, ["k"],
        [{"when": "matched", "then": "update", "set": "*"}],
        schema_evolution=True,
    )
    m = cow.table_head_meta(spark, p)
    assert len(cow._snapshot_schema(m).fields) == 3


def test_merge_evolution_mor_mode(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"), mode="mor")
    src = spark.createDataFrame(
        [(3, "C", 3.5, 99)], "k long, v string, x double, rank int"
    )
    st = cow.merge(
        spark, p, src, ["k"],
        [
            {"when": "matched", "then": "update", "set": "*"},
            {"when": "not_matched", "then": "insert", "values": "*"},
        ],
        mode="mor",
        schema_evolution=True,
    )
    assert st["files_rewritten"] == 0  # deletion-vector path
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[3]["rank"] == 99 and rows[3]["v"] == "C"
    assert rows[1]["rank"] is None


def test_readded_name_cannot_resurrect_stale_bytes(spark, tmp_path):
    """Drop a column, then merge-evolve a SAME-NAME column back: the
    retained files still hold parquet bytes under the old physical
    name — the evolved column must read NULL there, not the corpse."""
    p = str(tmp_path / "t")
    cow.create(
        spark,
        p,
        spark.createDataFrame(
            [(1, "ghost1"), (2, "ghost2")], "k long, extra string"
        ),
    )
    cow.alter_drop_column(spark, p, "extra")
    src = spark.createDataFrame([(2, "fresh2")], "k long, extra string")
    cow.merge(
        spark, p, src, ["k"],
        [{"when": "matched", "then": "update", "set": "*"}],
        schema_evolution=True,
    )
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[2]["extra"] == "fresh2"
    assert rows[1]["extra"] is None  # NOT "ghost1"


def test_gate_merge_with_schema_evolution_star(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    spark.createDataFrame(
        [(2, "B", 2.5, 7), (9, "I", 9.5, 8)],
        "k long, v string, x double, prio int",
    ).createOrReplaceTempView("dws_evo_src")
    out = run_sql(
        spark,
        f"""MERGE WITH SCHEMA EVOLUTION INTO cow.`{p}` t
            USING dws_evo_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    ).collect()[0]
    assert out["files_written"] >= 1
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[2]["prio"] == 7 and rows[9]["prio"] == 8
    assert rows[1]["prio"] is None


def test_gate_merge_without_evolution_unchanged(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    spark.createDataFrame(
        [(2, "B", 2.5)], "k long, v string, x double"
    ).createOrReplaceTempView("dws_noevo_src")
    run_sql(
        spark,
        f"""MERGE INTO cow.`{p}` t USING dws_noevo_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert set(cow.read(spark, p).columns) == {"k", "v", "x"}


def test_append_merge_schema_adds_columns(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    extra = spark.createDataFrame(
        [(10, "j", 1.0, True)], "k long, v string, x double, flag boolean"
    )
    cow.append(spark, p, extra, merge_schema=True)
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[10]["flag"] is True
    assert rows[1]["flag"] is None
    # without the flag, extra input columns drop (INSERT column-list
    # semantics — the schema cast projection), table schema unchanged
    cow.append(
        spark, p,
        spark.createDataFrame(
            [(11, "m", 2.0, "zzz")], "k long, v string, x double, junk string"
        ),
    )
    assert "junk" not in cow.read(spark, p).columns


def test_append_merge_schema_noop_when_no_new_columns(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    cow.append(
        spark, p,
        spark.createDataFrame([(4, "d", 4.0)], "k long, v string, x double"),
        merge_schema=True,
    )
    m = cow.table_head_meta(spark, p)
    assert len(cow._snapshot_schema(m).fields) == 3
    assert cow.read(spark, p).count() == 4


def test_merge_set_star_skips_columns_missing_from_source(spark, tmp_path):
    """SET * copies same-name source columns only (Delta's expansion
    rule): a target column the source lacks keeps its current value
    instead of failing analysis."""
    p = _mk(spark, str(tmp_path / "t"))
    src = spark.createDataFrame([(2, "B")], "k long, v string")  # no x
    cow.merge(
        spark, p, src, ["k"],
        [{"when": "matched", "then": "update", "set": "*"}],
    )
    rows = {r["k"]: r for r in cow.read(spark, p).collect()}
    assert rows[2]["v"] == "B" and rows[2]["x"] == 20.0
