"""CREATE TABLE ... LIKE (r12): shape clone — schema, partitioning
(generated partition columns included), bucket spec, blooms, CHECK
constraints, DEFAULTs, write mode, identity specs with counters RESET
— no data, no tags, no COPY registry."""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def test_create_like_clones_full_shape(spark, tmp_path):
    src = str(tmp_path / "src")
    cow.create(
        spark,
        src,
        spark.createDataFrame(
            [(1, "d1", 2.0), (2, "d2", 3.0)], "k long, ds string, x double"
        ),
        partition_by=["ds"],
        bloom_columns=["k"],
        check_constraints={"x_pos": "x > 0"},
        column_defaults={"x": "1.5"},
        write_mode="mor",
    )
    cow.create_tag(spark, src, "v1")
    new = str(tmp_path / "new")
    cow.create_like(spark, new, src)
    m = cow.table_head_meta(spark, new)
    assert m["partition_by"] == ["ds"]
    assert m["bloom_columns"] == ["k"]
    assert m["check_constraints"] == {"x_pos": "x > 0"}
    assert m["column_defaults"] == {"x": "1.5"}
    assert m["write_mode"] == "mor"
    assert not m.get("tags")  # tags do not copy
    assert cow.read(spark, new).count() == 0  # shape, not data
    assert cow.read(spark, new).columns == ["k", "ds", "x"]
    # the constraint is live on the clone
    with pytest.raises(cow.CowConstraintViolation):
        cow.append(
            spark, new,
            spark.createDataFrame([(1, "d", -9.0)], "k long, ds string, x double"),
        )


def test_create_like_resets_identity_counter(spark, tmp_path):
    src = str(tmp_path / "src")
    cow.create(
        spark,
        src,
        spark.createDataFrame([("a",), ("b",), ("c",)], "v string"),
        identity_columns={"id": {"start": 100, "step": 3}},
    )
    new = str(tmp_path / "new")
    cow.create_like(spark, new, src)
    m = cow.table_head_meta(spark, new)
    spec = m["identity_columns"]["id"]
    # declared start/step copied, high-water mark NOT (fresh id space)
    assert spec.get("start") == 100 and spec.get("step") == 3
    assert spec.get("high_water") in (None, 100 - 3, 97)
    cow.append(spark, new, spark.createDataFrame([("z",)], "v string"))
    ids = [r["id"] for r in cow.read(spark, new).collect()]
    # allocation contract: aligned, >= start (sparse strides allowed)
    assert len(ids) == 1 and ids[0] >= 100 and (ids[0] - 100) % 3 == 0


def test_create_like_generated_partition_and_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    cow.create(
        spark,
        src,
        spark.createDataFrame([(1, 2.0)], "k long, x double"),
        generated_columns={"x2": "x * 2"},
        bucket_by=["k"],
        num_buckets=4,
    )
    new = str(tmp_path / "new")
    cow.create_like(spark, new, src)
    m = cow.table_head_meta(spark, new)
    assert m["generated_columns"] == {"x2": "x * 2"}
    assert m["bucket_by"]["columns"] == ["k"] and m["bucket_by"]["buckets"] == 4
    cow.append(spark, new, spark.createDataFrame([(5, 3.0)], "k long, x double"))
    assert cow.read(spark, new).collect()[0]["x2"] == 6.0


def test_create_like_gate_path_and_name(spark, tmp_path):
    src = str(tmp_path / "src")
    cow.create(spark, src, spark.createDataFrame([(1, "a")], "k long, v string"))
    newp = str(tmp_path / "newp")
    out = run_sql(spark, f"CREATE TABLE `{newp}` LIKE cow.`{src}`").collect()[0]
    assert out["snapshot_id"] == 1
    assert cow.read(spark, newp).columns == ["k", "v"]
    # name form requires LOCATION; registers in the catalog
    loc = str(tmp_path / "named_loc")
    run_sql(
        spark,
        f"CREATE TABLE like_named_{id(tmp_path)} LIKE cow.`{src}` LOCATION '{loc}'",
    )
    n = run_sql(
        spark, f"SELECT COUNT(*) AS n FROM like_named_{id(tmp_path)}"
    ).first().n
    assert n == 0
    run_sql(spark, f"DROP TABLE like_named_{id(tmp_path)}")
    with pytest.raises(ValueError, match="requires LOCATION"):
        run_sql(spark, f"CREATE TABLE some_name_xyz LIKE cow.`{src}`")
    with pytest.raises(ValueError, match="NAME target"):
        run_sql(
            spark,
            f"CREATE TABLE `{tmp_path}/p2` LIKE cow.`{src}` LOCATION '/x'",
        )


def test_alter_table_rename_to(spark, tmp_path):
    src = str(tmp_path / "src_rn")
    cow.create(spark, src, spark.createDataFrame([(1, "a")], "k long, v string"))
    old = f"rn_old_{id(tmp_path)}"
    new = f"rn_new_{id(tmp_path)}"
    run_sql(spark, f"CREATE TABLE {old} USING cow LOCATION '{src}'")
    out = run_sql(spark, f"ALTER TABLE {old} RENAME TO {new}").collect()[0]
    assert out["path"] == src
    assert run_sql(spark, f"SELECT COUNT(*) AS n FROM {new}").first().n == 1
    with pytest.raises(Exception):
        run_sql(spark, f"SELECT COUNT(*) AS n FROM {old}")
    # refusals: taken target name; rename of an unregistered name
    # falls through to spark.sql (which refuses its own way)
    run_sql(spark, f"CREATE TABLE {old} USING cow LOCATION '{src}'")
    with pytest.raises(ValueError, match="already registered"):
        run_sql(spark, f"ALTER TABLE {old} RENAME TO {new}")
    run_sql(spark, f"DROP TABLE {old}")
    run_sql(spark, f"DROP TABLE {new}")
