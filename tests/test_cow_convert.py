"""CONVERT TO COW (r10): in-place adoption of plain parquet
directories — metadata-only renames + footer stats, then full DML /
time travel / catalog registration on the adopted table."""

from __future__ import annotations

import pytest

from data_warehouse_solution_spark import cowtable as cow
from data_warehouse_solution_spark.sql_gate import run_sql


def _plain_dir(spark, path, partitioned=True, n=60):
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS st"
    ).coalesce(2)
    w = df.write
    if partitioned:
        w = w.partitionBy("st")
    w.parquet(path)


def test_convert_flat_then_dml(spark, tmp_path):
    p = str(tmp_path / "flat")
    _plain_dir(spark, p, partitioned=False)
    snap = cow.convert_to_cow(spark, p)
    assert snap == 1
    assert cow.is_cow_table(spark, p)
    assert cow.read(spark, p).count() == 60
    cow.delete(spark, p, "k % 2 = 0")
    assert cow.read(spark, p).count() == 30
    assert [r["operation"] for r in cow.history(spark, p)] == [
        "convert", "delete",
    ]
    # time travel reaches the adopted snapshot
    assert cow.read(spark, p, snapshot=1).count() == 60


def test_convert_partitioned_typed_spec_prunes(spark, tmp_path):
    """A typed partition spec overrides directory-value inference
    (digit dirs infer int; the producer's column was string) and the
    adopted layout prunes exactly like a natively created table."""
    import json

    p = str(tmp_path / "part")
    _plain_dir(spark, p)
    cow.convert_to_cow(spark, p, partition_by=["st string"])
    m = cow._load_manifest(spark, p, 1)
    f = [x for x in json.loads(m["schema"])["fields"] if x["name"] == "st"]
    assert f[0]["type"] == "string"
    total = len(m["files"])
    pruned = cow.stats_candidate_files(m, "st = '1'")
    assert 0 < len(pruned) < total
    # adopted basenames are snapshot-scoped unique (producer names
    # COLLIDE across partition dirs, which would corrupt the
    # basename-keyed stats map)
    basenames = [e["name"].rsplit("/", 1)[-1] for e in m["files"]]
    assert len(set(basenames)) == len(basenames)
    assert all(b.startswith("snap00000001-") for b in basenames)
    # DML on the adopted table
    cow.update(spark, p, "st = '2'", {"k": "k + 1000"})
    assert cow.read(spark, p).filter("k >= 1000").count() == 20


def test_convert_through_gate_and_catalog(spark, tmp_path):
    """The SQL route: CONVERT TO COW parquet.`/p` PARTITIONED BY
    (name type), then CREATE TABLE name USING cow LOCATION registers
    the adopted table and DML runs by name."""
    from data_warehouse_solution_spark import catalog

    old = spark.conf.get("spark.dws.cow.catalogDir", None)
    spark.conf.set("spark.dws.cow.catalogDir", str(tmp_path / "_cat"))
    try:
        p = str(tmp_path / "gate")
        _plain_dir(spark, p)
        snap = run_sql(
            spark,
            f"CONVERT TO COW parquet.`{p}` PARTITIONED BY (st string)",
        ).first()["snapshot_id"]
        assert snap == 1
        run_sql(spark, f"CREATE TABLE adopted USING cow LOCATION '{p}'")
        run_sql(spark, "DELETE FROM adopted WHERE st = '0'")
        assert run_sql(
            spark, "SELECT COUNT(*) AS n FROM adopted"
        ).first().n == 40
        run_sql(spark, "DROP TABLE adopted")
        assert catalog.resolve(spark, "adopted") is None
    finally:
        if old is None:
            spark.conf.unset("spark.dws.cow.catalogDir")
        else:
            spark.conf.set("spark.dws.cow.catalogDir", old)


def test_convert_refusals(spark, tmp_path):
    # already a COW table
    p = str(tmp_path / "already")
    cow.create(spark, p, spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="already exists"):
        cow.convert_to_cow(spark, p)
    # partition directories without a matching spec
    p2 = str(tmp_path / "mismatch")
    _plain_dir(spark, p2)
    with pytest.raises(ValueError, match="partition director"):
        cow.convert_to_cow(spark, p2)
    with pytest.raises(ValueError, match="partition director"):
        cow.convert_to_cow(spark, p2, partition_by=["wrong"])
    # nothing to convert
    p3 = str(tmp_path / "empty")
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        cow.convert_to_cow(spark, p3)
    # bad spec shape
    with pytest.raises(ValueError, match="partition spec"):
        cow.convert_to_cow(spark, p2, partition_by=["a b c"])
    # a data/ subtree refuses (half-converted or colliding layout)
    p4 = str(tmp_path / "collide")
    _plain_dir(spark, p4, partitioned=False, n=5)
    spark.range(3).selectExpr("id AS k").write.parquet(f"{p4}/data")
    with pytest.raises(ValueError, match="data/ subtree"):
        cow.convert_to_cow(spark, p4)
