"""The ``cow`` BATCH Data Source (``sources/cow_batch.py``): DSv2
reads must mirror ``cowtable.read`` exactly — manifest-schema
authority (evolved columns NULL from old files), Hive partition
re-injection, version and timestamp time travel, clear errors."""

from __future__ import annotations

import datetime

import pytest

import data_warehouse_solution_spark.cowtable as cow
from data_warehouse_solution_spark.sources.cow_batch import register_cow_batch


def _read(spark, path, **opts):
    r = spark.read.format("cow").option("tablePath", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_source_matches_cowtable_read(spark, tmp_path):
    path = str(tmp_path / "t")
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "k long, v string, x double"),
    )
    cow.append(spark, path, spark.createDataFrame([(3, "c", 3.5)], "k long, v string, x double"))
    register_cow_batch(spark)
    got = {tuple(r) for r in _read(spark, path).collect()}
    want = {tuple(r) for r in cow.read(spark, path).collect()}
    assert got == want and len(got) == 3


def test_batch_source_time_travel_and_errors(spark, tmp_path):
    path = str(tmp_path / "tt")
    cow.create(spark, path, spark.createDataFrame([(1,)], "k long"))
    mid = datetime.datetime.now(datetime.timezone.utc).isoformat()
    cow.append(spark, path, spark.createDataFrame([(2,)], "k long"))
    register_cow_batch(spark)
    assert _read(spark, path, versionAsOf="1").count() == 1
    assert _read(spark, path, timestampAsOf=mid).count() == 1
    assert _read(spark, path).count() == 2
    with pytest.raises(Exception, match="precedes the first commit"):
        _read(spark, path, timestampAsOf="2000-01-01").count()
    with pytest.raises(Exception, match="not available"):
        _read(spark, path, versionAsOf="99").count()
    with pytest.raises(Exception, match="not both"):
        _read(spark, path, versionAsOf="1", timestampAsOf=mid).count()


def test_batch_source_schema_evolution_and_partitions(spark, tmp_path):
    path = str(tmp_path / "evo")
    cow.create(
        spark,
        path,
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, part string"),
        partition_by=["part"],
    )
    cow.alter_add_column(spark, path, "extra", "int")
    cow.append(
        spark,
        path,
        spark.createDataFrame([(3, "x", 7)], "k long, part string, extra int"),
    )
    register_cow_batch(spark)
    rows = {tuple(r) for r in _read(spark, path).collect()}
    # pre-evolution files read extra as NULL; partition values re-injected
    assert rows == {(1, "x", None), (2, "y", None), (3, "x", 7)}
    # the versioned schema is the OLD one at snapshot 1
    assert _read(spark, path, versionAsOf="1").columns == ["k", "part"]
