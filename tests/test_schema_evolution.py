"""Schema evolution and partition-spread behaviors at the storage
boundary — long-lived 100 TB tables change schema in place."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_solution_spark.layout import salted_join
from data_warehouse_solution_spark.tables import load_tables, spread

from .conftest import SF_SMOKE


def test_parquet_merge_schema_evolution(spark, tmp_path):
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    v1.write.parquet(out + "/batch=1")
    v2 = spark.createDataFrame([(3, "c", 9.5), (4, "d", 8.0)], ["id", "name", "score"])
    v2.write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None  # old rows read NULL for the new column
    assert rows[3] == 9.5
    assert merged.count() == 4


def test_salted_join_under_heavy_skew(spark):
    """One key owning half the left side: the salted join must still
    produce exactly the plain join's result."""
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 50).select(F.col("id").alias("rk"), (F.col("id") * 10).alias("rv"))
    plain = left.join(right, left["k"] == right["rk"]).groupBy("k").count()
    salted = salted_join(left, right, "k", "rk", n_salts=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the hot key exists and dominates
    hot = dict((r["k"], r["count"]) for r in plain.collect())
    assert hot[7] == 1020  # 1000 forced + 20 from the id%50 tail


def test_spread_noop_on_well_partitioned_input(spark):
    df = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"].repartition(64)
    out = spread(df)
    assert out is df  # no extra shuffle when partitions >= parallelism


def test_spread_preserves_rows(spark):
    df = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    assert spread(df).count() == df.count()
