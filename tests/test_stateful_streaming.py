"""Behavior test for the custom applyInPandasWithState operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_solution_spark.streaming.stateful import user_profile_stream
from data_warehouse_solution_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_stateful_user_profiles_match_batch(spark):
    profiles = user_profile_stream(spark, SF_SMOKE)
    batch = (
        load_tables(spark, SF_SMOKE, ("events",))["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("ts").alias("last_seen"),
        )
    )
    # one profile row per user (bounded source => single micro-batch)
    assert profiles.count() == batch.count()
    joined = profiles.alias("p").join(batch.alias("b"), "user_id")
    assert joined.filter(F.col("p.n_events") != F.col("b.n_events")).count() == 0
    assert joined.filter(F.col("p.last_seen") != F.col("b.last_seen")).count() == 0
    # total_value sanity: nonzero and finite for active users
    row = profiles.orderBy(F.col("n_events").desc()).first()
    assert row["total_value"] is not None
