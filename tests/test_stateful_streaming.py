"""Behavior test for the custom applyInPandasWithState operator."""

from __future__ import annotations

import pytest
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


def test_running_stats_matches_batch(spark):
    """The running-stats stateful operator must agree with the batch
    groupBy on count and max per user — on WHICHEVER arbitrary-state
    API the environment supports (transformWithStateInPandas when
    protobuf is present, applyInPandasWithState otherwise), so this
    asserts real behavior everywhere instead of skipping."""
    from data_warehouse_solution_spark.streaming.stateful import user_running_stats

    out = user_running_stats(spark, SF_SMOKE)
    got = {r["user_id"]: (r["n_events"], r["max_value"]) for r in out.collect()}
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    exp = {
        r["user_id"]: (r["n"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0], u
        assert abs(got[u][1] - exp[u][1]) < 1e-9, u


def test_tws_unavailable_raises_clear_error(spark):
    """Where protobuf is absent the v2 API must fail fast with an
    actionable message (not a mid-stream worker crash); where present,
    it must simply work (asserted by the test above via the auto
    path)."""
    try:
        import google.protobuf  # noqa: F401

        return  # protobuf present: tws path exercised by the auto test
    except ImportError:
        pass
    from data_warehouse_solution_spark.streaming.stateful import user_running_stats_tws

    with pytest.raises(ImportError, match="protobuf"):
        user_running_stats_tws(spark, SF_SMOKE)
