"""Custom stateful streaming operator: per-user running profile via
``applyInPandasWithState`` (SURVEY §2.C streaming row — the
user-extensible stateful hook Structured Streaming provides).

The operator keeps (n_events, total_value, last_seen) per user key in
the state store, updates it per micro-batch, and emits the refreshed
profile rows. State is partitioned by key (same shuffle as a groupBy)
and GC'd via the configured timeout — the 100 TB-safe shape for
arbitrary stateful logic that windows/aggregates can't express.

The state function is self-contained (stdlib/pandas imports inside) —
executor workers need nothing from this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .streams import read_events_stream, run_stream_to_memory

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def user_profile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful profile operator over the bounded events
    stream and return the emitted profiles.

    The state function is NESTED so cloudpickle serializes it by
    value — a module-level function would be pickled by reference and
    executor workers (which don't have this package on sys.path)
    would fail to import it.
    """

    def update_profile(key, pdfs, state):
        import datetime as _dt

        import pandas as pd

        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last_us = max(last_us, int(batch_max.value // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [_dt.datetime.utcfromtimestamp(last_us / 1_000_000)],
            }
        )

    stream = read_events_stream(spark, sf_dir)
    profiles = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    return run_stream_to_memory(profiles, "update")


VALUE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, max value): the SAME stateful operator
    semantics on whichever arbitrary-state API the deployment
    supports — ``transformWithStateInPandas`` (state API v2) where its
    protobuf wire dependency is present, else
    ``applyInPandasWithState`` (v1, no extra dependency). Identical
    output schema and results; only the state-store plumbing differs."""
    try:
        import google.protobuf  # noqa: F401

        return user_running_stats_tws(spark, sf_dir)
    except ImportError:
        pass

    def update_stats(key, pdfs, state):
        import pandas as pd

        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["value"].max()
            if pd.notna(batch_max):
                mx = max(mx, float(batch_max))
        state.update((n, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})

    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("mx", T.DoubleType())]
    )
    stream = read_events_stream(spark, sf_dir)
    stats = stream.groupBy("user_id").applyInPandasWithState(
        update_stats,
        outputStructType=VALUE_STATS_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return run_stream_to_memory(stats, "update")


def user_running_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, max value) via the arbitrary-state v2
    API (``transformWithStateInPandas``, Spark 4): ValueState in a
    RocksDB-backed store, updated per micro-batch — the successor API
    to ``applyInPandasWithState`` with typed state variables, timers,
    and TTL support. Same shuffle/state profile: partitioned by key,
    state bounded per user.

    The StatefulProcessor class is defined INSIDE this function so
    cloudpickle ships it by value (executors never import this
    package).

    Environment gate: the state API v2 wire protocol needs
    ``protobuf``, which this container does not ship — the import
    check below fails fast with a clear message instead of a
    mid-stream driver-worker crash. The operator is fully functional
    on any standard Spark 4 deployment (protobuf is a pyspark
    ``connect``/streaming extra)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as err:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf); falling back to "
            "user_profile_stream (applyInPandasWithState) which has no "
            "extra dependency"
        ) from err
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("mx", T.DoubleType())]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, mx = (self._state.get() if self._state.exists() else (0, float("-inf")))
            for pdf in rows:
                n += len(pdf)
                batch_max = pdf["value"].max()
                if pd.notna(batch_max):
                    mx = max(mx, float(batch_max))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        stats = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=VALUE_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        return run_stream_to_memory(stats, "update")
    finally:
        if prev_provider:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_provider)
        else:
            # unset, don't leave the RocksDB override on the shared
            # session — it would silently change the state store for
            # every subsequent streaming query
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
