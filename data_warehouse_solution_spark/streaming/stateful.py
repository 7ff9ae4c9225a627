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
