"""Custom Spark data sources (Python Data Source API, Spark 4).

``http_csv`` is the Spark-native re-architecture of the reference's
URL ingest path (``pipeline.py:87-100`` download-with-retry +
``pipeline.py:205`` pandas CSV chunking): one InputPartition per URL,
fetched and parsed ON THE EXECUTORS with the same 3x2s retry policy —
the driver never touches the bytes, so a thousand-file feed scales
with the cluster instead of the reference's 4-thread pool.
"""

import threading
import weakref

_REGISTER_LOCK = threading.Lock()
_REGISTERED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def register_once(spark, name: str, do) -> None:
    """Run a data-source registration exactly once per session,
    serialized. ``spark.dataSource.register`` swaps the registry entry
    non-atomically, so two threads registering the same source — e.g.
    a thread pool building independent queries that each call their
    ``register_*`` helper — can leave a window where a concurrent
    ``.format(name)`` resolution fails with dataSourceNotFoundError.
    The lock removes the window; the per-session memo keeps repeated
    registration (every query calls it defensively) free."""
    with _REGISTER_LOCK:
        done = _REGISTERED.get(spark)
        if done is None:
            done = set()
            _REGISTERED[spark] = done
        if name in done:
            return
        do()
        done.add(name)


from .http_csv import HttpCsvDataSource, register_http_csv  # noqa: E402

__all__ = ["HttpCsvDataSource", "register_http_csv", "register_once"]
