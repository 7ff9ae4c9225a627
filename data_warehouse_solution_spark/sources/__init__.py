"""Custom Spark data sources (Python Data Source API, Spark 4).

``http_csv`` is the Spark-native re-architecture of the reference's
URL ingest path (``pipeline.py:87-100`` download-with-retry +
``pipeline.py:205`` pandas CSV chunking): one InputPartition per URL,
fetched and parsed ON THE EXECUTORS with the same 3x2s retry policy —
the driver never touches the bytes, so a thousand-file feed scales
with the cluster instead of the reference's 4-thread pool.
"""

from .http_csv import HttpCsvDataSource, register_http_csv

__all__ = ["HttpCsvDataSource", "register_http_csv"]
