"""PySpark-native analytics engine with the capabilities of the
offthepier/Data-Warehouse-Solution reference pipeline, re-architected
Spark-first.

The reference (``/root/reference/pipeline.py``) is a CSV -> Dremio ETL
loader that delegates all query execution to a warehouse backend. This
package provides BOTH surfaces natively on Apache Spark:

- the pipeline surface (ingest, validate, anonymize, type-map, load,
  parallel, retry) — see :mod:`.ingest` and :mod:`.anonymize`;
- the analytical warehouse surface the reference assumes its backend
  provides (joins, aggregation, windows, set ops, scalar functions,
  subqueries) — see :mod:`.operators`;
- north-star extensions for LLM-scale data pipelines (dedup,
  similarity search, text analysis, multimodal columns, streaming) —
  see :mod:`.operators` and :mod:`.streaming`.

Everything is DataFrame/SQL-first so Catalyst and Tungsten handle
optimization; Python UDFs appear only where built-ins cannot express
the semantics, and then always as Arrow-batched pandas UDFs.
"""

from .session import build_session, get_session
from .tables import TABLES, load_tables, register_views

__all__ = [
    "build_session",
    "get_session",
    "TABLES",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
