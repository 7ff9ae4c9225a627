"""Query registry: one named entry per implemented operator.

Each operator registers a Spark callable ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, the equivalent ANSI SQL string a DuckDB
oracle can run over the same parquet tables. ``__spark_entry__``
re-exports these as ``queries()`` / ``oracle_sql()`` for the driver's
differential-correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => not SQL-expressible; rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator under ``name`` with an optional DuckDB oracle.

    Column names of the Spark result and the oracle SQL must match
    exactly — the driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
