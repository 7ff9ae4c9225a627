"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate at a smaller scale factor so failures
surface locally first. Queries without an oracle get a rows-only
sanity check (runs, stable schema, deterministic across two runs).

r15: the Spark half of all ~250 queries is precomputed by ONE
module-scoped fixture with a small thread pool (guide §2.6 — the
queries are independent, so the next query's jobs back-fill executors
freed by the previous one's tail; this suite was the single most
expensive module in the driver's verify). Streaming/stateful queries
mutate session conf (state-store provider, legacy parquet flags) and
run SERIALLY after the pool. Each test still owns its assertion: a
failed build surfaces in that query's test with the original error.
"""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.operators  # noqa: F401
import data_warehouse_solution_spark.streaming  # noqa: F401
from data_warehouse_solution_spark.registry import _REGISTRY

from .conftest import SF_ORACLE, pin_thread_session
from .oracle import compare_pandas


def _specs():
    return sorted(_REGISTRY.values(), key=lambda s: s.name)


def _is_serial(spec) -> bool:
    # streaming/stateful queries set session confs (state-store
    # provider swap, legacy parquet flags) — never run them inside the
    # pool where another query could observe the mutated session
    return ".streaming." in getattr(spec.fn, "__module__", "")


@pytest.fixture(scope="module")
def spark_results(spark):
    """{name: ("pandas", pdf) | ("rows", (count, columns)) | ("error", exc)}"""
    from concurrent.futures import ThreadPoolExecutor

    def run(spec):
        try:
            pin_thread_session(spark)
            df = spec.fn(spark, SF_ORACLE)
            if spec.oracle is None:
                return spec.name, ("rows", (df.count(), list(df.columns)))
            return spec.name, ("pandas", df.toPandas())
        except Exception as e:  # surfaced by the owning test below
            return spec.name, ("error", e)

    pooled = [s for s in _specs() if not _is_serial(s)]
    serial = [s for s in _specs() if _is_serial(s)]
    out: dict = {}
    with ThreadPoolExecutor(max_workers=10) as pool:
        for name, res in pool.map(run, pooled):
            out[name] = res
    for spec in serial:
        name, res = run(spec)
        out[name] = res
    return out


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, spec, spark_results):
    kind, payload = spark_results[spec.name]
    if kind == "error":
        raise payload
    if spec.oracle is None:
        rows, columns = payload
        assert rows >= 0
        assert columns
        return
    problems = compare_pandas(payload, SF_ORACLE, spec.oracle)
    assert not problems, f"{spec.name}: " + "; ".join(problems)
