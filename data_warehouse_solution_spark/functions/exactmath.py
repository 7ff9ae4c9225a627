"""Engine-invariant exact arithmetic for differential testing.

Multi-row float reductions (SUM/AVG over double) are order-dependent,
so Spark and a DuckDB oracle can disagree in the last ulps and fail a
value-hash comparison. The fix is to make every multi-row reduction
exact: cast inputs to DECIMAL (the fixtures carry at most 2 fractional
digits — money, discounts, taxes), reduce exactly, and only then cast
the result to DOUBLE (decimal->double conversion is correctly rounded
in both engines, so the final bits are identical).

Per-row double arithmetic needs no such care: IEEE ops are
deterministic and both engines read identical parquet doubles.

This mirrors how a production warehouse handles money anyway —
the reference's type map exposes DECIMAL for exactly this reason
(``pipeline.py:117-131`` maps SQLite DECIMAL -> Dremio DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(18,2)"


def dec(col: str | Column, scale: int = 2) -> Column:
    """Cast a column to an exact decimal wide enough for fixture data."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def one_minus(col: str | Column) -> Column:
    """(1 - x) as exact decimal — e.g. the TPC-H discount factor."""
    return F.lit(1).cast(DEC2) - dec(col)


def one_plus(col: str | Column) -> Column:
    """(1 + x) as exact decimal — e.g. the TPC-H tax factor."""
    return F.lit(1).cast(DEC2) + dec(col)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as a bit-stable double."""
    return F.sum(col).cast("double").alias(alias)
