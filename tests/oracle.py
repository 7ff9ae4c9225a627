"""Local mirror of the driver's DuckDB differential check.

For each registered query: run the Spark callable and the oracle SQL
on the same parquet tables, then compare row count, column names, and
an order-insensitive value multiset.

Crucially this round-trips BOTH sides through pandas — Spark via
``toPandas()`` and DuckDB via ``.df()`` — because that is what the
driver's hasher does. ``fetchall()`` hides dtype divergences that
pandas surfaces: DuckDB's ``SUM`` over integers returns HUGEINT which
lands in pandas as float64 (``3.0``) while Spark returns int64
(``3``); a fetchall-based compare sees equal Python ints and stays
green while the driver's hash diverges (round-2 failures
``sessionize_events`` / ``corpus_curation_pipeline``). Running this
locally at sf0.001/sf0.01 catches parity bugs before the driver's
per-round gate does.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np

from data_warehouse_solution_spark.tables import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _cell(v):
    """Unwrap a pandas cell to plain Python, preserving dtype class.

    np.int64 -> int, np.float64 -> float (so the int-vs-float
    distinction the driver's hash sees survives), ndarray -> list.
    Nulls (None/NaN/NaT) all collapse to None: both engines represent
    SQL NULL the same way within a given pandas dtype, so nulls never
    distinguish them — but a *non-null* int64 3 vs float64 3.0 must.
    """
    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [_cell(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_cell(x) for x in v]
    if isinstance(v, np.generic):
        v = v.item()
    try:
        if v != v:  # NaN / NaT
            return None
    except Exception:
        pass
    return v


def _norm(v):
    """Normalize a cell so equal values hash equal across engines."""
    v = _cell(v)
    if v is None:
        return ("null",)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    if isinstance(v, (_dt.date, _dt.datetime)):
        # DuckDB's .df() widens DATE to a midnight datetime64 while
        # Spark's toPandas keeps datetime.date; the driver treats
        # these as equal (DATE-valued queries pass its hash), so
        # normalize away a bare-midnight time component.
        s = str(v)
        if s.endswith(" 00:00:00"):
            s = s[:-9]
        return ("o", s)
    return ("o", str(v))


def rows_multiset(cols: list[str], rows: list[tuple]) -> dict:
    """Order-insensitive multiset from raw row tuples (collect/
    fetchall path — used by the differential fuzzer, where both sides
    stay in Python objects so dtype widening isn't in play)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for row in rows:
        key = tuple(_norm(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def frame_multiset(pdf) -> dict:
    """Order-insensitive multiset of rows, columns sorted by name."""
    pdf = pdf[sorted(pdf.columns)]
    out: dict = {}
    for row in pdf.itertuples(index=False, name=None):
        key = tuple(_norm(v) for v in row)
        out[key] = out.get(key, 0) + 1
    return out


def _dtype_family(dt) -> str | None:
    """Coarse pandas-dtype family, the granularity the driver's hash
    actually discriminates: int64 3 and float64 3.0 hash differently,
    int64 vs int32 do not. ``object`` returns None (dates, strings,
    arrays, Decimals — value normalization governs those)."""
    s = str(dt)
    if s.startswith(("int", "uint")):
        return "i"
    if s.startswith("float"):
        return "f"
    if s == "bool":
        return "b"
    if s.startswith("datetime64"):
        return "t"
    return None


def compare(spark, sf_dir: str, spark_df, oracle_sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    return compare_pandas(spark_df.toPandas(), sf_dir, oracle_sql)


def compare_pandas(spd, sf_dir: str, oracle_sql: str) -> list[str]:
    """``compare`` with the Spark side already collected to pandas —
    lets a prebuild fixture run the Spark half of many queries with
    overlapped jobs while each test keeps its own DuckDB diff."""
    problems: list[str] = []
    con = duckdb_conn(sf_dir)
    try:
        dpd = con.execute(oracle_sql).df()
    finally:
        con.close()
    s_cols = list(spd.columns)
    d_cols = list(dpd.columns)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    # Explicit schema-dtype parity, not just value parity: for a
    # NON-EMPTY frame a family mismatch always also fails the value
    # multiset (("i", 3) != ("f", "3.0")), but an EMPTY result would
    # sail through on values while the driver's hash still sees the
    # dtype — so the driver could fail a query this harness passed.
    for c in s_cols:
        sf_, df_ = _dtype_family(spd.dtypes[c]), _dtype_family(dpd.dtypes[c])
        if sf_ is not None and df_ is not None and sf_ != df_:
            problems.append(
                f"dtype family differs on '{c}': spark={spd.dtypes[c]} duckdb={dpd.dtypes[c]}"
            )
    if len(spd) != len(dpd):
        problems.append(f"row count differs: spark={len(spd)} duckdb={len(dpd)}")
    sm = frame_multiset(spd)
    dm = frame_multiset(dpd)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        s_dtypes = {c: str(t) for c, t in spd.dtypes.items()}
        d_dtypes = {c: str(t) for c, t in dpd.dtypes.items()}
        problems.append(
            f"value multisets differ; e.g. spark-side {only_s} vs duckdb-side {only_d}"
            f" (dtypes spark={s_dtypes} duckdb={d_dtypes})"
        )
    return problems
