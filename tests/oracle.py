"""Local mirror of the driver's DuckDB differential check.

For each registered query: run the Spark callable and the oracle SQL
on the same parquet tables, then compare row count, column names, and
an order-insensitive value multiset. Running this locally at sf0.001/
sf0.01 catches parity bugs before the driver's per-round gate does.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from data_warehouse_solution_spark.tables import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    """Normalize a cell so equal values hash equal across engines."""
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return ("o", str(v))


def rows_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for row in rows:
        key = tuple(_norm(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark, sf_dir: str, spark_df, oracle_sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_conn(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sm = rows_multiset(s_cols, s_rows)
    dm = rows_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        problems.append(f"value multisets differ; e.g. spark-side {only_s} vs duckdb-side {only_d}")
    return problems
