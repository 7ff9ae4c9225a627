"""Subquery surface: scalar / IN / correlated EXISTS subqueries,
derived tables, CTEs, VALUES (SURVEY §2.B "Subqueries" row).

Declared through Spark SQL — subqueries are a SQL-syntax feature;
Catalyst decorrelates EXISTS/IN into semi/anti joins, so the physical
plans are the same join shapes as operators/joins.py and scale the
same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import register_views

_SCALAR_SUBQ = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
"""

_IN_SUBQ = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderstatus = 'F'
"""

_CORR_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > c.c_acctbal * 50)
"""

_CTE = """
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
),
seg_stats AS (
  SELECT c_mktsegment, c_custkey FROM customer
)
SELECT s.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(co.total_spent AS DECIMAL(18,4))) AS DOUBLE) AS seg_revenue,
       CAST(SUM(co.n_orders) AS BIGINT) AS seg_orders
FROM seg_stats s
JOIN cust_orders co ON co.o_custkey = s.c_custkey
GROUP BY s.c_mktsegment
"""

_DERIVED = """
SELECT big.o_custkey, big.max_price
FROM (SELECT o_custkey, MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_custkey) big
WHERE big.max_price > 400000
"""

_VALUES = """
SELECT v.code, v.descr, COUNT(o_orderkey) AS n
FROM (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending')) AS v(code, descr)
LEFT JOIN orders ON o_orderstatus = v.code
GROUP BY v.code, v.descr
"""


def _sql_query(sql: str, needed: tuple[str, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, needed)
        return spark.sql(sql)

    return fn


for _name, _sql, _tables in (
    ("subq_scalar", _SCALAR_SUBQ, ("customer",)),
    ("subq_in", _IN_SUBQ, ("orders", "customer")),
    ("subq_correlated_exists", _CORR_EXISTS, ("customer", "orders")),
    ("subq_cte", _CTE, ("orders", "customer")),
    ("subq_derived_table", _DERIVED, ("orders",)),
    ("sql_values_literal", _VALUES, ("orders",)),
):
    query(_name, oracle=_sql)(_sql_query(_sql, _tables))


@query(
    "join_lateral_topn",
    oracle="""
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c_custkey <= 100
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT (top-2
    orders per customer): the SQL-standard spelling of per-group
    top-k. Catalyst decorrelates it into the same window/rank plan as
    topk_per_group — declared separately so BOTH dialect forms are
    pinned against the oracle."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c_custkey <= 100
        """
    )
