"""DDL/DML surface: the reference's whitelisted statement verbs
(CREATE, INSERT, DROP, TRUNCATE, ALTER, VALUES — ``pipeline.py:110-114``)
executed natively by Spark SQL against managed parquet tables.

DELETE/UPDATE are whitelisted by the reference; since round 4 they
execute for REAL against the copy-on-write snapshot format
(``..cowtable``, driven by ``cow_dml.py`` — file-level rewrite +
atomic manifest commit); ``warehouse_patterns.dml_delete_emulation``
remains as the plain-parquet fallback shape. Everything else
round-trips here.

The demo tables live under /tmp (driver-agnostic writable scratch);
every run drops and recreates them, so the query is idempotent.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import register_views

_SCRATCH = Path(tempfile.gettempdir()) / "dws_ddl_demo"


def _fresh_managed_table(spark: SparkSession, name: str, ddl_cols: str) -> None:
    """DROP + recreate a managed scratch table, also clearing any
    orphaned files from a previous process (the in-memory metastore
    forgets tables across runs but their /tmp files persist)."""
    db_loc = (_SCRATCH / "db").as_posix()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS dws_scratch LOCATION '{db_loc}'")
    spark.sql(f"DROP TABLE IF EXISTS dws_scratch.{name}")
    shutil.rmtree(_SCRATCH / "db" / name, ignore_errors=True)
    spark.sql(f"CREATE TABLE dws_scratch.{name} ({ddl_cols}) USING parquet")


@query(
    "ddl_dml_roundtrip",
    oracle="""
    SELECT status, n FROM (
      SELECT o_orderstatus AS status, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'X' AS status, CAST(0 AS BIGINT) AS n
    ) t
    """,
)
def ddl_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE -> INSERT INTO ... SELECT -> INSERT ... VALUES ->
    SELECT back. Mirrors the reference's CREATE+INSERT load protocol
    (``pipeline.py:226-244``) as native Spark SQL DDL/DML."""
    register_views(spark, sf_dir, ("orders",))
    _fresh_managed_table(spark, "order_summary", "status STRING, n BIGINT")
    spark.sql(
        """
        INSERT INTO dws_scratch.order_summary
        SELECT o_orderstatus AS status, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
        """
    )
    spark.sql("INSERT INTO dws_scratch.order_summary VALUES ('X', 0)")
    return spark.sql("SELECT status, n FROM dws_scratch.order_summary")


@query(
    "ddl_alter_truncate",
    oracle="""
    SELECT r_name AS region_name, CAST(NULL AS VARCHAR) AS zone
    FROM region
    """,
)
def ddl_alter_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMNS + TRUNCATE TABLE + reload: the
    remaining whitelisted verbs. Truncate empties, alter widens the
    schema (old rows read NULL for the new column), reinsert fills."""
    register_views(spark, sf_dir, ("region",))
    # TRUNCATE requires a MANAGED table; manage it inside a scratch-
    # located database so nothing lands in the caller's warehouse dir.
    _fresh_managed_table(spark, "region_copy", "region_name STRING")
    spark.sql("INSERT INTO dws_scratch.region_copy SELECT r_name FROM region")
    spark.sql("TRUNCATE TABLE dws_scratch.region_copy")
    spark.sql("ALTER TABLE dws_scratch.region_copy ADD COLUMNS (zone STRING)")
    spark.sql(
        "INSERT INTO dws_scratch.region_copy SELECT r_name, CAST(NULL AS STRING) FROM region"
    )
    return spark.sql("SELECT region_name, zone FROM dws_scratch.region_copy")
