"""Command-line entry point — the runnable-parity surface for the
reference's ``python pipeline.py`` (``pipeline.py:252-266``), redesigned
declaratively (SURVEY §3.1): no stdin prompts, no import-time side
effects; a JSON job spec replaces the interactive per-file questions
(operator A12) and the engine replaces the Dremio upload.

    python -m data_warehouse_solution_spark ingest --jobs jobs.json \\
        [--database db]
    python -m data_warehouse_solution_spark sql "SELECT ..." [--limit N]
    python -m data_warehouse_solution_spark query q1_pricing_summary \\
        --sf-dir /root/testdata/sf0.001 [--limit N]
    python -m data_warehouse_solution_spark list

``jobs.json`` is a list of ``IngestJob`` field dicts, e.g.::

    [{"path": "https://host/file.csv", "anonymize": true,
      "sensitive_columns": ["name"], "anonymize_mode": "sha256"}]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from pyspark.sql import SparkSession


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_warehouse_solution_spark")
    sub = p.add_subparsers(dest="command", required=True)

    ingest = sub.add_parser("ingest", help="run declarative ingest jobs")
    ingest.add_argument("--jobs", required=True, help="path to jobs JSON file")
    ingest.add_argument("--database", default=None, help="target database (namespace)")
    ingest.add_argument("--max-workers", type=int, default=4)

    sql = sub.add_parser("sql", help="run one whitelisted SQL statement")
    sql.add_argument("statement")
    sql.add_argument("--limit", type=int, default=20)

    query = sub.add_parser("query", help="run a registered query by name")
    query.add_argument("name")
    query.add_argument("--sf-dir", required=True)
    query.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    args = _build_parser().parse_args(argv)

    if args.command == "list":
        # registry import is deferred: `list` needs no Spark session
        from . import operators, streaming  # noqa: F401
        from .registry import all_oracles, all_queries

        oracles = all_oracles()
        for name in sorted(all_queries()):
            marker = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{marker}")
        return 0

    if spark is None:
        from .session import build_session

        spark = build_session()

    if args.command == "ingest":
        from .ingest import IngestJob, ingest_many

        with open(args.jobs, encoding="utf-8") as fh:
            specs = json.load(fh)
        jobs = [IngestJob(**spec) for spec in specs]
        tables = ingest_many(spark, jobs, database=args.database, max_workers=args.max_workers)
        for t in tables:
            print(t)
        return 0

    if args.command == "sql":
        from .sql_gate import run_sql

        df = run_sql(spark, args.statement)
        df.show(args.limit, truncate=False)
        return 0

    if args.command == "query":
        from . import operators, streaming  # noqa: F401
        from .registry import all_queries

        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    return 2  # unreachable: argparse enforces the sub-command set


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
