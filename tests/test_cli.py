"""CLI surface tests: the runnable parity layer for the reference's
``python pipeline.py`` entry point, driven in-process with the shared
test session."""

from __future__ import annotations

import json

import pytest

from data_warehouse_solution_spark.cli import main

from .conftest import SF_SMOKE


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out
    assert "dedup_simhash\trows-only" in out


def test_cli_query_runs_registered_query(spark, capsys):
    assert main(["query", "q1_pricing_summary", "--sf-dir", SF_SMOKE], spark=spark) == 0
    assert "sum_qty" in capsys.readouterr().out


def test_cli_query_unknown_name(spark, capsys):
    assert main(["query", "nope", "--sf-dir", SF_SMOKE], spark=spark) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_sql_whitelist(spark, capsys):
    assert main(["sql", "SELECT 1 AS one"], spark=spark) == 0
    assert "one" in capsys.readouterr().out
    with pytest.raises(ValueError, match="not in the allowed set"):
        main(["sql", "SET spark.foo=1"], spark=spark)


def test_cli_ingest_jobs_file(spark, tmp_path, capsys):
    csv = tmp_path / "People File 2020.csv"
    csv.write_text("name,score\nada,1\ngrace,2\n")
    jobs = [
        {
            "path": str(csv),
            "anonymize": True,
            "sensitive_columns": ["name"],
            "anonymize_mode": "sha256",
        }
    ]
    spec = tmp_path / "jobs.json"
    spec.write_text(json.dumps(jobs))
    assert main(["ingest", "--jobs", str(spec)], spark=spark) == 0
    table = capsys.readouterr().out.strip()
    assert table == "People_File_2020"
    rows = spark.table(table).collect()
    assert {r["score"] for r in rows} == {1, 2}
    assert all(r["name"] not in ("ada", "grace") for r in rows)  # anonymized
    spark.sql(f"DROP TABLE {table}")
