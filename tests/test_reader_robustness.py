"""Reader robustness: corrupt-record policies for CSV/JSON sources —
at 100 TB malformed rows are a certainty, and the mode choice decides
between silent nulls, silent drops, and loud failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_solution_spark.ingest import IngestJob, read_source

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@pytest.fixture
def bad_json(tmp_path):
    p = tmp_path / "rows.json"
    p.write_text(
        '{"id": 1, "amount": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "amount": 20.25}\n'
        '{"id": "also-bad", "amount": []}\n'
    )
    return str(p)


def test_json_permissive_keeps_corrupt_record(spark, bad_json):
    df = spark.read.schema(_SCHEMA).option("mode", "PERMISSIVE").json(bad_json)
    rows = df.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2  # the garbage line and the type-mismatched row
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    assert good == {1, 2}


def test_json_dropmalformed_drops(spark, bad_json):
    schema = T.StructType([f for f in _SCHEMA.fields if f.name != "_corrupt_record"])
    df = spark.read.schema(schema).option("mode", "DROPMALFORMED").json(bad_json)
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_json_failfast_raises(spark, bad_json):
    schema = T.StructType([f for f in _SCHEMA.fields if f.name != "_corrupt_record"])
    df = spark.read.schema(schema).option("mode", "FAILFAST").json(bad_json)
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_csv_permissive_nulls_bad_cells(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,amount\n1,10.5\n2,not-a-number\n3,30.0\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    df = spark.read.schema(schema).option("header", True).csv(str(p))
    rows = {r["id"]: r["amount"] for r in df.collect()}
    assert rows[1] == 10.5
    assert rows[2] is None  # bad cell nulled, row kept
    assert rows[3] == 30.0


def test_ingest_options_passthrough(spark, tmp_path):
    """IngestJob.options reach the reader (e.g. delimiter overrides)."""
    p = tmp_path / "semi.csv"
    p.write_text("id;name\n1;alpha\n2;beta\n")
    df = read_source(
        spark, IngestJob(path=str(p), fmt="csv", options={"delimiter": ";"})
    )
    assert df.columns == ["id", "name"]
    assert df.count() == 2
    assert {r["name"] for r in df.select("name").collect()} == {"alpha", "beta"}
