"""Unit tests for the pipeline surface (ingest/anonymize), including
ports of the reference's own three tests (tests/test_pipeline.py:20-45
in /root/reference) against our equivalents."""

from __future__ import annotations

import time

import pytest

from data_warehouse_solution_spark.anonymize import anonymize
from data_warehouse_solution_spark.ingest import (
    IngestJob,
    canonicalize_schema,
    fetch_with_retry,
    ingest,
    ingest_many,
    is_valid_url,
    read_source,
    sanitize_table_name,
)


# --- ports of the reference's unit tests ----------------------------------
def test_is_valid_url():
    assert is_valid_url("https://example.com")
    assert not is_valid_url("invalid-url")
    assert not is_valid_url("")
    assert not is_valid_url("ftp://example.com")


def test_sanitize_table_name():
    assert sanitize_table_name("Test-File 2020.csv") == "Test_File_2020"
    assert sanitize_table_name("My/File:Name.txt") == "My_File_Name"
    # runs of special characters collapse to ONE underscore (reference
    # uses [^A-Za-z0-9]+ — pipeline.py:106)
    assert sanitize_table_name("2024 report (final).parquet") == "2024_report_final_"


@pytest.mark.parametrize(
    "mode,key",
    [
        ("sha256", None),
        ("fernet", None),
        ("aes", "0" * 16),
        ("aes", b"0" * 32),
        # realistic random key: NOT UTF-8 decodable — must pass through
        # as a bytes literal, never round-trip via str
        ("aes", bytes(range(240, 256)) * 2),
        # non-ASCII but UTF-8-decodable: re-encoding via str would
        # change the byte length (2 bytes/char) — 8 chars == 16 bytes
        ("aes", "é" * 8),
    ],
)
def test_anonymize_changes_sensitive_only(spark, mode, key):
    df = spark.createDataFrame(
        [("John Doe", "Ref1"), ("Jane Doe", "Ref2")], ["Name", "Referee"]
    )
    out = anonymize(df, ["Referee"], mode=mode, key=key)
    rows = {r["Name"]: r["Referee"] for r in out.collect()}
    assert set(rows) == {"John Doe", "Jane Doe"}  # non-sensitive untouched
    assert rows["John Doe"] not in ("Ref1", "Ref2")  # sensitive changed
    assert dict(out.dtypes)["Referee"] == "string"  # always string out


def test_anonymize_missing_column_warns_and_skips(spark, caplog):
    df = spark.createDataFrame([("a",)], ["x"])
    with caplog.at_level("WARNING"):
        out = anonymize(df, ["nope"], mode="sha256")
    assert out.collect() == df.collect()
    assert any("not found" in m for m in caplog.messages)


def test_anonymize_sha256_is_join_preserving(spark):
    df = spark.createDataFrame([("k1", 1), ("k1", 2), ("k2", 3)], ["k", "v"])
    out = anonymize(df, ["k"], mode="sha256")
    assert out.select("k").distinct().count() == 2


def test_anonymize_bad_mode(spark):
    df = spark.createDataFrame([("a",)], ["x"])
    with pytest.raises(ValueError, match="unknown anonymize mode"):
        anonymize(df, ["x"], mode="rot13")
    with pytest.raises(ValueError, match="aes mode requires a key"):
        anonymize(df, ["x"], mode="aes")
    with pytest.raises(ValueError, match="16/24/32 bytes"):
        anonymize(df, ["x"], mode="aes", key=b"short")


# --- fetch-with-retry (A3) ------------------------------------------------
def test_fetch_with_retry_retries_then_succeeds(tmp_path, monkeypatch):
    calls = {"n": 0}

    def flaky(url, dest):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        with open(dest, "w") as fh:
            fh.write("data")

    monkeypatch.setattr("urllib.request.urlretrieve", flaky)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    path = fetch_with_retry("https://example.com/f.csv", staging_dir=str(tmp_path))
    assert calls["n"] == 3
    assert open(path).read() == "data"


def test_fetch_with_retry_exhausts(tmp_path, monkeypatch):
    def always_fail(url, dest):
        raise OSError("down")

    monkeypatch.setattr("urllib.request.urlretrieve", always_fail)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        fetch_with_retry("https://example.com/f.csv", staging_dir=str(tmp_path))


def test_fetch_rejects_invalid_url():
    with pytest.raises(ValueError, match="invalid URL"):
        fetch_with_retry("ftp://example.com/f.csv")


# --- ingest round-trip (A4, A8, A13, A14) ---------------------------------
@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "Sales Data 2024.csv"
    p.write_text(
        "id,name,amount,active,ts\n"
        "1,alpha,10.5,true,2024-01-01T00:00:00\n"
        "2,beta,20.25,false,2024-01-02T12:30:00\n"
    )
    return str(p)


def test_read_source_infers_and_canonicalizes(spark, csv_file):
    df = read_source(spark, IngestJob(path=csv_file, fmt="csv"))
    types = dict(df.dtypes)
    assert types["id"] == "bigint"  # int widened to canonical long
    assert types["amount"] == "double"
    assert types["active"] == "boolean"
    assert types["ts"] == "timestamp"
    assert df.count() == 2


def test_ingest_saves_table_with_sanitized_name(spark, csv_file):
    table = ingest(spark, IngestJob(path=csv_file, fmt="csv"))
    assert table == "Sales_Data_2024"
    assert spark.table(table).count() == 2
    # overwrite semantics (reference if_exists='replace'): re-ingest, same count
    table = ingest(spark, IngestJob(path=csv_file, fmt="csv"))
    assert spark.table(table).count() == 2
    spark.sql(f"DROP TABLE {table}")


def test_ingest_many_parallel(spark, tmp_path):
    jobs = []
    for i in range(3):
        p = tmp_path / f"file_{i}.csv"
        p.write_text("a,b\n1,x\n2,y\n")
        jobs.append(IngestJob(path=str(p), fmt="csv"))
    tables = sorted(ingest_many(spark, jobs, max_workers=3))
    assert tables == ["file_0", "file_1", "file_2"]
    for t in tables:
        assert spark.table(t).count() == 2
        spark.sql(f"DROP TABLE {t}")


def test_ingest_anonymizing_sensitive_column(spark, csv_file):
    job = IngestJob(
        path=csv_file, fmt="csv", anonymize=True, sensitive_columns=["name"], table="anon_demo"
    )
    ingest(spark, job)
    vals = [r["name"] for r in spark.table("anon_demo").collect()]
    assert all(len(v) == 64 for v in vals)  # sha256 hex
    spark.sql("DROP TABLE anon_demo")


def test_canonicalize_noop_on_canonical(spark):
    df = spark.createDataFrame([(1, "a", 1.5)], ["i", "s", "d"])
    assert canonicalize_schema(df).dtypes == df.dtypes


def test_ingest_into_database_namespace(spark, csv_file):
    """Two-level namespace parity: database.table mirrors the
    reference's "source"."table" qualification (pipeline.py:235)."""
    table = ingest(spark, IngestJob(path=csv_file, fmt="csv"), database="dws_stage")
    assert table == "dws_stage.Sales_Data_2024"
    assert spark.table(table).count() == 2
    assert "sales_data_2024" in [
        t.name.lower() for t in spark.catalog.listTables("dws_stage")
    ]
    spark.sql(f"DROP TABLE {table}")


def test_concurrent_queries_shared_session(spark):
    """Four registered queries submitted simultaneously from driver
    threads (the FAIR-pool pattern ingest_many uses) must all complete
    correctly — no cross-query state leakage through the shared
    session."""
    from concurrent.futures import ThreadPoolExecutor

    import data_warehouse_solution_spark.operators  # noqa: F401
    from data_warehouse_solution_spark.registry import all_queries

    from .conftest import SF_ORACLE

    queries = all_queries()
    names = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "dedup_exact_by_key",
        "text_quality_score",
    ]

    def run(name: str) -> int:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "ingest")
        return queries[name](spark, SF_ORACLE).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        counts = list(pool.map(run, names))
    assert all(c > 0 for c in counts), dict(zip(names, counts))


# --- README-parity features the reference documents but never built --------
def test_rewrite_github_url_golden_cases():
    from data_warehouse_solution_spark.ingest import rewrite_github_url

    assert (
        rewrite_github_url("https://github.com/owner/repo/blob/main/data/file.csv")
        == "https://raw.githubusercontent.com/owner/repo/main/data/file.csv"
    )
    assert (
        rewrite_github_url("http://github.com/o/r/raw/v1.2/a.csv")
        == "http://raw.githubusercontent.com/o/r/v1.2/a.csv"
    )
    # already-raw and non-GitHub URLs pass through untouched
    for url in (
        "https://raw.githubusercontent.com/o/r/main/a.csv",
        "https://example.com/data.csv",
        "https://github.com/owner/repo",  # repo page, no blob path
    ):
        assert rewrite_github_url(url) == url


def _write_min_xlsx(path):
    """Hand-build a minimal .xlsx (zip of XML): 2 string cols via
    sharedStrings + inline, one int col, one float col, one empty cell."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = (
        f'<?xml version="1.0"?><sst {ns} count="4" uniqueCount="4">'
        "<si><t>name</t></si><si><t>qty</t></si><si><t>price</t></si>"
        "<si><t>widget</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>7</v></c>'
        '<c r="C2"><v>1.5</v></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>gadget</t></is></c>'
        '<c r="C3"><v>2.25</v></c></row>'
        "</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_source_xlsx(spark, tmp_path):
    """README.md:69 parity: XLSX ingestion (stdlib zip+XML staging,
    then the normal header+inferSchema scan)."""
    p = str(tmp_path / "inventory 2024.xlsx")
    _write_min_xlsx(p)
    df = read_source(spark, IngestJob(path=p, fmt="xlsx"))
    assert df.columns == ["name", "qty", "price"]
    rows = {r["name"]: (r["qty"], r["price"]) for r in df.collect()}
    assert rows == {"widget": (7, 1.5), "gadget": (None, 2.25)}
    # canonical cast applied: ints widened to long, floats to double
    kinds = dict(df.dtypes)
    assert kinds["qty"] == "bigint" and kinds["price"] == "double"


def test_ingest_xlsx_end_to_end(spark, tmp_path):
    p = str(tmp_path / "stock list.xlsx")
    _write_min_xlsx(p)
    table = ingest(spark, IngestJob(path=p, fmt="xlsx"))
    try:
        assert table == "stock_list"
        assert spark.table(table).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
