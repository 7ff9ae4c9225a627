"""End-to-end test of the ``httpcsv`` Python Data Source against a
real local HTTP server: partition-per-URL parallel fetch, typed and
inferred schemas, retry-on-transient-failure, and parity with the
reference's URL-ingest semantics."""

from __future__ import annotations

import http.server
import threading

import pytest

from data_warehouse_solution_spark.sources import register_http_csv

CSV_A = "name,value\nalpha,1.5\nbeta,2.5\n"
CSV_B = "name,value\ngamma,3.5\n"


class _Handler(http.server.BaseHTTPRequestHandler):
    # first request to /flaky.csv fails; the retry must succeed
    flaky_hits = {"n": 0}

    def do_GET(self):  # noqa: N802 (http.server API)
        body = None
        if self.path == "/a.csv":
            body = CSV_A
        elif self.path == "/b.csv":
            body = CSV_B
        elif self.path == "/flaky.csv":
            _Handler.flaky_hits["n"] += 1
            if _Handler.flaky_hits["n"] == 1:
                self.send_error(503)
                return
            body = CSV_A
        if body is None:
            self.send_error(404)
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/csv")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_httpcsv_typed_schema_multi_url(spark, http_base):
    register_http_csv(spark)
    df = (
        spark.read.format("httpcsv")
        .option("urls", f"{http_base}/a.csv\n{http_base}/b.csv")
        .schema("name string, value double")
        .load()
    )
    rows = {(r["name"], r["value"]) for r in df.collect()}
    assert rows == {("alpha", 1.5), ("beta", 2.5), ("gamma", 3.5)}
    # one input partition per URL — the parallelism contract
    assert df.rdd.getNumPartitions() == 2


def test_httpcsv_inferred_schema(spark, http_base):
    register_http_csv(spark)
    df = spark.read.format("httpcsv").option("urls", f"{http_base}/a.csv").load()
    assert df.columns == ["name", "value"]
    assert dict(df.dtypes) == {"name": "string", "value": "string"}
    assert df.count() == 2


def test_httpcsv_retries_transient_failure(spark, http_base):
    register_http_csv(spark)
    _Handler.flaky_hits["n"] = 0
    df = (
        spark.read.format("httpcsv")
        .option("urls", f"{http_base}/flaky.csv")
        .schema("name string, value double")
        .load()
    )
    assert df.count() == 2
    assert _Handler.flaky_hits["n"] >= 2  # first attempt 503'd, retry succeeded


def test_httpcsv_missing_urls_errors(spark):
    register_http_csv(spark)
    with pytest.raises(Exception, match="urls"):
        spark.read.format("httpcsv").schema("a string").load().collect()
