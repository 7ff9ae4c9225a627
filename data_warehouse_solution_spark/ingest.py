"""Ingest surface: the reference pipeline's load path re-architected
for Spark (SURVEY §2.A, operators A1-A14).

Reference flow (``pipeline.py:196-249``): stdin URLs → validate →
download-with-retry → pandas 1000-row chunks → optional Fernet →
in-memory SQLite → SQL text → type-name substitution → Dremio REST.

Spark flow: declarative ``IngestJob`` specs → driver-side staged
fetch (retry) for http sources → ``spark.read`` (partitioned scan
replaces manual chunking) → optional anonymize → canonical type cast
(typed ``StructType``, never SQL string surgery) → ``saveAsTable``
(overwrite ≙ the reference's ``if_exists='replace'``,
``pipeline.py:213``). Multi-file parallelism uses a driver thread
pool submitting concurrent Spark jobs into a FAIR scheduler pool —
the cluster-correct analogue of the reference's 4-worker
ThreadPoolExecutor (``pipeline.py:252-264``).
"""

from __future__ import annotations

import logging
import os
import re
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .anonymize import anonymize
from .workdir import scratch_dir

logger = logging.getLogger(__name__)


# --- A2: URL validation (pipeline.py:27-33) -------------------------------
def is_valid_url(url: str) -> bool:
    """http/https with a netloc, nothing else (reference semantics)."""
    try:
        parsed = urlparse(url)
        return parsed.scheme in ("http", "https") and bool(parsed.netloc)
    except (ValueError, AttributeError):
        return False


# --- A6: table-name sanitization (pipeline.py:103-107) --------------------
def sanitize_table_name(file_name: str) -> str:
    """Strip extension, collapse each RUN of non-alphanumerics to one
    '_', strip leading '_' — exact reference parity
    (``pipeline.py:103-107`` uses ``[^A-Za-z0-9]+``, so
    ``'2024 report (final).csv'`` → ``'2024_report_final_'``).

    Path separators are substituted, not split on
    (``'My/File:Name.txt'`` → ``'My_File_Name'``).
    """
    base = re.sub(r"\.[^.]+$", "", file_name)
    return re.sub(r"[^A-Za-z0-9]+", "_", base).lstrip("_")


# --- README parity: non-raw GitHub link rewriting (README.md:71) ----------
_GITHUB_BLOB = re.compile(r"^(https?)://github\.com/([^/]+)/([^/]+)/(?:blob|raw)/(.+)$")


def rewrite_github_url(url: str) -> str:
    """Rewrite a github.com /blob/ (or /raw/) page URL to its
    raw.githubusercontent.com content URL. The reference README
    documents this conversion (``README.md:71``) but the code never
    implemented it; here it is real. Non-GitHub URLs pass through."""
    m = _GITHUB_BLOB.match(url)
    if not m:
        return url
    scheme, owner, repo, rest = m.groups()
    return f"{scheme}://raw.githubusercontent.com/{owner}/{repo}/{rest}"


# --- A3: staged fetch with retry (pipeline.py:87-100) ---------------------
def fetch_with_retry(
    url: str, retries: int = 3, delay: float = 2.0, staging_dir: str | None = None
) -> str:
    """Download a URL to a local staging file, retrying like the
    reference (3 attempts, fixed delay) but raising instead of
    ``exit(1)`` on exhaustion. Spark reads the staged path; task-level
    resilience beyond the fetch is Spark's ``spark.task.maxFailures``.
    """
    if not is_valid_url(url):
        raise ValueError(f"invalid URL: {url!r}")
    url = rewrite_github_url(url)
    staging_dir = staging_dir or scratch_dir("dws_staging_")
    os.makedirs(staging_dir, exist_ok=True)
    dest = os.path.join(staging_dir, os.path.basename(urlparse(url).path) or "download")
    last_err: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            logger.info("Downloading %s (attempt %d/%d)", url, attempt, retries)
            urllib.request.urlretrieve(url, dest)  # noqa: S310 (http[s] enforced above)
            return dest
        except Exception as err:  # noqa: BLE001 (reference retries any failure)
            last_err = err
            logger.error("Download failed (attempt %d/%d): %s", attempt, retries, err)
            if attempt < retries:
                time.sleep(delay)
    raise RuntimeError(f"failed to download {url} after {retries} attempts") from last_err


# --- A8: canonical type mapping (pipeline.py:117-131) ---------------------
# The reference rewrote SQLite type names inside SQL text; here the
# same mapping is a typed cast table applied to the inferred schema.
_CANONICAL_CASTS: dict[type, T.DataType] = {
    T.ByteType: T.LongType(),
    T.ShortType: T.LongType(),
    T.IntegerType: T.LongType(),
    T.FloatType: T.DoubleType(),
}


def canonicalize_schema(df: DataFrame) -> DataFrame:
    """Widen inferred narrow numerics to the engine-canonical types
    (LongType/DoubleType), leaving everything else untouched."""
    for f_ in df.schema.fields:
        target = _CANONICAL_CASTS.get(type(f_.dataType))
        if target is not None:
            df = df.withColumn(f_.name, F.col(f_.name).cast(target))
    return df


# --- A12: declarative job spec (replaces stdin prompts, pipeline.py:186-193)
@dataclass
class IngestJob:
    """One source → one table. The declarative replacement for the
    reference's per-file interactive prompts."""

    path: str  # local path or http(s) URL
    table: str | None = None  # default: sanitized file name
    fmt: str = "csv"  # csv | parquet | json
    anonymize: bool = False
    sensitive_columns: list[str] = field(default_factory=list)
    anonymize_mode: str = "sha256"
    anonymize_key: str | None = None
    mode: str = "overwrite"  # overwrite ≙ reference if_exists='replace'
    options: dict = field(default_factory=dict)

    def resolved_table(self) -> str:
        # the reference derives table names from the FILE name
        # (URL basename), not the full path (pipeline.py:202)
        return self.table or sanitize_table_name(
            os.path.basename(urlparse(self.path).path if is_valid_url(self.path) else self.path)
        )


# --- README parity: XLSX ingestion (README.md:69) --------------------------
# The reference README claims XLSX support but the code only ever calls
# pd.read_csv (pipeline.py:205). Implemented here for real — and with no
# Excel library in the environment, via the file format itself: .xlsx is
# a zip of XML, readable with stdlib zipfile + ElementTree.
_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _xlsx_rows(path: str) -> list[list]:
    """First worksheet of an .xlsx as a list of rows (driver-side
    staging step, like the reference's pandas read — the distributed
    scan happens after re-staging as CSV)."""
    import zipfile
    from xml.etree import ElementTree as ET

    def _si_text(el) -> str:
        return "".join(t.text or "" for t in el.iter(f"{_XLSX_NS}t"))

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            shared = [
                _si_text(si)
                for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter(f"{_XLSX_NS}si")
            ]
        sheets = sorted(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheets:
            raise ValueError(f"no worksheets found in {path!r}")
        root = ET.fromstring(z.read(sheets[0]))
    rows: list[list] = []
    for row_el in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.iter(f"{_XLSX_NS}c"):
            col = 0
            for ch in c.get("r", ""):
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
            col -= 1
            t = c.get("t", "n")
            v = c.find(f"{_XLSX_NS}v")
            if t == "inlineStr":
                is_el = c.find(f"{_XLSX_NS}is")
                val = _si_text(is_el) if is_el is not None else None
            elif v is None or v.text is None:
                val = None
            elif t == "s":
                val = shared[int(v.text)]
            elif t == "b":
                val = v.text.strip() == "1"
            elif t in ("str", "e"):
                val = v.text
            else:  # numeric
                num = float(v.text)
                val = int(num) if num.is_integer() else num
            if col >= 0:
                cells[col] = val
        if cells:
            rows.append([cells.get(i) for i in range(max(cells) + 1)])
    return rows


def _stage_xlsx_as_csv(path: str) -> str:
    """Re-stage the first worksheet as a CSV file so the normal
    header+inferSchema scan (and its type inference) applies."""
    import csv

    rows = _xlsx_rows(path)
    if not rows:
        raise ValueError(f"empty worksheet in {path!r}")
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    out = os.path.join(scratch_dir("dws_xlsx_"), "sheet1.csv")
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        for r in rows[1:]:
            w.writerow([("" if v is None else v) for v in r] + [""] * (len(header) - len(r)))
    return out


def read_source(spark: SparkSession, job: IngestJob) -> DataFrame:
    """Read one source with schema inference + canonical cast (A4+A8)."""
    path = job.path
    if is_valid_url(path):
        path = fetch_with_retry(path)
    fmt = job.fmt
    if fmt in ("xlsx", "excel"):
        path = _stage_xlsx_as_csv(path)
        fmt = "csv"
    reader = spark.read.options(**job.options)
    if fmt == "csv":
        df = reader.option("header", True).option("inferSchema", True).csv(path)
    elif fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "json":
        df = reader.json(path)
    elif fmt == "orc":
        df = reader.orc(path)
    else:
        raise ValueError(f"unsupported format: {job.fmt!r}")
    return canonicalize_schema(df)


def ingest(spark: SparkSession, job: IngestJob, database: str | None = None) -> str:
    """Run one job end-to-end: read → anonymize? → saveAsTable.

    Returns the fully-qualified table name. ``database.table``
    mirrors the reference's two-level ``"source"."table"`` namespace
    (``pipeline.py:235``).
    """
    df = read_source(spark, job)
    if job.anonymize and job.sensitive_columns:
        df = anonymize(
            df, job.sensitive_columns, mode=job.anonymize_mode, key=job.anonymize_key
        )
    table = job.resolved_table()
    if database:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        table = f"{database}.{table}"
    logger.info("Ingesting %s -> %s (mode=%s)", job.path, table, job.mode)
    df.write.mode(job.mode).saveAsTable(table)
    logger.info("Completed processing table %s", table)
    return table


# --- A14: parallel multi-source ingest (pipeline.py:252-264) --------------
def ingest_many(
    spark: SparkSession,
    jobs: list[IngestJob],
    database: str | None = None,
    max_workers: int = 4,
) -> list[str]:
    """Ingest several sources concurrently. Each thread submits an
    independent Spark job; the FAIR scheduler pool shares executors
    between them (driver threads are coordination-only — the heavy
    lifting stays on the cluster). First failure propagates, like the
    reference's ``as_completed().result()`` loop."""
    def run_in_pool(job: IngestJob) -> str:
        # local properties are per-thread and do NOT propagate from the
        # caller under PySpark pinned-thread mode — each worker must
        # join the FAIR pool itself before submitting its Spark job
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "ingest")
        return ingest(spark, job, database)

    results: list[str] = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {pool.submit(run_in_pool, job): job for job in jobs}
        for fut in as_completed(futures):
            results.append(fut.result())  # re-raise worker exceptions
    return results


# --- A9 external-sink variant: JDBC escape hatch ---------------------------
def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    **options: str,
) -> None:
    """External warehouse sink over JDBC — the generic stand-in for
    the reference's Dremio REST upload (``send_sql_command``,
    ``pipeline.py:143-152``): where the reference POSTed batched
    INSERT statements, Spark's JDBC writer streams partitions
    concurrently through the driver's connection pool. Tested against
    embedded Derby (on Spark's classpath); any JDBC-compliant
    warehouse slots in via url/driver."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
