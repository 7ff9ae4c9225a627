"""Copy-on-write snapshot table format: real DELETE / UPDATE / MERGE.

The reference whitelists DELETE and UPDATE verbs (``pipeline.py:
110-114`` in /root/reference) but delegates their execution to its
warehouse backend; plain parquet can only emulate them by rewriting
the whole table (``warehouse_patterns.dml_delete_emulation``). This
module closes that gap with the same design every transactional lake
format uses (Iceberg/Delta COW mode), built from primitives already
in the environment — no extra jars:

- A table is a directory: immutable parquet **data files** plus a
  ``_manifests/`` log of JSON **snapshots**. Snapshot N lists exactly
  the data files that make up the table at version N.
- DML never mutates a file. DELETE/UPDATE/MERGE (1) find the data
  files that actually contain affected rows, (2) rewrite ONLY those
  files, (3) commit snapshot N+1 = (untouched files) + (rewritten
  files). Readers of snapshot <= N never see a partial write, and
  old snapshots remain readable (time travel) until ``vacuum``.
- Commit is a write-temp-then-rename of the manifest with an
  existence check: atomic on HDFS-semantics filesystems (rename onto
  an existing path fails there); on a local FS the check-then-rename
  pair has a small race window — same caveat as
  ``incremental.refresh_daily_revenue``, documented rather than
  hidden. Losers of a concurrent commit raise
  ``CowConcurrentWrite`` (optimistic concurrency).

Affected-file selection runs AS a Spark job over the hidden
``_metadata.file_path`` column with the DML predicate: Catalyst
prunes to the predicate's columns and parquet row-group stats skip
non-matching stripes, so the scan reads predicate columns of
candidate files only — the executable analogue of manifest-level
min/max pruning (which real formats use to avoid the scan entirely;
per-file row counts are kept in the manifest, adding column stats is
mechanical). At 100 TB the rewrite cost is proportional to the
affected files, not the table — the entire point of COW.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class CowConcurrentWrite(RuntimeError):
    """Another writer committed the same snapshot number first."""


class CowTableNotFound(RuntimeError):
    pass


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _write_file(spark: SparkSession, path: str, payload: bytes) -> None:
    fs, jp = _fs(spark, path)
    out = fs.create(jp, True)
    out.write(payload)
    out.close()


def _read_file(spark: SparkSession, path: str) -> bytes:
    fs, jp = _fs(spark, path)
    stream = fs.open(jp)
    data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    stream.close()
    return bytes(data)


def _manifest_path(table_path: str, n: int) -> str:
    return f"{table_path}/{MANIFEST_DIR}/manifest-{n:08d}.json"


def _list_snapshots(spark: SparkSession, table_path: str) -> list[int]:
    fs, _ = _fs(spark, table_path)
    mdir = _jpath(spark, f"{table_path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-") : -len(".json")]))
    return sorted(out)


def _load_manifest(spark: SparkSession, table_path: str, n: int) -> dict:
    return json.loads(_read_file(spark, _manifest_path(table_path, n)).decode())


def _commit(spark: SparkSession, table_path: str, manifest: dict) -> int:
    """Optimistic commit of snapshot ``manifest['snapshot_id']``."""
    n = manifest["snapshot_id"]
    fs, _ = _fs(spark, table_path)
    final = _jpath(spark, _manifest_path(table_path, n))
    if fs.exists(final):
        raise CowConcurrentWrite(f"snapshot {n} already committed at {table_path}")
    tmp = _jpath(spark, f"{table_path}/{MANIFEST_DIR}/.tmp-{uuid.uuid4().hex}.json")
    _write_file(spark, tmp.toString(), json.dumps(manifest).encode())
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise CowConcurrentWrite(f"snapshot {n} commit lost the race at {table_path}")
    return n


def _stage_files(spark: SparkSession, table_path: str, df: DataFrame, snap: int) -> list[dict]:
    """Write ``df`` as new immutable data files and return their
    manifest entries (name + row count). Files land in ``data/`` with
    snapshot-scoped unique names; the staging dir is removed."""
    fs, _ = _fs(spark, table_path)
    staging = f"{table_path}/_staging-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(staging)
    data_dir = _jpath(spark, f"{table_path}/{DATA_DIR}")
    fs.mkdirs(data_dir)
    entries = []
    moved = []
    for st in fs.listStatus(_jpath(spark, staging)):
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        new_name = f"snap{snap:08d}-{uuid.uuid4().hex[:12]}.parquet"
        if not fs.rename(st.getPath(), _jpath(spark, f"{table_path}/{DATA_DIR}/{new_name}")):
            raise IOError(f"failed to move staged file {name}")
        moved.append(new_name)
    if moved:
        counts = (
            spark.read.parquet(*[f"{table_path}/{DATA_DIR}/{m}" for m in moved])
            .groupBy(F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("f"))
            .count()
            .collect()
        )
        by_name = {r["f"]: r["count"] for r in counts}
        entries = [{"name": m, "rows": by_name.get(m, 0)} for m in moved]
    fs.delete(_jpath(spark, staging), True)
    return entries


def current_snapshot(spark: SparkSession, table_path: str) -> int:
    snaps = _list_snapshots(spark, table_path)
    if not snaps:
        raise CowTableNotFound(table_path)
    return snaps[-1]


def create(spark: SparkSession, table_path: str, df: DataFrame) -> int:
    """Create the table at ``table_path`` from ``df`` (snapshot 1)."""
    if _list_snapshots(spark, table_path):
        raise ValueError(f"table already exists at {table_path}")
    files = _stage_files(spark, table_path, df, 1)
    manifest = {
        "snapshot_id": 1,
        "parent": None,
        "operation": "create",
        "schema": df.schema.json(),
        "files": files,
    }
    return _commit(spark, table_path, manifest)


def read(spark: SparkSession, table_path: str, snapshot: int | None = None) -> DataFrame:
    """The table's content at ``snapshot`` (default: latest) — plain
    DataFrame over exactly that snapshot's immutable files."""
    n = snapshot if snapshot is not None else current_snapshot(spark, table_path)
    m = _load_manifest(spark, table_path, n)
    if not m["files"]:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(m["schema"])))
    return spark.read.parquet(
        *[f"{table_path}/{DATA_DIR}/{f['name']}" for f in m["files"]]
    )


def history(spark: SparkSession, table_path: str) -> list[dict]:
    """One dict per snapshot: id, operation, file count, row count."""
    out = []
    for n in _list_snapshots(spark, table_path):
        m = _load_manifest(spark, table_path, n)
        out.append(
            {
                "snapshot_id": n,
                "operation": m["operation"],
                "n_files": len(m["files"]),
                "n_rows": sum(f["rows"] for f in m["files"]),
            }
        )
    return out


def _affected_files(spark: SparkSession, table_path: str, m: dict, cond) -> set[str]:
    """Basenames of data files containing >=1 row matching ``cond`` —
    a column-pruned predicate scan over _metadata.file_path (parquet
    footer stats skip clean row groups engine-side)."""
    if not m["files"]:
        return set()
    cur = spark.read.parquet(*[f"{table_path}/{DATA_DIR}/{f['name']}" for f in m["files"]])
    rows = (
        cur.withColumn("_f", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1))
        .filter(cond)
        .select("_f")
        .distinct()
        .collect()
    )
    return {r["_f"] for r in rows}


def _rewrite_commit(
    spark: SparkSession,
    table_path: str,
    m: dict,
    affected: set[str],
    rewritten: DataFrame | None,
    appended: DataFrame | None,
    operation: str,
) -> dict:
    """Snapshot N+1 = (files - affected) + rewrite(affected) +
    appended. Returns commit stats."""
    snap = m["snapshot_id"] + 1
    new_entries: list[dict] = []
    if rewritten is not None:
        new_entries += _stage_files(spark, table_path, rewritten, snap)
    if appended is not None:
        new_entries += _stage_files(spark, table_path, appended, snap)
    untouched = [f for f in m["files"] if f["name"] not in affected]
    manifest = {
        "snapshot_id": snap,
        "parent": m["snapshot_id"],
        "operation": operation,
        "schema": m["schema"],
        "files": untouched + new_entries,
    }
    _commit(spark, table_path, manifest)
    return {
        "snapshot_id": snap,
        "files_rewritten": len(affected),
        "files_untouched": len(untouched),
        "files_written": len(new_entries),
    }


def delete(spark: SparkSession, table_path: str, condition: str) -> dict:
    """DELETE FROM table WHERE condition — rewrites only the files
    that contain matching rows."""
    m = _load_manifest(spark, table_path, current_snapshot(spark, table_path))
    cond = F.expr(condition)
    affected = _affected_files(spark, table_path, m, cond)
    if not affected:
        return {"snapshot_id": m["snapshot_id"], "files_rewritten": 0,
                "files_untouched": len(m["files"]), "files_written": 0}
    survivors = spark.read.parquet(
        *[f"{table_path}/{DATA_DIR}/{n}" for n in sorted(affected)]
    ).filter(~cond)
    return _rewrite_commit(spark, table_path, m, affected, survivors, None, "delete")


def update(
    spark: SparkSession, table_path: str, condition: str, assignments: dict[str, str]
) -> dict:
    """UPDATE table SET col = expr, ... WHERE condition — rewrites
    only the files that contain matching rows; non-matching rows in
    those files are carried over unchanged."""
    m = _load_manifest(spark, table_path, current_snapshot(spark, table_path))
    cond = F.expr(condition)
    affected = _affected_files(spark, table_path, m, cond)
    if not affected:
        return {"snapshot_id": m["snapshot_id"], "files_rewritten": 0,
                "files_untouched": len(m["files"]), "files_written": 0}
    aff_df = spark.read.parquet(*[f"{table_path}/{DATA_DIR}/{n}" for n in sorted(affected)])
    cols = [
        F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
        if c in assignments
        else F.col(c)
        for c in aff_df.columns
    ]
    return _rewrite_commit(spark, table_path, m, affected, aff_df.select(*cols), None, "update")


def merge_upsert(
    spark: SparkSession, table_path: str, source: DataFrame, keys: list[str]
) -> dict:
    """MERGE: rows whose key matches a source row are REPLACED by the
    source row; unmatched source rows are APPENDED. Only files that
    contain a matching key rewrite (files without matches cannot hold
    a replaced row, so they are untouched by construction)."""
    from .plans import maybe_broadcast

    m = _load_manifest(spark, table_path, current_snapshot(spark, table_path))
    src_keys = maybe_broadcast(source.select(*keys).distinct())
    cur_files = [f"{table_path}/{DATA_DIR}/{f['name']}" for f in m["files"]]
    affected: set[str] = set()
    if cur_files:
        cur = spark.read.parquet(*cur_files)
        rows = (
            cur.withColumn("_f", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1))
            .join(src_keys, keys, "left_semi")
            .select("_f")
            .distinct()
            .collect()
        )
        affected = {r["_f"] for r in rows}
    kept = None
    if affected:
        kept = spark.read.parquet(
            *[f"{table_path}/{DATA_DIR}/{n}" for n in sorted(affected)]
        ).join(src_keys, keys, "left_anti")
    out_cols = json.loads(m["schema"])["fields"]
    ordered = [f["name"] for f in out_cols]
    return _rewrite_commit(
        spark, table_path, m, affected, kept, source.select(*ordered), "merge"
    )


def vacuum(spark: SparkSession, table_path: str) -> int:
    """Delete data files not referenced by the LATEST snapshot.
    Earlier snapshots stop being readable — the standard
    retention-expiry trade; run it only once time travel to them is
    no longer needed. Returns the number of files removed."""
    m = _load_manifest(spark, table_path, current_snapshot(spark, table_path))
    referenced = {f["name"] for f in m["files"]}
    fs, _ = _fs(spark, table_path)
    ddir = _jpath(spark, f"{table_path}/{DATA_DIR}")
    removed = 0
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            if name.endswith(".parquet") and name not in referenced:
                fs.delete(st.getPath(), False)
                removed += 1
    return removed
