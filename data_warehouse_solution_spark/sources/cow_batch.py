"""``cow`` — a Spark 4 Python BATCH Data Source reading copy-on-write
snapshot tables, time travel included::

    register_cow_batch(spark)
    df = (spark.read.format("cow")
          .option("tablePath", "/path/to/table")
          .option("versionAsOf", "3")          # or timestampAsOf
          .load())

Completes the format-string surface around the table format: ``cowcdc``
is the STREAMING reader (change feed), ``cowsink`` the STREAMING
writer, this is the BATCH reader — so a DataFrame user never needs the
Python ``cowtable`` API for reads (SQL users have the gate's
``cow.`path``` references). Mirrors ``cowtable.read`` semantics
exactly: the MANIFEST schema is authoritative (columns added by
schema evolution read as NULL from older files), Hive partition
directory values are re-injected typed, ``timestampAsOf`` resolves
to the latest snapshot committed at-or-before the instant
(``committed_at`` stamp; legacy manifests fall back to file mtime),
and merge-on-read entries apply their deletion vector (the entry's
``dv`` positions are masked out inside the partition read — row
position IS the pyarrow read order).

Scale shape: one InputPartition per data file (executors read only
their file via pyarrow — the same parallelism a parquet scan gets);
the driver touches only the manifest. Limits, documented not hidden:
the Python DataSource API gives the reader no pushdown hooks, so
column pruning/predicate pushdown do not reach this scan (use
``cowtable.read`` — a real parquet scan — where that matters);
local-filesystem paths only, like ``cowcdc``/``cowsink``.
"""

from __future__ import annotations


def _build_batch_source_class():
    """Factory: classes close over their deps by value (cloudpickle
    ships them to executor workers where this package is not
    importable — the repo's self-contained-closure rule)."""
    import datetime as _dt
    import json as _json
    import os as _os
    import re as _re
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    _PA_TYPES = {
        "tinyint": "int8",
        "smallint": "int16",
        "int": "int32",
        "bigint": "int64",
        "float": "float32",
        "double": "float64",
        "string": "string",
        "boolean": "bool_",
        "date": "date32",
    }

    _MANIFEST_RE = _re.compile(r"^manifest-(\d{8})\.json$")

    def _local(path):
        return path[7:] if path.startswith("file://") else path.removeprefix("file:")

    def _snapshots(table_path):
        mdir = _os.path.join(_local(table_path), "_manifests")
        if not _os.path.isdir(mdir):
            return []
        return sorted(
            int(m.group(1))
            for n in _os.listdir(mdir)
            if (m := _MANIFEST_RE.match(n))
        )

    def _manifest_path(table_path, n):
        return _os.path.join(_local(table_path), "_manifests", f"manifest-{n:08d}.json")

    def _load_manifest(table_path, n):
        with open(_manifest_path(table_path, n)) as fh:
            m = _json.load(fh)
        if "file_shards" in m:
            files = []
            for name in m["file_shards"]:
                with open(
                    _os.path.join(_local(table_path), "_manifests", name)
                ) as fh:
                    files += _json.load(fh)
            m["files"] = files
        return m

    def _resolve_snapshot(table_path, options):
        snaps = _snapshots(table_path)
        if not snaps:
            raise ValueError(f"no COW table at {table_path}")
        version = options.get("versionasof") or options.get("versionAsOf")
        ts = options.get("timestampasof") or options.get("timestampAsOf")
        if version is not None and ts is not None:
            raise ValueError("pass versionAsOf OR timestampAsOf, not both")
        if version is not None:
            n = int(version)
            if n not in snaps:
                raise ValueError(
                    f"snapshot {n} is not available at {table_path} "
                    "(expired by vacuum, or never committed)"
                )
            return n
        if ts is not None:
            want = _dt.datetime.fromisoformat(ts)
            if want.tzinfo is None:
                want = want.replace(tzinfo=_dt.timezone.utc)
            best = None
            for n in snaps:
                with open(_manifest_path(table_path, n)) as fh:
                    stamp = _json.load(fh).get("committed_at")
                if stamp is not None:
                    at = _dt.datetime.fromisoformat(stamp)
                else:  # legacy manifest: file mtime
                    at = _dt.datetime.fromtimestamp(
                        _os.path.getmtime(_manifest_path(table_path, n)),
                        tz=_dt.timezone.utc,
                    )
                if at <= want:
                    best = n
            if best is None:
                raise ValueError(
                    f"no snapshot at {table_path} is as old as {ts} "
                    "(timestamp precedes the first commit)"
                )
            return best
        return snaps[-1]

    def _table_path(options):
        p = (
            options.get("tablepath")
            or options.get("tablePath")
            or options.get("path")
        )
        if not p:
            raise ValueError("cow batch source requires a path / 'tablePath' option")
        return p

    class FilePartition(InputPartition):
        def __init__(self, data_dir, name, col_names, col_types, dv_path=None, pmap=None):
            self.data_dir = data_dir
            self.name = name
            self.col_names = col_names
            self.col_types = col_types
            self.dv_path = dv_path  # deletion-vector parquet, or None
            self.pmap = pmap or {}  # logical -> physical (renames)

    class CowBatchReader(DataSourceReader):
        def __init__(self, schema, options):
            self.table_path = _table_path(options)
            self.snapshot = _resolve_snapshot(self.table_path, options)
            self.col_names = [f.name for f in schema.fields]
            self.col_types = {f.name: f.dataType.simpleString() for f in schema.fields}

        def partitions(self):
            m = _load_manifest(self.table_path, self.snapshot)
            data_dir = _os.path.join(_local(self.table_path), "data")
            dv_dir = _os.path.join(_local(self.table_path), "_dv")
            pmap = m.get("physical_names") or {}
            return [
                FilePartition(
                    data_dir,
                    f["name"],
                    self.col_names,
                    self.col_types,
                    _os.path.join(dv_dir, f["dv"]["name"]) if f.get("dv") else None,
                    pmap,
                )
                for f in m["files"]
            ]

        def read(self, partition):
            import pandas as pd
            import pyarrow.parquet as pq

            from urllib.parse import unquote as _unq

            def _part_vals(name):
                # Hive col=value/ path segments: the writer strips these
                # columns from the file bytes; re-inject them typed
                out = {}
                for seg in name.split("/")[:-1]:
                    c, sep, v = seg.partition("=")
                    if not sep or c not in partition.col_names:
                        continue
                    v = _unq(v)
                    if v == "__HIVE_DEFAULT_PARTITION__":
                        out[c] = None
                        continue
                    t = partition.col_types.get(c, "")
                    if t in ("int", "bigint", "smallint", "tinyint"):
                        out[c] = int(v)
                    elif t in ("float", "double"):
                        out[c] = float(v)
                    elif t == "date":
                        out[c] = _dt.date.fromisoformat(v)
                    elif t == "timestamp":
                        out[c] = _dt.datetime.fromisoformat(v)
                    elif t == "boolean":
                        out[c] = v.lower() == "true"
                    else:
                        out[c] = v
                return out

            pdf = pq.read_table(
                _os.path.join(partition.data_dir, partition.name)
            ).to_pandas()
            if partition.pmap:
                # column mapping: files store PHYSICAL names; surface
                # the logical ones (mirrors cowtable._read_files)
                pdf = pdf.rename(
                    columns={p: l for l, p in partition.pmap.items()}
                )
            if partition.dv_path is not None:
                # merge-on-read: mask the deletion vector's positions
                # for THIS file (pos = 0-based row index, which is
                # exactly the pyarrow read order)
                import numpy as np
                import pyarrow.compute as pc

                base = partition.name.rsplit("/", 1)[-1]
                dv = pq.read_table(partition.dv_path, columns=["file", "pos"])
                pos = dv.filter(pc.equal(dv["file"], base))["pos"].to_numpy()
                if len(pos):
                    keep = np.ones(len(pdf), dtype=bool)
                    keep[pos.astype(int)] = False
                    pdf = pdf[keep].reset_index(drop=True)
            pvals = _part_vals(partition.name)
            for c in partition.col_names:
                if c in pvals:
                    pdf[c] = pvals[c]
                elif c not in pdf.columns:
                    pdf[c] = None  # schema-evolved older file: NULL
            for tup in pdf[partition.col_names].itertuples(index=False, name=None):
                yield tuple(
                    None
                    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT
                    else (
                        v.to_pydatetime()
                        if isinstance(v, pd.Timestamp)
                        else v.item() if hasattr(v, "item") else v
                    )
                    for v in tup
                )

    class CowStagedFile(WriterCommitMessage):
        def __init__(self, entry):
            self.entry = entry

    class CowBatchWriter(DataSourceWriter):
        """Executor-staged batch append/overwrite: ``write`` stages one
        parquet per partition under ``data/`` (typed by the TABLE
        schema, written under PHYSICAL column names so renamed tables
        stay consistent) and returns the manifest entry; ``commit``
        publishes ONE atomic snapshot via the same exists-checked
        link the streaming sink uses, retrying lost races by
        reloading the head (append conflicts with nothing; a raced
        overwrite keeps last-overwrite-wins semantics)."""

        def __init__(self, table_path, col_names, col_types, pmap, overwrite):
            self.table_path = table_path
            self.col_names = col_names  # logical, table order
            self.col_types = col_types  # logical -> simpleString
            self.pmap = pmap  # logical -> physical
            self.overwrite = overwrite

        def write(self, iterator):
            import pyarrow as pa
            import pyarrow.parquet as pq

            rows = list(iterator)
            if not rows:
                # the batch contract requires a message (unlike the
                # streaming sink); an entry-less one means "no file"
                return CowStagedFile(None)
            phys = [self.pmap.get(c, c) for c in self.col_names]
            cols = {
                p: [r[c] for r in rows]
                for c, p in zip(self.col_names, phys)
            }
            fields = []
            for c, p in zip(self.col_names, phys):
                t = self.col_types[c]
                if t == "timestamp":
                    fields.append(pa.field(p, pa.timestamp("us")))
                elif t in _PA_TYPES:
                    fields.append(pa.field(p, getattr(pa, _PA_TYPES[t])()))
                else:
                    raise ValueError(f"cow writer: unsupported type {t} for {c}")
            table = pa.table(cols, schema=pa.schema(fields))
            name = f"batch-{_uuid.uuid4().hex}.parquet"
            data_dir = _os.path.join(_local(self.table_path), "data")
            _os.makedirs(data_dir, exist_ok=True)
            pq.write_table(table, _os.path.join(data_dir, name))
            stats, nulls = {}, {}
            _STATTED = {
                "tinyint", "smallint", "int", "bigint",
                "float", "double", "string", "date",
            }
            for c, p in zip(self.col_names, phys):
                vals = [v for v in cols[p] if v is not None]
                n_null = len(cols[p]) - len(vals)
                if n_null:
                    nulls[p] = n_null
                if vals and self.col_types[c] in _STATTED:
                    lo, hi = min(vals), max(vals)
                    if hasattr(lo, "isoformat"):
                        lo, hi = lo.isoformat(), hi.isoformat()
                    stats[p] = [lo, hi]
            return CowStagedFile(
                {"name": name, "rows": len(rows), "stats": stats, "nulls": nulls}
            )

        def _drop_staged(self, messages):
            data_dir = _os.path.join(_local(self.table_path), "data")
            for msg in messages:
                if msg is not None and msg.entry is not None:
                    try:
                        _os.remove(_os.path.join(data_dir, msg.entry["name"]))
                    except OSError:
                        pass

        def commit(self, messages):
            import tempfile as _tempfile

            entries = [
                m.entry for m in messages if m is not None and m.entry is not None
            ]
            for _attempt in range(8):
                snaps = _snapshots(self.table_path)
                head = _load_manifest(self.table_path, snaps[-1])
                n = head["snapshot_id"] + 1
                manifest = {
                    k: v
                    for k, v in head.items()
                    if k
                    in (
                        "schema",
                        "partition_by",
                        "bloom_columns",
                        "check_constraints",
                        "write_mode",
                        "physical_names",
                        "used_physical",
                        "txns",
                    )
                }
                manifest.update(
                    {
                        "snapshot_id": n,
                        "parent": head["snapshot_id"],
                        "operation": "overwrite" if self.overwrite else "batch_append",
                        "files": entries if self.overwrite else head["files"] + entries,
                        "committed_at": _dt.datetime.now(
                            _dt.timezone.utc
                        ).isoformat(timespec="microseconds"),
                    }
                )
                mdir = _os.path.join(_local(self.table_path), "_manifests")
                fd, tmp = _tempfile.mkstemp(dir=mdir, suffix=".tmp")
                with _os.fdopen(fd, "w") as fh:
                    _json.dump(manifest, fh)
                try:
                    _os.link(tmp, _manifest_path(self.table_path, n))
                    _os.remove(tmp)
                    return
                except FileExistsError:
                    _os.remove(tmp)  # lost the race: reload head, retry
            self._drop_staged(messages)
            raise RuntimeError(
                f"cow batch write lost {8} commit races at {self.table_path}"
            )

        def abort(self, messages):
            self._drop_staged(messages)

    class CowBatchDataSource(DataSource):
        """``spark.read.format("cow")`` / ``df.write.format("cow")``
        after ``register_cow_batch``."""

        @classmethod
        def name(cls):
            return "cow"

        def schema(self):
            from pyspark.sql.types import StructType

            table_path = _table_path(self.options)
            n = _resolve_snapshot(table_path, self.options)
            m = _load_manifest(table_path, n)
            return StructType.fromJson(_json.loads(m["schema"]))

        def reader(self, schema):
            return CowBatchReader(schema, self.options)

        def writer(self, schema, overwrite):
            table_path = _table_path(self.options)
            snaps = _snapshots(table_path)
            if not snaps:
                raise ValueError(
                    f"no COW table at {table_path} — create it with "
                    "cowtable.create first (the writer appends/overwrites "
                    "an existing table's content, it does not define schema)"
                )
            head = _load_manifest(table_path, snaps[-1])
            unsupported = {
                "partitioned": bool(head.get("partition_by")),
                "bloom-indexed": bool(head.get("bloom_columns")),
                "CHECK-constrained": bool(head.get("check_constraints")),
            }
            bad = [k for k, v in unsupported.items() if v]
            if bad:
                raise ValueError(
                    f"the cow batch writer does not support {'/'.join(bad)} "
                    "tables — use cowtable.append (engine-side staging) there"
                )
            tschema = _json.loads(head["schema"])
            tnames = [f["name"] for f in tschema["fields"]]
            ttypes = {f["name"]: f["type"] for f in tschema["fields"]}
            non_scalar = [c for c, t in ttypes.items() if not isinstance(t, str)]
            if non_scalar:
                raise ValueError(f"cow writer: unsupported nested columns {non_scalar}")
            if sorted(f.name for f in schema.fields) != sorted(tnames):
                raise ValueError(
                    f"cow writer: frame columns {sorted(f.name for f in schema.fields)}"
                    f" != table columns {sorted(tnames)} (cast/rename first)"
                )
            _CANON = {
                "long": "bigint",
                "integer": "int",
                "short": "smallint",
                "byte": "tinyint",
            }
            col_types = {c: _CANON.get(t, t) for c, t in ttypes.items()}
            for f in schema.fields:
                want = col_types[f.name]
                got = _CANON.get(
                    f.dataType.jsonValue() if isinstance(f.dataType.jsonValue(), str) else "",
                    f.dataType.simpleString(),
                )
                if got != want:
                    raise ValueError(
                        f"cow writer: column {f.name} is {got}, table wants "
                        f"{want} (cast first — the batch writer never casts)"
                    )
            return CowBatchWriter(
                table_path,
                tnames,
                col_types,
                head.get("physical_names") or {},
                bool(overwrite),
            )

    return CowBatchDataSource


CowBatchDataSource = _build_batch_source_class()


def register_cow_batch(spark) -> None:
    """Register the batch COW reader on a session (idempotent)."""
    spark.dataSource.register(CowBatchDataSource)
