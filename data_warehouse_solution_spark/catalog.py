"""Named-table catalog over COW snapshot-table paths.

The reference addresses every warehouse table by a two-level name —
``f'"{source}"."{table_name}"'`` (``pipeline.py:235``) — while this
engine's SQL gate addressed COW tables only by backticked absolute
path (``cow.`/abs/path```). This module completes the SQL-text
ergonomics: ``CREATE TABLE name USING cow LOCATION '/p'`` registers a
durable name -> path mapping, and every gate verb (INSERT / DELETE /
UPDATE / MERGE / ALTER / TRUNCATE / DROP / OPTIMIZE / VACUUM /
RESTORE / DESCRIBE / SELECT-FROM) resolves bare names through it.

Durability mirrors the manifest commit (``cowtable`` module notes):
one JSON entry file per name under the catalog directory, committed
write-temp-then-rename with an existence check — atomic on
HDFS-semantics filesystems, check-then-rename on a local FS. One
file per name (rather than one catalog JSON) means registration is
atomic PER NAME with no read-modify-write race between concurrent
registrations of different names; concurrent registrations of the
SAME name race to a single winner exactly like a manifest commit.

Catalog directory: ``spark.dws.cow.catalogDir`` when set, else
``<spark.sql.warehouse.dir>/_cow_catalog``. Names are one- or
two-level dotted identifiers (the reference's ``source.table``
shape), case-insensitive (stored lowercase) like unquoted SQL
identifiers.

Scale note: the catalog holds table NAMES (thousands at most), not
data — a directory listing of KB-sized JSON files, read driver-side
only. Resolving one name is a single existence check + KB read (no
listing), so hot DML paths (streaming upsert: one statement per
micro-batch) pay O(1) filesystem metadata ops per statement.
"""

from __future__ import annotations

import json
import re
import uuid

from pyspark.sql import SparkSession

from .cowtable import _fs, _jpath, _read_file, _write_file

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")

# entry files are "<name>.json" with dots kept literal — both levels
# of the reference's namespace are identifier-safe characters, so the
# file name round-trips the table name without escaping
_ENTRY_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)\.json$")


def catalog_dir(spark: SparkSession) -> str:
    d = spark.conf.get("spark.dws.cow.catalogDir", None)
    if d:
        return d.rstrip("/")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    return f"{wh.rstrip('/')}/_cow_catalog"


def normalize_name(name: str) -> str:
    """Lowercased, backtick/double-quote-stripped one- or two-level
    identifier; raises for anything path-like (names never contain
    ``/`` — a slash means the caller wanted the path form)."""
    raw = name.strip()
    parts = [p.strip().strip('`"') for p in _split_dots(raw)]
    cand = ".".join(parts)
    if not _NAME_RE.match(cand):
        raise ValueError(
            f"invalid table name {name!r} — use one- or two-level "
            "identifiers (source.table)"
        )
    return cand.lower()


def _split_dots(s: str) -> list[str]:
    """Split on dots OUTSIDE backtick/double-quote runs, so
    ``` `a.b`.c ``` keeps its quoted segment intact."""
    out, cur, q = [], [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in ("`", '"'):
            cur.append(ch)
            q = ch
        elif ch == ".":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def is_name(target: str) -> bool:
    """True when ``target`` is addressable as a catalog name (vs a
    filesystem path / ``cow.`path``` reference)."""
    t = target.strip()
    if t.startswith("cow.`") or t.startswith("`") or "/" in t:
        return False
    try:
        normalize_name(t)
        return True
    except ValueError:
        return False


def _entry_path(spark: SparkSession, name: str) -> str:
    return f"{catalog_dir(spark)}/{name}.json"


def register(
    spark: SparkSession, name: str, path: str, *, replace: bool = False
) -> None:
    """Durably map ``name`` -> ``path``. Refuses an existing name
    unless ``replace`` (CREATE OR REPLACE semantics); the commit is
    a temp-file rename, the manifest pattern."""
    name = normalize_name(name)
    final = _jpath(spark, _entry_path(spark, name))
    fs, _ = _fs(spark, catalog_dir(spark))
    fs.mkdirs(_jpath(spark, catalog_dir(spark)))
    old_payload = None
    if fs.exists(final):
        if not replace:
            raise ValueError(
                f"table name {name!r} is already registered to "
                f"{resolve(spark, name)!r} — DROP TABLE it or use a "
                "different name"
            )
        # replace is delete-then-rename (Hadoop FileSystem.rename
        # refuses an existing destination); keep the OLD entry's
        # bytes so a rename failure in the window restores the
        # prior mapping instead of leaving the name unregistered
        # while the table's files still exist (r10 ADVICE)
        old_payload = _read_file(spark, final.toString())
        fs.delete(final, False)
    payload = json.dumps({"name": name, "path": path}).encode()
    tmp = _jpath(spark, f"{catalog_dir(spark)}/.tmp-{uuid.uuid4().hex}.json")
    _write_file(spark, tmp.toString(), payload)
    if fs.exists(final) or not fs.rename(tmp, final):
        fs.delete(tmp, False)
        if old_payload is not None and not fs.exists(final):
            # best-effort restore of the prior mapping via the same
            # temp-then-rename commit; if a concurrent writer claimed
            # the name meanwhile, their entry wins (final exists)
            rtmp = _jpath(
                spark, f"{catalog_dir(spark)}/.tmp-{uuid.uuid4().hex}.json"
            )
            _write_file(spark, rtmp.toString(), old_payload)
            if not fs.rename(rtmp, final):
                fs.delete(rtmp, False)
        raise ValueError(
            f"table name {name!r} was registered concurrently — retry "
            "with a different name or DROP TABLE first"
        )


def unregister(spark: SparkSession, name: str, *, if_exists: bool = True) -> bool:
    """Remove the mapping (the table's FILES are untouched — dropping
    those is ``cowtable.drop`` on the resolved path)."""
    name = normalize_name(name)
    fs, jp = _fs(spark, _entry_path(spark, name))
    if not fs.exists(jp):
        if if_exists:
            return False
        raise ValueError(f"unknown table name {name!r}")
    fs.delete(jp, False)
    return True


def resolve(spark: SparkSession, name: str) -> str | None:
    """Registered path for ``name`` or None. Never raises for unknown
    names — callers fall through to Spark's own resolution, so native
    catalog tables keep working untouched."""
    try:
        name = normalize_name(name)
    except ValueError:
        return None
    fs, jp = _fs(spark, _entry_path(spark, name))
    if not fs.exists(jp):
        return None
    return json.loads(_read_file(spark, jp.toString()).decode())["path"]


def tables(spark: SparkSession) -> dict[str, str]:
    """All registered name -> path mappings (driver-side directory
    listing of KB-sized entries; bounded by table COUNT, not data)."""
    fs, d = _fs(spark, catalog_dir(spark))
    if not fs.exists(d):
        return {}
    out: dict[str, str] = {}
    for st in fs.listStatus(d):
        fname = st.getPath().getName()
        m = _ENTRY_RE.match(fname)
        if m:
            entry = json.loads(
                _read_file(spark, st.getPath().toString()).decode()
            )
            out[entry["name"]] = entry["path"]
    return dict(sorted(out.items()))


def resolve_or_raise(spark: SparkSession, name: str) -> str:
    p = resolve(spark, name)
    if p is None:
        known = sorted(tables(spark))
        raise ValueError(
            f"unknown table name {name.strip()!r} — registered tables: "
            f"{known if known else '(none)'}"
        )
    return p
