"""Shared executor-side COW staging for the DSv2 writers.

The ``cow`` batch writer and the ``cowsink`` stream writer stage rows
identically — per-task CHECK validation, partition grouping into
Hive-dir parquet files, typed min==max partition stats, manifest
blooms — differing only in the staged file-name prefix and their
commit protocols. This module holds that staging ONCE, as nested
closures (unimportable qualnames, so cloudpickle ships them BY VALUE
into executor workers — the same rule as ``_closure_hash``), removing
the copy the r7 self-review flagged.
"""

from __future__ import annotations

from ._closure_hash import make_bloom_fns, make_murmur_fns

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

# Spark's JSON schema (StructType.jsonValue) spells the integral types
# 'long'/'integer'/'short'/'byte' while simpleString (and everything
# the engine writes into manifests) says 'bigint'/'int'/'smallint'/
# 'tinyint'. The probes receive tschema["fields"] straight from the
# JSON form, so _pa_type_of must understand BOTH spellings — otherwise
# integer columns silently vanish from the DuckDB probe relation and
# any generated/CHECK expression referencing them is falsely refused
# at planning ("Referenced column not found").
_SPARK_JSON_CANON = {
    "long": "bigint",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
}

_STATTED = {
    # the types engine staging emits stats for (cowtable._STATS_TYPES).
    # Timestamps (r12) serialize to the CANONICAL form cowtable._canon_ts
    # emits — UTC-naive, space-separated, fixed 6-digit fraction — so
    # both staging paths' stats compare identically in _file_may_match
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz",
}

_INTS = {"tinyint", "smallint", "int", "bigint"}


def _canon_dt(v):
    """datetime -> the canonical timestamp-stat string (mirrors
    cowtable._canon_ts: UTC-naive, space-separated, fixed 6-digit
    fraction — the width is what keeps binary order == time order)."""
    import datetime as _dtm

    if v.tzinfo is not None:
        v = v.astimezone(_dtm.timezone.utc).replace(tzinfo=None)
    return v.isoformat(sep=" ", timespec="microseconds")

_PART_TYPES = ("tinyint", "smallint", "int", "bigint", "string", "date")


def make_staging_fns():
    """(arrow_schema, validate_rows, stage_groups) closures.

    ``arrow_schema(cols, col_types, pmap)`` — pyarrow schema under
    physical (or logical, pmap={}) names.
    ``validate_rows(rows, col_names, col_types, checks, label)`` —
    DuckDB-ANSI CHECK evaluation over the task's rows under LOGICAL
    names, BEFORE any byte lands; NULL passes (the SQL three-valued
    rule, matching cowtable._validate_constraints).
    ``stage_groups(rows, cfg)`` — group by partition values (and, on
    bucketed tables, the row's bucket id — Spark-Murmur3 parity via
    the shared ``make_murmur_fns`` closures, null keys folded like
    Spark's hash: a null child leaves the seed chain unchanged),
    write one Hive-dir parquet per group (bucket id as the ``_000NN``
    file-name suffix, rows sorted by the within-bucket sort spec),
    return engine-identical manifest entries. cfg keys: col_names,
    col_types (logical->simpleString), pmap, partition_by,
    bloom_columns, data_dir, prefix, bucket (None or
    {columns, buckets, sort_by}).
    ``probe_checks(fields, checks, label)`` — planning-time DuckDB
    parse probe (nested too: writer()/streamWriter() also run in
    spawned workers where this module is unimportable).
    ``probe_generated(fields, generated, label)`` — planning-time
    probe of generated-column expressions: each must DuckDB-parse
    against the non-generated columns AND produce the column's
    declared type exactly; anything else refuses with a pointer to
    the engine path (r8 punch-list #5 — previously the writers
    refused ALL generated-column tables).
    ``apply_generated_rows(rows, col_names, col_types, generated,
    label)`` — executor-side recompute of every generated column over
    the task's rows via DuckDB (order-pinned by an injected rowid),
    values cast to the declared type, OVERWRITING whatever the frame
    carried — the engine's ``_apply_generated`` invariant ("a
    generated column IS its expression") re-established in the
    pyarrow staging path. Dialect caveat, documented at the writer
    surface: the probe guarantees parse + type parity, not value
    parity for every conceivable expression — arithmetic/CASE/concat/
    date-part expressions agree between the engines; an expression
    with engine-specific value semantics belongs on the engine path.
    """
    _, _, bloom_build = make_bloom_fns()
    _hash_literal, _ = make_murmur_fns()

    def bucket_id_of(vals, btypes, nb):
        """pmod(hash(cols), n) over one row's bucket-key values —
        Spark's HashPartitioning.partitionIdExpression. A NULL value
        leaves the hash chain unchanged (Murmur3Hash.eval's null
        rule); unsupported literal shapes return None and the caller
        refuses the write (planning already vets the column types,
        so this only fires on type drift)."""
        h = 42
        for v, t in zip(vals, btypes):
            if v is None:
                continue
            h = _hash_literal(v, t, h)
            if h is None:
                return None
        signed = h - (1 << 32) if h >= (1 << 31) else h
        return signed % nb

    def _pa_type_of(t):
        """simpleString -> pyarrow type (None = unsupported). Covers
        the scalar warehouse types incl. decimal(p,s) — the canonical
        money type — which Spark's parquet reader round-trips from
        pyarrow's decimal128 exactly."""
        import re as _re

        import pyarrow as pa

        t = _SPARK_JSON_CANON.get(t, t)
        if t == "timestamp":
            return pa.timestamp("us")
        if t in _PA_TYPES:
            return getattr(pa, _PA_TYPES[t])()
        dm = _re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t or "")
        if dm and int(dm.group(1)) <= 38:
            return pa.decimal128(int(dm.group(1)), int(dm.group(2)))
        return None

    def arrow_schema(cols, col_types, pmap):
        import pyarrow as pa

        fields = []
        for c in cols:
            p = pmap.get(c, c)
            pt = _pa_type_of(col_types[c])
            if pt is None:
                raise ValueError(
                    f"cow staging: unsupported type {col_types[c]} for {c}"
                )
            fields.append(pa.field(p, pt))
        return pa.schema(fields)

    def validate_rows(rows, col_names, col_types, checks, label):
        if not checks:
            return
        import duckdb as _duck
        import pyarrow as pa

        t = pa.table(
            {c: [r[c] for r in rows] for c in col_names},
            schema=arrow_schema(col_names, col_types, {}),
        )
        con = _duck.connect()
        con.register("__w", t)
        bad = {}
        for name, expr in sorted(checks.items()):
            n = con.execute(
                f"SELECT count(*) FROM __w WHERE NOT ({expr})"
            ).fetchone()[0]
            if n:
                bad[name] = int(n)
        if bad:
            raise ValueError(
                f"{label}: CHECK constraint(s) violated (name: rows): {bad}"
            )

    def stage_groups(rows, cfg):
        import os as _os
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from urllib.parse import quote as _quote

        col_names = cfg["col_names"]
        col_types = cfg["col_types"]
        pmap = cfg["pmap"]
        partition_by = cfg["partition_by"]
        bloom_columns = cfg["bloom_columns"]
        data_dir = cfg["data_dir"]
        prefix = cfg["prefix"]
        bucket = cfg.get("bucket")
        bcols = list(bucket["columns"]) if bucket else []
        btypes = [col_types[c] for c in bcols]
        nb = int(bucket["buckets"]) if bucket else 0
        bsort = list(bucket.get("sort_by") or []) if bucket else []
        groups = {}
        for r in rows:
            key = tuple(r[c] for c in partition_by)
            if bucket:
                b = bucket_id_of([r[c] for c in bcols], btypes, nb)
                if b is None:
                    raise ValueError(
                        "cow staging: bucket key value not hashable "
                        f"({[r[c] for c in bcols]!r}) — type drift?"
                    )
                key = key + (b,)
            groups.setdefault(key, []).append(r)
        data_cols = [c for c in col_names if c not in partition_by]
        schema = arrow_schema(data_cols, col_types, pmap)
        entries = []
        for key, grp in sorted(
            groups.items(), key=lambda kv: tuple(map(str, kv[0]))
        ):
            pvals, b_id = (key[:-1], key[-1]) if bucket else (key, None)
            if bsort:
                # within-bucket sort spec: row order survives into the
                # file (nulls first ascending, Spark's default)
                grp = sorted(
                    grp,
                    key=lambda r: tuple(
                        (r[c] is not None, r[c]) for c in bsort
                    ),
                )
            cols = {pmap.get(c, c): [r[c] for r in grp] for c in data_cols}
            table = pa.table(cols, schema=schema)
            segs = []
            for c, v in zip(partition_by, pvals):
                raw = (
                    "__HIVE_DEFAULT_PARTITION__"
                    if v is None
                    else (v.isoformat() if hasattr(v, "isoformat") else str(v))
                )
                segs.append(f"{c}={_quote(raw, safe='')}")
            suffix = f"_{b_id:05d}" if b_id is not None else ""
            base = f"{prefix}-{_uuid.uuid4().hex}{suffix}.parquet"
            name = "/".join(segs + [base])
            _os.makedirs(
                _os.path.join(data_dir, *segs) if segs else data_dir,
                exist_ok=True,
            )
            pq.write_table(table, _os.path.join(data_dir, *segs, base))
            stats, nulls, blooms = {}, {}, {}
            for c in data_cols:
                p = pmap.get(c, c)  # stats keyed physical, like staging
                vals = [v for v in cols[p] if v is not None]
                n_null = len(cols[p]) - len(vals)
                if n_null:
                    nulls[p] = n_null
                t = col_types[c]
                if vals and t in _STATTED:
                    lo, hi = min(vals), max(vals)
                    if t in ("timestamp", "timestamp_ntz"):
                        lo, hi = _canon_dt(lo), _canon_dt(hi)
                    elif hasattr(lo, "isoformat"):  # date -> ISO
                        lo, hi = lo.isoformat(), hi.isoformat()
                    stats[p] = [lo, hi]
                if vals and c in bloom_columns and t in _INTS | {"string"}:
                    bl = bloom_build(
                        [v if isinstance(v, str) else str(v) for v in vals]
                    )
                    if bl is not None:
                        blooms[p] = bl
            entry = {
                "name": name,
                "rows": len(grp),
                "stats": stats,
                "nulls": nulls,
            }
            if b_id is not None:
                entry["bucket"] = b_id
            if partition_by:
                part = {}
                for c, v in zip(partition_by, pvals):
                    if v is None:
                        part[c] = "__HIVE_DEFAULT_PARTITION__"
                        nulls[c] = len(grp)
                        continue
                    raw = v.isoformat() if hasattr(v, "isoformat") else str(v)
                    part[c] = raw
                    t = col_types[c]
                    # min == max == the value, typed like the engine
                    if t in ("timestamp", "timestamp_ntz"):
                        sv: object = _canon_dt(v)
                    elif t in _INTS:
                        sv = int(raw)
                    else:
                        sv = raw
                    stats[c] = [sv, sv]
                entry["partition"] = part
            if blooms:
                entry["blooms"] = blooms
            entries.append(entry)
        return entries

    def probe_checks(tschema_fields, checks, label):
        """Planning-time (driver) DuckDB parse probe of every CHECK
        expression against an empty typed relation — a non-portable
        (Spark-only) expression fails the job/query upfront with a
        pointer to the engine path, never per executor task."""
        if not checks:
            return
        import duckdb as _duck
        import pyarrow as pa

        probe_fields = []
        for f in tschema_fields:
            t = f["type"]
            pt = _pa_type_of(t) if isinstance(t, str) else None
            if pt is not None:
                probe_fields.append(pa.field(f["name"], pt))
        con = _duck.connect()
        con.register(
            "__w",
            pa.table(
                {f.name: [] for f in probe_fields},
                schema=pa.schema(probe_fields),
            ),
        )
        for cname, expr in sorted(checks.items()):
            try:
                con.execute(f"SELECT count(*) FROM __w WHERE NOT ({expr})")
            except Exception as e:
                raise ValueError(
                    f"{label}: CHECK constraint {cname}: {expr!r} is not "
                    f"portable ANSI SQL (DuckDB-evaluated in this path: {e}) "
                    "— use the engine path (cowtable.append)"
                ) from None

    def _pa_simple(pa_type):
        """pyarrow type -> Spark simpleString (None = unsupported)."""
        import pyarrow as pa

        if pa.types.is_int8(pa_type):
            return "tinyint"
        if pa.types.is_int16(pa_type):
            return "smallint"
        if pa.types.is_int32(pa_type):
            return "int"
        if pa.types.is_int64(pa_type):
            return "bigint"
        if pa.types.is_float32(pa_type):
            return "float"
        if pa.types.is_float64(pa_type):
            return "double"
        if pa.types.is_string(pa_type) or pa.types.is_large_string(pa_type):
            return "string"
        if pa.types.is_boolean(pa_type):
            return "boolean"
        if pa.types.is_date(pa_type):
            return "date"
        if pa.types.is_timestamp(pa_type):
            return "timestamp"
        if pa.types.is_decimal(pa_type):
            return f"decimal({pa_type.precision},{pa_type.scale})"
        return None

    def probe_generated(tschema_fields, generated, label):
        """Planning-time (driver) probe: every generated expression
        must (a) DuckDB-parse against an empty typed relation of the
        NON-generated columns and (b) produce EXACTLY the declared
        column type — so `length(s)` (int in Spark, bigint in DuckDB)
        refuses upfront instead of staging drifted bytes. Failure
        points at the engine path, which is Spark-exact by
        construction."""
        if not generated:
            return
        import duckdb as _duck
        import pyarrow as pa

        declared = {}
        probe_fields = []
        for f in tschema_fields:
            t = f["type"]
            declared[f["name"]] = t if isinstance(t, str) else None
            if f["name"] in generated:
                continue
            pt = _pa_type_of(t) if isinstance(t, str) else None
            if pt is not None:
                probe_fields.append(pa.field(f["name"], pt))
        con = _duck.connect()
        con.register(
            "__w",
            pa.table(
                {f.name: [] for f in probe_fields},
                schema=pa.schema(probe_fields),
            ),
        )
        canon = _SPARK_JSON_CANON
        for col, expr in sorted(generated.items()):
            try:
                got = con.execute(
                    f"SELECT ({expr}) AS __g FROM __w"
                ).arrow().schema[0].type
            except Exception as e:
                raise ValueError(
                    f"{label}: generated column {col}: {expr!r} is not "
                    f"portable ANSI SQL (DuckDB-evaluated in this path: {e}) "
                    "— use the engine path (cowtable.append)"
                ) from None
            want = canon.get(declared.get(col), declared.get(col))
            have = _pa_simple(got)
            if have != want:
                raise ValueError(
                    f"{label}: generated column {col}: {expr!r} evaluates "
                    f"to {have or got} here but the table declares {want} "
                    "— the engines' type rules differ for this expression; "
                    "use the engine path (cowtable.append)"
                )

    def apply_generated_rows(rows, col_names, col_types, generated, label):
        """Recompute every generated column over the task's rows
        (DuckDB over an Arrow batch of the non-generated columns,
        order pinned by an injected rowid), returning new row dicts
        with the generated values OVERWRITTEN — mirror of the
        engine's ``_apply_generated``. Values are cast to the
        declared type; a cast overflow fails the task before any
        byte lands."""
        if not generated or not rows:
            return rows
        import duckdb as _duck
        import pyarrow as pa

        base_cols = [c for c in col_names if c not in generated]
        t = pa.table(
            {
                "__rid": list(range(len(rows))),
                **{c: [r[c] for r in rows] for c in base_cols},
            },
            schema=pa.schema(
                [pa.field("__rid", pa.int64())]
                + list(arrow_schema(base_cols, col_types, {}))
            ),
        )
        con = _duck.connect()
        con.register("__w", t)
        sel = ", ".join(
            f"({expr}) AS {col}" for col, expr in sorted(generated.items())
        )
        out = con.execute(
            f"SELECT {sel} FROM __w ORDER BY __rid"
        ).arrow()
        new_rows = [dict(r) for r in rows]
        for col in sorted(generated):
            vals = out.column(col).cast(
                arrow_schema([col], col_types, {}).field(0).type
            ).to_pylist()
            for r, v in zip(new_rows, vals):
                r[col] = v
        return new_rows

    return (
        arrow_schema,
        validate_rows,
        stage_groups,
        probe_checks,
        probe_generated,
        apply_generated_rows,
    )
