"""APPLY CHANGES — CDC ingestion into COW tables as SCD Type 1
(last-writer-wins upsert) or SCD Type 2 (full version history), the
Delta Live Tables ``APPLY CHANGES INTO`` surface re-expressed over
this engine's native MERGE/append commits.

The reference's pipeline is exactly a CDC-shaped loader (every source
file becomes INSERTs delegated to the warehouse, ``pipeline.py:160-
162``); APPLY CHANGES is what that loader needs the moment the feed
carries updates and deletes rather than append-only rows.

Scale shape: one window over the batch (partitioned by key — a
shuffle of the BATCH, never the table), one key-level MERGE (file
rewrites bounded by the stat-pruned affected set, like every merge),
and one append of new version rows. The table's history never
re-sorts and never rewrites outside the keys the batch touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cowtable as cow
from ..registry import query
from ..tables import load_tables
from ..workdir import scratch_dir


def _with_delete_flag(source: DataFrame, delete_expr: str | None) -> DataFrame:
    flag = (
        F.coalesce(F.expr(delete_expr), F.lit(False))
        if delete_expr
        else F.lit(False)
    )
    return source.withColumn("__is_del", flag)


def _refuse_duplicate_sequences(
    source: DataFrame, keys: list[str], sequence_by: str
) -> None:
    """Two changes for one key with the SAME sequence value have no
    defined order — applying them would pick an arbitrary winner
    (SCD1) or chain versions nondeterministically (SCD2). Refuse
    loudly, like Delta Live Tables."""
    dup = (
        source.groupBy(*keys, sequence_by)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        r = dup[0]
        raise ValueError(
            f"APPLY CHANGES source carries duplicate sequence values "
            f"for a key (e.g. {tuple(r)[:-1]}): order is undefined — "
            f"deduplicate or refine {sequence_by!r}"
        )


def apply_changes_scd1(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    sequence_by: str,
    delete_expr: str | None = None,
) -> dict:
    """Apply one CDC batch as SCD Type 1: per key, the HIGHEST-sequence
    change wins — an upsert if it is a data row, a delete if
    ``delete_expr`` holds on it. The target must carry ``sequence_by``
    as a column (it is the out-of-order guard: a matched row only
    changes when the incoming sequence is >= the stored one, so a
    late-arriving stale batch can never regress the table).

    One window over the BATCH picks each key's latest change (a
    batch-sized shuffle — the table never re-sorts), then one native
    MERGE applies it: delete clause first, update second
    (first-match-wins), inserts only for non-delete rows. File
    rewrites are bounded by the merge's stat-pruned affected set.
    Returns the merge's commit stats."""
    _refuse_duplicate_sequences(source, keys, sequence_by)
    w = Window.partitionBy(*keys).orderBy(F.col(sequence_by).desc())
    latest = (
        _with_delete_flag(source, delete_expr)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    clauses = [
        {
            "when": "matched",
            "and": f"s.__is_del AND s.{sequence_by} >= t.{sequence_by}",
            "then": "delete",
        },
        {
            "when": "matched",
            "and": f"s.{sequence_by} >= t.{sequence_by}",
            "then": "update",
            "set": "*",
        },
        {
            "when": "not_matched",
            "and": "NOT s.__is_del",
            "then": "insert",
            "values": "*",
        },
    ]
    return cow.merge(spark, table_path, latest, keys, clauses)


SCD2_COLS = ("__start_seq", "__end_seq", "__is_current")


def scd2_target_schema(source: DataFrame, keys: list[str], sequence_by: str):
    """The SCD2 history-table frame shape for ``source``: every data
    column except the sequence column, plus (__start_seq, __end_seq,
    __is_current). Pass ``.limit(0)`` of the returned frame to
    ``cowtable.create`` to initialize an empty target."""
    seq_t = dict(zip(source.columns, [f.dataType for f in source.schema.fields]))[
        sequence_by
    ]
    data_cols = [c for c in source.columns if c != sequence_by]
    return source.select(
        *data_cols,
        F.col(sequence_by).alias("__start_seq"),
        F.lit(None).cast(seq_t).alias("__end_seq"),
        F.lit(True).alias("__is_current"),
    )


def apply_changes_scd2(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    sequence_by: str,
    delete_expr: str | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Apply one CDC batch as SCD Type 2: every change becomes a
    VERSION row ``[__start_seq, __end_seq)`` with ``__is_current`` on
    the open one; a delete change closes the key's open version and
    emits nothing. Batches must arrive in sequence order per key —
    ENFORCED: before ANY commit, any key whose open version holds
    ``__start_seq >=`` the batch's first sequence marks the batch
    out-of-order (or a replay without a txn id) and the call refuses
    with the table untouched — those are exactly the rows the close-out
    merge could not close, and appending them would leave two
    ``__is_current`` rows for the key. Replays WITH a txn id
    short-circuit to a no-op via the table's txn map.

    Two commits: (1) a key-level MERGE closes each touched key's open
    version at the batch's first sequence for that key — one row per
    key on the source side, so the merge's ambiguity guard never
    fires and rewrites stay bounded by the affected files; (2) an
    append of the batch's chained version rows (``lead(seq)`` inside
    the batch fills intra-batch ``__end_seq``; the last change stays
    open). Pass ``txn_app_id``/``txn_version`` so a crashed-and-retried
    batch can never append its versions twice (the close-out merge is
    idempotent by the guard; the append replays through the engine's
    txn map). Returns ``{"closed": merge_stats, "appended":
    append_stats}``."""
    if txn_app_id is not None and txn_version is not None:
        # a batch the txn map already recorded is a pure replay: skip
        # the (guarded no-op) close-out AND the stale-batch refusal
        # below — the refusal exists for corruption, not for the
        # crashed-and-retried path that exactly-once is FOR
        seen = cow.last_txn_version(spark, table_path, txn_app_id)
        if seen is not None and seen >= int(txn_version):
            replay = {
                "snapshot_id": cow.current_snapshot(spark, table_path),
                "files_rewritten": 0,
                "files_written": 0,
                "replayed": True,
            }
            return {"closed": dict(replay), "appended": dict(replay)}
    src = _with_delete_flag(source, delete_expr)
    wv = Window.partitionBy(*keys).orderBy(F.col(sequence_by).asc())
    data_cols = [c for c in source.columns if c != sequence_by]
    versions = (
        src.withColumn("__end_seq", F.lead(sequence_by).over(wv))
        .filter(~F.col("__is_del"))
        .select(
            *data_cols,
            F.col(sequence_by).alias("__start_seq"),
            F.col("__end_seq"),
            F.col("__end_seq").isNull().alias("__is_current"),
        )
    )
    # r14 (guide §1.2, fewer passes): the duplicate-sequence refusal
    # rides the firsts aggregation instead of its own scan+shuffle —
    # per key, count(*) > count(DISTINCT seq) iff some sequence value
    # repeats for that key (exactly _refuse_duplicate_sequences's
    # groupBy(keys, seq) HAVING count>1, one pass earlier). The flag
    # is folded into the bounds collect below; only the REFUSAL path
    # pays a second job to name an offending key.
    n_seq_groups = F.countDistinct(F.col(sequence_by)) + F.when(
        F.sum(F.col(sequence_by).isNull().cast("int")) > 0, F.lit(1)
    ).otherwise(F.lit(0))  # countDistinct skips NULLs; groupBy didn't
    firsts = src.groupBy(*keys).agg(
        F.min(sequence_by).alias("__first_seq"),
        (F.count(F.lit(1)) > n_seq_groups).alias("__has_dup"),
    ).cache()
    try:
        return _apply_scd2_batch(
            spark, table_path, firsts, versions, keys,
            txn_app_id, txn_version,
        )
    finally:
        firsts.unpersist()


def _apply_scd2_batch(
    spark: SparkSession,
    table_path: str,
    firsts: DataFrame,
    versions: DataFrame,
    keys: list[str],
    txn_app_id: str | None,
    txn_version: int | None,
) -> dict:
    # in-order enforcement, checked BEFORE the close-out merge commits
    # anything: an open version with __start_seq >= this batch's first
    # sequence for the key means the batch is out-of-order or a replay
    # without a txn id — these are exactly the rows the close-out merge
    # would NOT close (its guard requires __first_seq > __start_seq),
    # so the condition is identical pre-merge, and refusing here leaves
    # the table untouched (no committed half-applied close-out for the
    # batch's in-order keys). Appending out-of-order versions would
    # leave TWO __is_current rows for the key (silent history
    # corruption). Cost: one stat-pruned scan of open versions bounded
    # to the batch's key range (min/max per key column — one 1-row
    # collect) joined to the batch-sized ``firsts`` broadcast
    # (cached by the caller, unpersisted in its finally).
    bounds = firsts.agg(
        *[F.min(k).alias(f"__lo_{k}") for k in keys],
        *[F.max(k).alias(f"__hi_{k}") for k in keys],
        F.max(F.col("__has_dup").cast("int")).alias("__any_dup"),
    ).collect()[0]
    if bounds["__any_dup"]:
        # refusal path only: one extra job to NAME an offending key —
        # the happy path paid a single fused collect
        r = (
            firsts.filter(F.col("__has_dup"))
            .select(*keys, "__first_seq")
            .limit(1)
            .collect()[0]
        )
        raise ValueError(
            f"APPLY CHANGES source carries duplicate sequence values "
            f"for a key (e.g. {tuple(r[k] for k in keys)}): order is "
            f"undefined — deduplicate or refine the sequence column"
        )
    firsts = firsts.select(*keys, "__first_seq")  # drop the dup flag
    # fused probe (r14, guide §1.2/§2.4): ONE stat-pruned scan of the
    # candidate files decides BOTH (a) which files the close-out merge
    # must rewrite (any key match — exactly merge's own probe) and
    # (b) whether any open version makes the batch out-of-order (an
    # open __start_seq >= the key's batch-first sequence — exactly the
    # former separate open-rows scan). The verdicts ride one job; the
    # merge then skips its key-range and probe jobs via _probed
    # (sound: firsts is groupBy(keys)-unique, so merge's ambiguity
    # guard can never fire, and the snapshot is re-checked inside).
    snap = cow.current_snapshot(spark, table_path)
    m = cow._load_manifest(spark, table_path, snap)
    # the SAME candidate pruning + scan merge itself would run — one
    # shared definition (cow._key_candidates) so the _probed contract
    # cannot silently diverge from merge's own probe semantics
    _, _, base_to_name, cur = cow._key_candidates(
        spark, table_path, m, keys, bounds
    )
    affected: set[str] = set()
    any_stale = False
    if cur is not None:
        probe = (
            cur.join(F.broadcast(firsts), keys)
            .groupBy("_cow_file")
            .agg(
                F.max(
                    (
                        F.col("__is_current")
                        & (F.col("__start_seq") >= F.col("__first_seq"))
                    ).cast("int")
                ).alias("__stale")
            )
            .collect()
        )
        affected = {base_to_name[r["_cow_file"]] for r in probe}
        any_stale = any(r["__stale"] for r in probe)
    if any_stale:
        # refusal path only: one extra job to NAME an offending key —
        # the happy path paid the single fused probe
        r = (
            cow.read(spark, table_path)
            .filter(F.col("__is_current"))
            .join(F.broadcast(firsts), keys)
            .filter(F.col("__start_seq") >= F.col("__first_seq"))
            .select(*keys, "__start_seq", "__first_seq")
            .limit(1)
            .collect()[0]
        )
        raise ValueError(
            f"APPLY CHANGES SCD2 batch is out of order for key "
            f"{tuple(r[k] for k in keys)}: the table already holds an "
            f"open version at __start_seq={r['__start_seq']!r} >= the "
            f"batch's first sequence {r['__first_seq']!r}. Batches must "
            "apply in per-key sequence order; pass txn_app_id/"
            "txn_version for exactly-once retries"
        )
    closed = cow.merge(
        spark,
        table_path,
        firsts,
        keys,
        [
            {
                "when": "matched",
                "and": "t.__is_current AND s.__first_seq > t.__start_seq",
                "then": "update",
                "set": {"__end_seq": "s.__first_seq", "__is_current": "false"},
            }
        ],
        _probed={"snapshot_id": snap, "key_range": bounds, "affected": affected},
    )
    appended = cow.append(
        spark,
        table_path,
        versions,
        txn_app_id=txn_app_id,
        txn_version=txn_version,
    )
    return {"closed": closed, "appended": appended}


_SCD1_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, event_type, value,
         event_type = 'error' AS is_del
  FROM events
),
last AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC
  ) AS rn
  FROM c
)
SELECT user_id, event_id, event_type, value
FROM last WHERE rn = 1 AND NOT is_del
"""


@query("scd1_apply_changes", oracle=_SCD1_ORACLE)
def scd1_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES as SCD Type 1 over the events feed: each event is
    a change to its user's profile row, ordered by event_id;
    ``event_type = 'error'`` rows are DELETES. The feed applies in two
    sequential batches (split at the median event_id) — the end state
    must equal the closed form "last change per user wins; absent if
    the last change is a delete", which is exactly what the DuckDB
    oracle computes with one window. In-query: the second batch's
    merge runs against the first batch's committed table, so the
    out-of-order guard (s.seq >= t.seq) and the delete-then-reinsert
    path are both exercised for real."""
    import shutil

    from ..sql_gate import run_sql

    path = scratch_dir("dws_scd1_")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "user_id", "event_id", "event_type", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    # r13: the CDC path is SQL-only like every other verb — the DLT
    # statement form drives operators/scd.py; the absent target is
    # materialized by the gate from the source shape
    for batch in (ev.filter(F.col("event_id") <= mid), ev.filter(F.col("event_id") > mid)):
        batch.createOrReplaceTempView("dws_scd1_batch")
        run_sql(
            spark,
            f"APPLY CHANGES INTO cow.`{path}` FROM dws_scd1_batch "
            "KEYS (user_id) APPLY AS DELETE WHEN event_type = 'error' "
            "SEQUENCE BY event_id",
        )
    return cow.read(spark, path)


_SCD2_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, event_type, value,
         event_type = 'error' AS is_del
  FROM events
),
v AS (
  SELECT *, lead(event_id) OVER (
    PARTITION BY user_id ORDER BY event_id
  ) AS end_seq
  FROM c
)
SELECT user_id, event_type, value,
       event_id AS __start_seq,
       end_seq AS __end_seq,
       (end_seq IS NULL) AS __is_current
FROM v WHERE NOT is_del
"""


@query("scd2_apply_changes", oracle=_SCD2_ORACLE)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES as SCD Type 2 over the events feed: every change
    becomes a version row [__start_seq, __end_seq) and a delete closes
    its key's open version without emitting one. Applied in two
    sequential batches, the assembled history must equal the one-window
    closed form (lead(event_id) per user) the DuckDB oracle computes —
    which pins the cross-batch chaining: a version left OPEN by batch 1
    is closed by batch 2's first change for that user at exactly the
    lead() sequence. The txn-id replay map makes the version append of
    each batch exactly-once under retries."""
    import shutil

    from ..sql_gate import run_sql

    path = scratch_dir("dws_scd2_")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "user_id", "event_id", "event_type", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    # r13: driven through the DLT statement form (SQL-only CDC path);
    # the gate materializes the SCD2 history frame for the absent
    # target. Batch 1 exercises auto-create; batch 2 the cross-batch
    # close-out chaining and the in-order guard.
    for batch in (
        ev.filter(F.col("event_id") <= mid), ev.filter(F.col("event_id") > mid)
    ):
        batch.createOrReplaceTempView("dws_scd2_batch")
        run_sql(
            spark,
            f"APPLY CHANGES INTO cow.`{path}` FROM dws_scd2_batch "
            "KEYS (user_id) APPLY AS DELETE WHEN event_type = 'error' "
            "SEQUENCE BY event_id STORED AS SCD TYPE 2",
        )
    return cow.read(spark, path)
