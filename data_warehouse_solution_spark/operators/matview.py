"""Incremental materialized-view maintenance driven by the COW
change feed.

The classic warehouse pattern the reference's Dremio backend provides
as "reflections": keep an aggregate table current WITHOUT recomputing
it from the facts. Here the base table is a ``cowtable`` snapshot
table, the delta source is its Change Data Feed (``cowtable.changes``
— file-diff-scoped, O(changed rows)), and maintenance is a signed
delta-aggregate merged into the stored view:

    insert row  -> +1 count, +value sum
    delete row  -> -1 count, -value sum
    update      -> delete(old image) + insert(new image), so the pair
                   nets the value difference

The registered query applies append + DELETE + UPDATE to the base
table, maintains the view purely from the CDC rows, and returns the
maintained view. The DuckDB oracle computes the aggregate from the
FINAL table state relationally — value-hash equality proves
incremental maintenance == full recompute (the MV invariant).

100 TB shape: maintenance cost is O(changed rows) + a join against
the (tiny, group-cardinality) view — never a fact-table scan. SUM/
COUNT (and any abelian-group aggregate) maintain exactly this way;
MIN/MAX would need the standard re-aggregation fallback on deletes.
All money sums are exact DECIMAL per the repo's differential-testing
convention (``functions/exactmath.py``).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cowtable as cow
from ..functions.exactmath import dec
from ..registry import query
from ..tables import load_tables
from ..workdir import scratch_dir

_MV_DELETE = "o_orderpriority = '3-MEDIUM' AND o_totalprice < 100000"
_MV_UPDATE = "o_orderkey % 11 = 0"
_MV_BUMP = "o_totalprice + 10.0"
_MV_APPENDED = [
    (-301, "9-EXPRESS", 111.25),
    (-302, "9-EXPRESS", 222.75),
    (-303, "1-URGENT", 333.5),
]


# One built table per sf_dir (the ANN-trainer memo pattern): every
# consumer — the two batch matviews, the streaming maintenance query,
# the SQL time-travel query — only READS the table after the build
# (change feed + time travel), so the whole family shares it and
# repeated audit sweeps stop accreting orders-sized /tmp parquet.
_MUTATED: dict[str, tuple[str, int]] = {}


def build_mutated_orders_table(
    spark: SparkSession, sf_dir: str, prefix: str
) -> tuple[str, int]:
    """The shared DML script every matview query maintains against:
    COW table from orders(key, priority, price), then append three
    rows (incl. a brand-new priority group) -> DELETE -> UPDATE.
    Returns (table_path, pre-DML snapshot id). The oracles mirror
    exactly this sequence relationally. Memoized per sf_dir (callers
    are read-only post-build) and swept at process exit."""
    if sf_dir in _MUTATED:
        return _MUTATED[sf_dir]
    path = scratch_dir(prefix)
    shutil.rmtree(path, ignore_errors=True)
    o = (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartition(4)
    )
    s0 = cow.create(spark, path, o)
    cow.append(
        spark,
        path,
        spark.createDataFrame(
            _MV_APPENDED,
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        ),
    )
    cow.delete(spark, path, _MV_DELETE)
    cow.update(spark, path, _MV_UPDATE, {"o_totalprice": _MV_BUMP})
    _MUTATED[sf_dir] = (path, s0)
    return path, s0


def maintain_view(view: DataFrame, changes: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Apply CDC rows to a stored (group, n_orders, price_sum) view:
    signed delta-aggregate + full-outer merge. Groups whose count
    reaches zero drop out; new groups appear."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        changes.select(
            F.col(group_col),
            sign.alias("sgn"),
            (sign.cast("decimal(18,2)") * dec(val_col)).alias("sv"),
        )
        .groupBy(group_col)
        .agg(F.sum("sgn").alias("d_n"), F.sum("sv").alias("d_sum"))
    )
    zero = F.lit(0).cast("decimal(28,2)")
    return (
        view.join(delta, group_col, "full_outer")
        .select(
            F.col(group_col),
            (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n_orders"
            ),
            (
                F.coalesce(F.col("price_sum").cast("decimal(28,2)"), zero)
                + F.coalesce(F.col("d_sum").cast("decimal(28,2)"), zero)
            ).alias("price_sum"),
        )
        .filter(F.col("n_orders") > 0)
    )


_MV_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
),
appended AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(-301 AS BIGINT), '9-EXPRESS', 111.25),
    (CAST(-302 AS BIGINT), '9-EXPRESS', 222.75),
    (CAST(-303 AS BIGINT), '1-URGENT', 333.5)
  ) v(o_orderkey, o_orderpriority, o_totalprice)
),
d AS (SELECT * FROM appended WHERE NOT ({_MV_DELETE})),
u AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN {_MV_UPDATE} THEN {_MV_BUMP} ELSE o_totalprice END AS o_totalprice
  FROM d
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM u GROUP BY 1
"""


@query("matview_incremental_cdc", oracle=_MV_ORACLE)
def matview_incremental_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain an aggregate view of a COW table through append +
    DELETE + UPDATE using ONLY the change feed — the view is never
    recomputed from the base table. The oracle aggregates the final
    state directly; equality proves the incremental-maintenance
    invariant end-to-end (including the update's delete+insert image
    pairing in ``cowtable.changes``)."""
    path, s0 = build_mutated_orders_table(spark, sf_dir, "dws_mv_")
    # the stored view, materialized at s0 via time travel
    # (decimal-exact sum); checkpoint pins it as stored state
    view0 = (
        cow.read(spark, path, snapshot=s0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("price_sum"),
        )
        .localCheckpoint(eager=True)
    )
    ch = cow.changes(spark, path, from_snapshot=s0)
    maintained = maintain_view(view0, ch, "o_orderpriority", "o_totalprice")
    # materialize the (group-cardinality) result, then free the stored
    # view's checkpoint blocks — a long session running the query
    # repeatedly must not accrete pinned snapshots (r14 review)
    from ..plans import free_local_checkpoints, materialize_and_release

    out = materialize_and_release(
        maintained.select(
            "o_orderpriority",
            "n_orders",
            F.col("price_sum").cast("double").alias("total_price"),
        )
    )
    free_local_checkpoints(view0)
    return out


def maintain_view_minmax(
    view: DataFrame,
    changes: DataFrame,
    base: DataFrame,
    group_col: str,
    val_col: str,
) -> DataFrame:
    """Maintain a (group, n_orders, min_v, max_v) view from CDC rows.

    COUNT maintains with signed deltas like :func:`maintain_view`;
    MIN/MAX are NOT delta-maintainable under deletes (removing the
    current extreme says nothing about the runner-up), so the
    standard partial-recompute split applies:

    - groups whose deletes never touch the stored extreme (and all
      insert-only groups) merge cheaply: ``least``/``greatest``
      against the insert extremes — zero base-table access;
    - groups where a deleted value ties-or-beats the stored extreme
      (or with no stored row at all) re-aggregate from the base
      table, SCOPED to those groups by a semi-join — on a
      group-partitioned 100 TB base that is partition-pruned to the
      affected groups, never a full scan.
    """
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    ins = F.when(F.col("_change_type") == "insert", F.col(val_col))
    dele = F.when(F.col("_change_type") == "delete", F.col(val_col))
    delta = (
        changes.select(F.col(group_col), sign.alias("sgn"), ins.alias("iv"), dele.alias("dv"))
        .groupBy(group_col)
        .agg(
            F.sum("sgn").alias("d_n"),
            F.min("iv").alias("ins_min"),
            F.max("iv").alias("ins_max"),
            F.min("dv").alias("del_min"),
            F.max("dv").alias("del_max"),
        )
    )
    joined = (
        view.join(delta, group_col, "full_outer")
        .withColumn(
            "needs_recompute",
            (
                F.col("min_v").isNull()  # no stored row: unknown extremes
                | (F.col("del_min").isNotNull() & (F.col("del_min") <= F.col("min_v")))
                | (F.col("del_max").isNotNull() & (F.col("del_max") >= F.col("max_v")))
            ),
        )
        # r14: both output branches read `joined`; materialize the
        # group-cardinality join once so the CDF delta subtree is not
        # evaluated twice in one plan (see maintain_aggregates)
        .localCheckpoint(eager=True)
    )
    cheap = joined.filter(~F.col("needs_recompute")).select(
        F.col(group_col),
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n_orders"),
        F.least(F.col("min_v"), F.col("ins_min")).alias("min_v"),
        F.greatest(F.col("max_v"), F.col("ins_max")).alias("max_v"),
    ).filter(F.col("n_orders") > 0)
    hot_groups = joined.filter(F.col("needs_recompute")).select(group_col)
    recomputed = (
        base.join(F.broadcast(hot_groups), group_col, "left_semi")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_orders"),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
    )
    return cheap.unionByName(recomputed)


def full_aggregate(
    base: DataFrame, group_cols: list[str], aggs: list[dict]
) -> DataFrame:
    """The full-recompute form of a parsed matview aggregate spec
    (``matview_sql.parse_mv_spec``): user columns plus the hidden
    maintenance columns — ``__mv_n`` (group row count, drives group
    disappearance) and ``__mv_nn_<alias>`` (non-null count per SUM,
    so an all-NULL group's sum stays NULL under incremental
    maintenance exactly as a recompute would produce). Used at
    CREATE, at full-mode REFRESH, and for the scoped MIN/MAX
    recompute branch — one definition, three call sites, so the
    maintained schema can never drift from the recomputed one."""
    exprs, hidden = [], [F.count("*").alias("__mv_n")]
    for a in aggs:
        k, c, al = a["kind"], a.get("col"), a["alias"]
        if k == "count":
            exprs.append(F.count("*").alias(al))
        elif k == "count_col":
            exprs.append(F.count(c).alias(al))
        elif k == "sum":
            exprs.append(F.sum(c).alias(al))
            hidden.append(F.count(c).alias(f"__mv_nn_{al}"))
        elif k == "min":
            exprs.append(F.min(c).alias(al))
        elif k == "max":
            exprs.append(F.max(c).alias(al))
        elif k == "avg":
            # AVG maintains from hidden sum+count and re-divides (r14)
            exprs.append(F.avg(c).alias(al))
            hidden.append(F.sum(c).alias(f"__mv_as_{al}"))
            hidden.append(F.count(c).alias(f"__mv_ac_{al}"))
        else:  # pragma: no cover - parse_mv_spec only emits the above
            raise ValueError(f"unknown aggregate kind {k!r}")
    return base.groupBy(*[F.col(g) for g in group_cols]).agg(*exprs, *hidden)


def maintain_aggregates(
    view: DataFrame,
    changes: DataFrame,
    base: DataFrame,
    group_cols: list[str],
    aggs: list[dict],
) -> DataFrame:
    """Generalized CDF fold for a parsed matview spec — the SQL
    surface's maintenance algebra, generalizing :func:`maintain_view`
    (fixed two-column shape) and :func:`maintain_view_minmax` (fixed
    MIN/MAX pair) to any mix of COUNT(*) / COUNT(col) / SUM / MIN /
    MAX / AVG over any group columns:

    - COUNT/SUM maintain with signed deltas (O(changed rows), the
      base table is NEVER read); AVG maintains its hidden sum +
      non-null count the same way and re-divides, cast back to the
      stored column's type (decimal summands are demoted to full
      mode at parse — Spark's Average applies its own operand casts
      before dividing);
    - MIN/MAX use the partial-recompute split: groups whose deletes
      never touch a stored extreme merge via least/greatest; dirty
      groups re-aggregate from ``base`` SCOPED by a broadcast
      semi-join (partition-pruned on a group-partitioned base);
    - groups whose hidden ``__mv_n`` reaches zero drop out; SUMs go
      NULL when their non-null count reaches zero.

    SUM is maintained in the summand's native Spark sum type: exact
    for integer/decimal summands (the differential-testing
    convention); floating summands carry the usual last-ulp
    accumulation-order caveat any incremental engine has.
    """
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta_aggs = [F.sum(sign).alias("__mv_dn")]
    has_mm = False
    for a in aggs:
        k, c, al = a["kind"], a.get("col"), a["alias"]
        if k == "count":
            delta_aggs.append(F.sum(sign).alias(f"__mvd_{al}"))
        elif k == "count_col":
            delta_aggs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"__mvd_{al}")
            )
        elif k == "sum":
            delta_aggs.append(F.sum(sign * F.col(c)).alias(f"__mvd_{al}"))
            delta_aggs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"__mvdnn_{al}")
            )
        elif k == "min":
            has_mm = True
            delta_aggs.append(
                F.min(
                    F.when(F.col("_change_type") == "insert", F.col(c))
                ).alias(f"__mvins_{al}")
            )
            delta_aggs.append(
                F.min(
                    F.when(F.col("_change_type") == "delete", F.col(c))
                ).alias(f"__mvdel_{al}")
            )
        elif k == "max":
            has_mm = True
            delta_aggs.append(
                F.max(
                    F.when(F.col("_change_type") == "insert", F.col(c))
                ).alias(f"__mvins_{al}")
            )
            delta_aggs.append(
                F.max(
                    F.when(F.col("_change_type") == "delete", F.col(c))
                ).alias(f"__mvdel_{al}")
            )
        elif k == "avg":
            # signed deltas for the hidden sum + non-null count; the
            # visible avg re-divides below (r14)
            delta_aggs.append(F.sum(sign * F.col(c)).alias(f"__mvd_as_{al}"))
            delta_aggs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"__mvd_ac_{al}")
            )
    delta = changes.groupBy(*[F.col(g) for g in group_cols]).agg(*delta_aggs)
    joined = view.join(delta, group_cols, "full_outer")
    if has_mm:
        # r14 (guide §2.4/§5): with MIN/MAX present, `joined` feeds
        # BOTH output branches (cheap merge AND the hot-group semi-
        # join scope) — left lazy, the whole CDF delta subtree (the
        # expensive read+shuffle of the changed files) would evaluate
        # twice in one plan, since Spark does not share common
        # subtrees across branches. Materialize the group-cardinality
        # join once; both branches then read KB-sized checkpoint
        # blocks. The blocks are leaves of the returned plan, so the
        # caller's free_local_checkpoints(result) releases them.
        joined = joined.localCheckpoint(eager=True)

    needs = F.lit(False)
    if has_mm:
        # a stored row absent (fresh/unknown group) or a delete that
        # ties-or-beats a stored extreme makes least/greatest unsound
        needs = F.col("__mv_n").isNull()
        for a in aggs:
            al = a["alias"]
            # NULL-safe tie-or-beat: when the stored extreme is NULL
            # (the group's values were all NULL at the snapshot) a
            # non-null delete can only strike a post-snapshot insert,
            # so least/greatest against the insert extremes is
            # unsound — coalesce the three-valued comparison to TRUE
            # (dirty). Without it `del <= NULL` is NULL and the group
            # vanishes from BOTH filter branches.
            if a["kind"] == "min":
                needs = needs | (
                    F.col(f"__mvdel_{al}").isNotNull()
                    & F.coalesce(
                        F.col(f"__mvdel_{al}") <= F.col(al), F.lit(True)
                    )
                )
            elif a["kind"] == "max":
                needs = needs | (
                    F.col(f"__mvdel_{al}").isNotNull()
                    & F.coalesce(
                        F.col(f"__mvdel_{al}") >= F.col(al), F.lit(True)
                    )
                )

    out_cols = [F.col(g) for g in group_cols]
    n_new = F.coalesce(F.col("__mv_n"), F.lit(0)) + F.coalesce(
        F.col("__mv_dn"), F.lit(0)
    )
    for a in aggs:
        k, al = a["kind"], a["alias"]
        if k in ("count", "count_col"):
            out_cols.append(
                (
                    F.coalesce(F.col(al), F.lit(0))
                    + F.coalesce(F.col(f"__mvd_{al}"), F.lit(0))
                ).alias(al)
            )
        elif k == "sum":
            nn = F.coalesce(F.col(f"__mv_nn_{al}"), F.lit(0)) + F.coalesce(
                F.col(f"__mvdnn_{al}"), F.lit(0)
            )
            out_cols.append(
                F.when(
                    nn > 0,
                    F.coalesce(F.col(al), F.lit(0))
                    + F.coalesce(F.col(f"__mvd_{al}"), F.lit(0)),
                ).alias(al)
            )
        elif k == "min":
            out_cols.append(F.least(F.col(al), F.col(f"__mvins_{al}")).alias(al))
        elif k == "max":
            out_cols.append(
                F.greatest(F.col(al), F.col(f"__mvins_{al}")).alias(al)
            )
        elif k == "avg":
            as_new = F.coalesce(F.col(f"__mv_as_{al}"), F.lit(0)) + F.coalesce(
                F.col(f"__mvd_as_{al}"), F.lit(0)
            )
            ac_new = F.coalesce(F.col(f"__mv_ac_{al}"), F.lit(0)) + F.coalesce(
                F.col(f"__mvd_ac_{al}"), F.lit(0)
            )
            out_cols.append(
                F.when(ac_new > 0, as_new / ac_new)
                .cast(view.schema[al].dataType)
                .alias(al)
            )
    out_cols.append(n_new.alias("__mv_n"))
    for a in aggs:
        al = a["alias"]
        if a["kind"] == "sum":
            out_cols.append(
                (
                    F.coalesce(F.col(f"__mv_nn_{al}"), F.lit(0))
                    + F.coalesce(F.col(f"__mvdnn_{al}"), F.lit(0))
                ).alias(f"__mv_nn_{al}")
            )
        elif a["kind"] == "avg":
            out_cols.append(
                (
                    F.coalesce(F.col(f"__mv_as_{al}"), F.lit(0))
                    + F.coalesce(F.col(f"__mvd_as_{al}"), F.lit(0))
                )
                .cast(view.schema[f"__mv_as_{al}"].dataType)
                .alias(f"__mv_as_{al}")
            )
            out_cols.append(
                (
                    F.coalesce(F.col(f"__mv_ac_{al}"), F.lit(0))
                    + F.coalesce(F.col(f"__mvd_ac_{al}"), F.lit(0))
                ).alias(f"__mv_ac_{al}")
            )
    cheap = (
        joined.filter(~needs).select(*out_cols).filter(F.col("__mv_n") > 0)
    )
    if not has_mm:
        return cheap
    hot = joined.filter(needs).select(*group_cols)
    recomputed = full_aggregate(
        base.join(F.broadcast(hot), group_cols, "left_semi"),
        group_cols,
        aggs,
    )
    # align types (decimal sum precision differs between the delta
    # arithmetic and a fresh groupBy) so the union stays exact
    recomputed = recomputed.select(
        *[
            F.col(f.name).cast(f.dataType)
            for f in cheap.schema.fields
        ]
    )
    return cheap.unionByName(recomputed)


_MM_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
),
appended AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(-301 AS BIGINT), '9-EXPRESS', 111.25),
    (CAST(-302 AS BIGINT), '9-EXPRESS', 222.75),
    (CAST(-303 AS BIGINT), '1-URGENT', 333.5)
  ) v(o_orderkey, o_orderpriority, o_totalprice)
),
d AS (SELECT * FROM appended WHERE NOT ({_MV_DELETE})),
u AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN {_MV_UPDATE} THEN {_MV_BUMP} ELSE o_totalprice END AS o_totalprice
  FROM d
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM u GROUP BY 1
"""


@query("matview_minmax_cdc", oracle=_MM_ORACLE)
def matview_minmax_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX view maintained from the change feed with the
    partial-recompute split (``maintain_view_minmax``): the same DML
    script as ``matview_incremental_cdc``, whose deletes remove
    low-priced 3-MEDIUM orders (touching that group's stored MIN ->
    recompute path) while other groups' updates merge cheaply. Oracle
    = aggregate of the final base state; equality proves the split
    reconstructs exactly what a full recompute would."""
    path, s0 = build_mutated_orders_table(spark, sf_dir, "dws_mvmm_")
    view0 = (
        cow.read(spark, path, snapshot=s0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_v"),
            F.max("o_totalprice").alias("max_v"),
        )
        .localCheckpoint(eager=True)
    )
    ch = cow.changes(spark, path, from_snapshot=s0)
    maintained = maintain_view_minmax(
        view0, ch, cow.read(spark, path), "o_orderpriority", "o_totalprice"
    )
    # materialize the (group-cardinality) result, then free BOTH
    # checkpoint layers — the stored view's and the fold's internal
    # group-cardinality join (a leaf of `maintained`) — so repeated
    # runs in a long session pin nothing (r14 review)
    from ..plans import free_local_checkpoints, materialize_and_release

    out = materialize_and_release(
        maintained.select(
            "o_orderpriority",
            "n_orders",
            F.col("min_v").alias("min_price"),
            F.col("max_v").alias("max_price"),
        )
    )
    free_local_checkpoints(maintained)
    free_local_checkpoints(view0)
    return out
