"""Behavioral / clickstream analytics patterns over the events table:
batch sessionization, funnel conversion, cohort retention, group mode,
share-of-total, and n-gram frequency (SURVEY §2.B window/aggregate
surface + §2.C text analysis, applied to the warehouse workloads the
reference's Dremio backend would serve).

Scale notes: every pattern here is one or two keyed shuffles over the
fact table. Sessionization and retention shuffle on user_id (the
natural high-cardinality key — no skew beyond power users, which AQE
absorbs); funnels reduce to per-user min-timestamps before joining, so
the join inputs are one row per user per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dec, one_minus
from ..registry import query
from ..tables import load_tables

SESSION_GAP_MIN = 30


@query(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM ordered
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a >30-minute silence starts a new
    session; session ids are per-user running counts of session
    starts (lag + cumulative sum — the standard two-window form, both
    windows over the SAME user_id partitioning so the rows shuffle
    once). The streaming counterpart is stream_session_window."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_start = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("is_start", is_start)
        .withColumn("session_seq", F.sum("is_start").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
        )
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per-user first
    occurrence of each step STRICTLY AFTER the previous step's first
    occurrence. Each stage reduces to one row per user before the
    next join, so the join inputs stay user-sized no matter how many
    raw events a user has."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def first_after(df_prev: DataFrame, ev_type: str, prev_t: str, out_t: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == ev_type).select("user_id", "ts")
        return (
            e.join(df_prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id", prev_t)
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = first_after(v, "click", "t0", "t1")
    p = first_after(c.select("user_id", "t1"), "purchase", "t1", "t2")
    return (
        v.agg(F.count("*").alias("n_view"))
        .join(c.agg(F.count("*").alias("n_click_after_view")))
        .join(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
      FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each subsequent activity week. Two aggregations on user_id plus a
    user-keyed join — the classic retention-matrix feed. (DuckDB and
    Spark both truncate weeks to Monday; the oracle casts its DATE
    result to TIMESTAMP for schema parity.)"""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    week_offset = (
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_week", week_offset.alias("week_offset"))
        .agg(F.count("*").alias("n_active_users"))
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: count sub-groups, then keep the
    highest count with a lexical tie-break (two partial-aggregating
    shuffles; never a full sort)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "window_share_of_total",
    oracle="""
    WITH nat_rev AS (
      SELECT n_name,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      AS DECIMAL(18,4))) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6)
             AS revenue_share
    FROM nat_rev
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (ratio_to_report): per-nation revenue divided by
    the global windowed sum. Both the group sums and the window total
    are exact decimals, so the final double division is bit-stable in
    both engines."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    rev = (dec("l_extendedprice") * one_minus("l_discount")).cast("decimal(18,4)")
    nat_rev = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("rev"))
    )
    total = Window.partitionBy()
    return nat_rev.select(
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(total).cast("double"), 6
        ).alias("revenue_share"),
    )


@query(
    "text_bigram_freq",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bg
      FROM ws WHERE len(w) >= 2
    )
    SELECT bg AS bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
    FROM bigrams
    GROUP BY bg
    HAVING COUNT(*) >= 20
    """,
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (count + doc frequency, thresholded):
    the n-gram statistics feed for language modeling / quality
    filters. The bigram build is a per-row array transform (no
    shuffle); only the final count aggregates shuffle."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    ws = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("doc_freq"))
        .filter(F.col("n") >= 20)
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_counts AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders
    FROM pair_counts
    WHERE n_orders >= 2
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in at
    least two orders. The self-join is keyed on the order (pairs per
    order are quadratic in BASKET size, which is small and bounded —
    never in order count); the pair aggregate shuffles once on the
    pair key. At 100 TB prune first to frequent items (the classic
    a-priori cut) to keep the pair space bounded."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS(ROUND((e.value - s.mu) / s.sigma, 4)) > 3.0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging: per-type moments (one aggregate,
    broadcast back) and a filter on |z| > 3. The moments side is
    group-count-sized, so the enrichment join is a broadcast —
    the fact table never shuffles. Rounded to 4dp BEFORE the
    threshold test as well as in the output: the double mean/stddev
    accumulate in engine-specific order, so cutting on the raw z
    could flip boundary rows between engines — cutting on the
    rounded z cannot (both engines agree on the rounded value)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stats = ev.groupBy(F.col("event_type").alias("st")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        ev.join(F.broadcast(stats), F.col("event_type") == F.col("st"))
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", z.alias("zscore"))
    )


@query(
    "resample_daily_ohlc",
    oracle="""
    WITH marked AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close_v,
           COUNT(*) AS n_events
    FROM marked
    GROUP BY event_type, day
    """,
)
def resample_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to daily OHLC bars per event type:
    first/last picked by deterministic (ts, event_id) row numbers —
    both windows and the aggregate share one (event_type, day)
    shuffle. The financial-bar shape of the timeseries surface
    (gap-fill's sibling)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.date_trunc("day", F.col("ts"))
    wf = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    wl = Window.partitionBy("event_type", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "event_type",
            day.alias("day"),
            "value",
            F.row_number().over(wf).alias("rn_first"),
            F.row_number().over(wl).alias("rn_last"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("close_v"),
            F.count("*").alias("n_events"),
        )
    )
