"""Mergeable sketch operators: deterministic HyperLogLog and
count-min, value-oracled ACROSS ENGINES.

The registry already exposes Spark's built-in sketches
(``approx_count_distinct``, ``approx_percentile``) but those are
rows-only checks — each engine's sketch internals differ, so no value
oracle is possible. This module closes that gap: both sketches here
are built from a pinned, integer-exact hash (degski's 32-bit
multiplicative xorshift — public-domain, the well-known
``((x >> 16) ^ x) * 0x45d9f3b`` construction) that Spark and DuckDB
evaluate identically in 64-bit-safe arithmetic, so the ENTIRE sketch —
registers, counters, and the final estimate — is value-hash-compared
against the DuckDB oracle. That turns "the sketch ran" into "the
sketch is the same sketch", including the merge step.

Why this matters at 100 TB: the pre-aggregated-sketch rollup is the
canonical warehouse pattern for distinct counting over petabyte facts
(BigQuery ``HLL_COUNT.MERGE``, Snowflake ``HLL_COMBINE``, Apache
DataSketches). You persist per-shard register partials (KB per shard)
and answer "distinct over any shard union" by register-wise MAX —
never re-reading the fact table. The Spark implementation here builds
the partials per shard and merges them in a second aggregate, so the
plan IS the rollup pattern; the oracle builds the sketch directly in
one level, and hash-equality of the results is an end-to-end proof of
the merge law (max of per-shard maxes == global max per register).

Numeric determinism: every multi-row reduction is on integers
(register maxes, scaled power sums as BIGINT); the only floats are a
single literal * divide chain (IEEE ops are exact and identical across
engines) and one ``LN`` in the HLL small-range correction, rounded to
4 decimals per the repo convention for transcendentals (see
``lm_quality.py``).

Reference parity note: the reference delegates all aggregation to its
warehouse (reference ``pipeline.py:110-114``); approximate distinct
is part of the warehouse surface this engine provides natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

# degski's 32-bit hash constant (0x45d9f3b); all intermediates fit in
# int64: (2^32-1) * 0x45d9f3b < 2^59.
_C = 0x45D9F3B
_M32 = 4294967296  # 2^32

# --- HLL parameters: p=12 -> m=4096 registers, 20-bit rho domain ----
_P = 12
_M = 1 << _P  # 4096
_WBITS = 32 - _P  # 20
# alpha_m * m^2 * 2^(WBITS+1): precomputed in Python (IEEE doubles,
# same ops both engines would do) and embedded as one literal so the
# association order cannot diverge.
_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / float(_M))) * float(_M * _M * (1 << (_WBITS + 1)))
_LC_THRESHOLD = 2.5 * _M  # small-range (linear counting) switch


def _spark_hash32(x: Column) -> Column:
    """degski32 over a nonnegative bigint column, mod-2^32 arithmetic."""
    h = x % F.lit(_M32)
    for _ in range(2):
        h = (F.shiftright(h, 16).bitwiseXOR(h) * F.lit(_C)) % F.lit(_M32)
    return F.shiftright(h, 16).bitwiseXOR(h)


def _duck_hash32(x: str) -> str:
    """The same hash as a DuckDB SQL expression (staged via nesting)."""
    h = f"(({x}) % {_M32})"
    for _ in range(2):
        h = f"((xor({h} >> 16, {h}) * {_C}) % {_M32})"
    return f"xor({h} >> 16, {h})"


def _spark_rho(w: Column) -> Column:
    """rho = leading-zero count of the 20-bit suffix + 1, as an exact
    integer CASE ladder (no float log2 — floor(log) is not portable)."""
    cond = F.when(w >= F.lit(1 << (_WBITS - 1)), F.lit(1))
    for r in range(2, _WBITS + 1):
        cond = cond.when(w >= F.lit(1 << (_WBITS - r)), F.lit(r))
    return cond.otherwise(F.lit(_WBITS + 1))


def _duck_rho(w: str) -> str:
    parts = [f"WHEN {w} >= {1 << (_WBITS - r)} THEN {r}" for r in range(1, _WBITS + 1)]
    return "CASE " + " ".join(parts) + f" ELSE {_WBITS + 1} END"


_HLL_ORACLE = f"""
WITH hf AS (
  SELECT l_returnflag AS grp, {_duck_hash32("l_orderkey")} AS h
  FROM lineitem
),
regs AS (
  SELECT grp, h % {_M} AS reg, MAX({_duck_rho(f"(h >> {_P})")}) AS rho
  FROM hf GROUP BY grp, h % {_M}
),
summed AS (
  SELECT grp, COUNT(*) AS present,
         SUM(CAST(1 AS BIGINT) << ({_WBITS + 1} - rho)) AS s_part
  FROM regs GROUP BY grp
),
est AS (
  SELECT grp, {_M} - present AS zero_regs,
         s_part + CAST({_M} - present AS BIGINT) * {1 << (_WBITS + 1)} AS s_total
  FROM summed
),
ex AS (
  SELECT l_returnflag AS grp, COUNT(DISTINCT l_orderkey) AS n_exact
  FROM lineitem GROUP BY 1
)
SELECT ex.grp AS l_returnflag, ex.n_exact, est.zero_regs,
       ROUND(CASE WHEN ({_ALPHA_NUM!r} / s_total) <= {_LC_THRESHOLD!r}
                   AND zero_regs > 0
             THEN {float(_M)!r} * LN({float(_M)!r} / zero_regs)
             ELSE {_ALPHA_NUM!r} / s_total END, 4) AS hll_estimate
FROM ex JOIN est ON ex.grp = est.grp
"""


@query("sketch_hll_mergeable", oracle=_HLL_ORACLE)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (p=12) distinct-orderkey estimate per
    return flag, built as MERGEABLE PARTIALS: per-(group, shard)
    register maxes first (the persisted-sketch granularity), then
    register-wise MAX across shards (the merge), then the standard
    estimator with linear-counting small-range correction. The DuckDB
    oracle builds the same sketch in one level — value-hash equality
    is an end-to-end proof of the merge law.

    100 TB shape: the first aggregate is the only pass over the fact
    table and map-side combines to <= groups*shards*4096 rows; the
    merge and estimate run on KBs. Persist the partials and any shard
    union's cardinality is answerable without re-scanning facts —
    the BigQuery HLL_COUNT.MERGE / DataSketches rollup pattern.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_returnflag", "l_orderkey"
    )
    h = _spark_hash32(F.col("l_orderkey"))
    hashed = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_orderkey"),
        (h % F.lit(_M)).alias("reg"),
        _spark_rho(F.shiftright(h, _P)).alias("rho"),
        (F.col("l_orderkey") % F.lit(8)).alias("shard"),
    )
    # mergeable partial sketches: one row per (group, shard, register)
    partials = hashed.groupBy("grp", "shard", "reg").agg(F.max("rho").alias("rho"))
    # sketch merge == register-wise max across shards
    merged = partials.groupBy("grp", "reg").agg(F.max("rho").alias("rho"))
    summed = merged.groupBy("grp").agg(
        F.count("*").alias("present"),
        # SQL shiftleft accepts a column shift amount (the PySpark
        # wrapper insists on a literal int)
        F.sum(F.expr(f"cast(shiftleft(1, {_WBITS + 1} - rho) as bigint)")).alias(
            "s_part"
        ),
    )
    est = summed.select(
        "grp",
        (F.lit(_M) - F.col("present")).alias("zero_regs"),
        (
            F.col("s_part")
            + (F.lit(_M) - F.col("present")).cast("bigint") * F.lit(1 << (_WBITS + 1))
        ).alias("s_total"),
    )
    raw = F.lit(_ALPHA_NUM) / F.col("s_total")
    corrected = F.when(
        (raw <= F.lit(_LC_THRESHOLD)) & (F.col("zero_regs") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("zero_regs")),
    ).otherwise(raw)
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.countDistinct("l_orderkey").alias("n_exact")
    )
    return exact.join(est, "grp").select(
        F.col("grp").alias("l_returnflag"),
        "n_exact",
        "zero_regs",
        F.round(corrected, 4).alias("hll_estimate"),
    )


# --- count-min sketch ------------------------------------------------
_D = 3  # hash rows
_W = 1024  # counters per row
_SEED_STEP = 1000003  # prime stride decorrelates the d hash rows
# heavy hitter = count >= 1.02 * mean key count. The fixtures'
# per-supplier counts are near-uniform (~±8% of mean), so a classic
# 2x-mean cutoff would select nothing at any SF; 1.02 yields a real,
# SF-stable candidate set (2 keys at sf0.001, 37 at sf0.01).
_HEAVY_FACTOR = 1.02


def _spark_cms_col(key: Column, i: Column) -> Column:
    return _spark_hash32(key + i * F.lit(_SEED_STEP)) % F.lit(_W)


def _duck_cms_col(key: str, i: str) -> str:
    return f"({_duck_hash32(f'({key} + {i} * {_SEED_STEP})')} % {_W})"


_CMS_ORACLE = f"""
WITH ii(i) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))),
cms AS (
  SELECT i, {_duck_cms_col("l_suppkey", "i")} AS c, COUNT(*) AS cnt
  FROM lineitem CROSS JOIN ii
  GROUP BY 1, 2
),
ex AS (SELECT l_suppkey, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1),
thr AS (
  SELECT {_HEAVY_FACTOR!r} * (SUM(exact_cnt) / COUNT(*)) AS t FROM ex
),
heavy AS (SELECT * FROM ex, thr WHERE exact_cnt >= t),
probe AS (
  SELECT h.l_suppkey, h.exact_cnt, MIN(cms.cnt) AS cms_estimate
  FROM heavy h CROSS JOIN ii
  JOIN cms ON cms.i = ii.i AND cms.c = {_duck_cms_col("h.l_suppkey", "ii.i")}
  GROUP BY 1, 2
)
SELECT * FROM probe
"""


@query("sketch_countmin_heavy_hitters", oracle=_CMS_ORACLE)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=3, w=1024) frequency estimates for heavy
    suppliers, with the exact counts beside them. The counter table is
    the mergeable summary: counters SUM across partitions/shards, so
    the build is one map-side-combined aggregate producing <= d*w
    rows; probing broadcasts that KB-sized table against the candidate
    keys. Estimates are one-sided (>= exact) by construction — the
    value oracle pins both the exact counts and the collision-inflated
    estimates, so the sketch content itself is cross-engine-verified.

    100 TB shape: heavy-hitter detection without a per-key shuffle of
    the fact table — the d*w counter grid is the only global state,
    and candidate enumeration (here: keys above ``_HEAVY_FACTOR`` x
    the mean — 1.02, because the fixtures' per-key counts are
    near-uniform) typically comes from a dimension table, not the
    facts.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select("l_suppkey")
    ii = F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(_D)])).alias("i")
    cms = (
        li.select("l_suppkey", ii)
        .select("i", _spark_cms_col(F.col("l_suppkey"), F.col("i")).alias("c"))
        .groupBy("i", "c")
        .agg(F.count("*").alias("cnt"))
    )
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_cnt"))
    thr = exact.agg(
        (F.lit(_HEAVY_FACTOR) * (F.sum("exact_cnt") / F.count("*"))).alias("t")
    )
    heavy = exact.join(F.broadcast(thr)).filter(F.col("exact_cnt") >= F.col("t"))
    probe = (
        heavy.select("l_suppkey", "exact_cnt", ii)
        .withColumn("c", _spark_cms_col(F.col("l_suppkey"), F.col("i")))
        .join(F.broadcast(cms), ["i", "c"])
        .groupBy("l_suppkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return probe


def hll_partials(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """Library surface: build persistable HLL register partials for
    ``key`` grouped by ``group_cols`` (one row per group+register).
    Merge any union of partial sets with :func:`hll_merge_estimate`.
    """
    h = _spark_hash32(F.col(key).cast("bigint"))
    return (
        df.select(
            *group_cols,
            (h % F.lit(_M)).alias("reg"),
            _spark_rho(F.shiftright(h, _P)).alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_estimate(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge HLL register partials (register-wise MAX) and estimate
    cardinality per group — without touching the base table."""
    merged = partials.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))
    summed = merged.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        F.sum(F.expr(f"cast(shiftleft(1, {_WBITS + 1} - rho) as bigint)")).alias(
            "s_part"
        ),
    )
    s_total = F.col("s_part") + (F.lit(_M) - F.col("present")).cast("bigint") * F.lit(
        1 << (_WBITS + 1)
    )
    raw = F.lit(_ALPHA_NUM) / s_total
    zero = F.lit(_M) - F.col("present")
    corrected = F.when(
        (raw <= F.lit(_LC_THRESHOLD)) & (zero > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zero),
    ).otherwise(raw)
    return summed.select(*group_cols, F.round(corrected, 4).alias("hll_estimate"))


# --- mergeable equi-width quantile histogram ------------------------
_QW = 256  # bins
_QS = (0.5, 0.9)  # estimated quantiles


def _duck_quantile_hist() -> str:
    qs_rows = ", ".join(f"({q!r})" for q in _QS)
    return f"""
WITH bounds AS (
  SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
         CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
  FROM lineitem
),
binned AS (
  SELECT l_returnflag AS grp,
         LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / {_QW})) AS BIGINT),
               {_QW - 1}) AS bin
  FROM lineitem CROSS JOIN bounds
),
hist AS (SELECT grp, bin, COUNT(*) AS cnt FROM binned GROUP BY 1, 2),
cum AS (
  SELECT grp, bin, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY grp) AS total
  FROM hist
),
qq(q) AS (VALUES {qs_rows}),
hit AS (
  SELECT grp, q, bin, cnt, cum, total,
         ROW_NUMBER() OVER (PARTITION BY grp, q ORDER BY bin) AS rn
  FROM cum CROSS JOIN qq
  WHERE cum >= q * total
)
SELECT h.grp AS l_returnflag, h.q, CAST(h.total AS BIGINT) AS n_rows,
       lo + ((hi - lo) / {_QW}) * (h.bin + ((h.q * h.total) - (h.cum - h.cnt)) / h.cnt)
         AS est_value
FROM hit h CROSS JOIN bounds
WHERE h.rn = 1
"""


@query("sketch_quantile_histogram", oracle=_duck_quantile_hist())
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantiles: global [min,max]
    bounds (one tiny agg), 256 shared-boundary bins, per-group bin
    counts built as per-shard PARTIALS and merged by plain SUM (the
    histogram analog of the HLL register merge — counters over shared
    boundaries are the simplest mergeable quantile summary), then p50
    and p90 by cumulative-count interpolation inside the hit bin.
    Every arithmetic step is IEEE mult/div on deterministic inputs,
    so the estimates hash-match the DuckDB oracle exactly.

    Accuracy is bounded by bin width (asserted vs the exact
    percentile in tests), which is the classic trade: the built-in
    t-digest (``agg_approx_percentile``) adapts better at the tails
    but is engine-specific and rows-only-checkable; this one is
    value-oracled and merges with one SUM at any sharding.

    100 TB shape: bounds agg + one map-side-combined count pass; the
    histogram is groups x 256 rows of state, so quantiles over any
    shard union come from summing KB-sized partials — no re-scan,
    no sort, unlike exact percentile_disc (full sort per group)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_suppkey"
    )
    bounds = F.broadcast(
        li.agg(
            F.min("l_extendedprice").cast("double").alias("lo"),
            F.max("l_extendedprice").cast("double").alias("hi"),
        )
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(_QW)
    binned = li.join(bounds).select(
        F.col("l_returnflag").alias("grp"),
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) / width).cast("bigint"),
            F.lit(_QW - 1),
        ).alias("bin"),
        (F.col("l_suppkey") % F.lit(8)).alias("shard"),
    )
    partials = binned.groupBy("grp", "shard", "bin").agg(F.count("*").alias("cnt"))
    hist = partials.groupBy("grp", "bin").agg(F.sum("cnt").alias("cnt"))
    wcum = Window.partitionBy("grp").orderBy("bin")
    wtot = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("total"),
    )
    qq = F.explode(F.array(*[F.lit(q) for q in _QS])).alias("q")
    hits = (
        cum.select("grp", "bin", "cnt", "cum", "total", qq)
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("grp", "q").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    est = F.col("lo") + ((F.col("hi") - F.col("lo")) / F.lit(_QW)) * (
        F.col("bin")
        + ((F.col("q") * F.col("total")) - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    )
    return hits.join(bounds).select(
        F.col("grp").alias("l_returnflag"),
        "q",
        F.col("total").alias("n_rows"),
        est.alias("est_value"),
    )
