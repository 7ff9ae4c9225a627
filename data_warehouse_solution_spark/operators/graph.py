"""Graph analytics over the behavioral event log: PageRank on the
event-type transition graph.

The dedup family already has one iterative graph algorithm (connected
components by label propagation, ``dedup.py``); this adds the other
canonical one. Nodes are event types, edges are observed transitions
(consecutive events per user, ordered by ``(ts, event_id)`` — the
event_id tie-break makes edge extraction deterministic when
timestamps collide), edge weight = transition count. Three weighted
PageRank iterations (damping 0.85, uniform init), the
training-data-curation shape of which is domain-graph quality
propagation (rank web domains by who links to them, then gate
documents by domain rank).

Determinism discipline for the value oracle: each iteration's
per-edge contribution ``0.85 * r * w / wout`` is pure IEEE
multiply/divide (identical across engines), rounded to 12 decimals
and cast to DECIMAL for the per-node SUM — so the one multi-row float
reduction per iteration is exact, and ranks stay bit-identical
through all iterations. Dangling nodes (no out-edges) leak their
mass, the standard simplified formulation; the oracle applies the
identical rule.

100 TB shape: edge extraction is one user-keyed window (single
exchange); each iteration is a join of the rank vector (node-count
rows — tiny, broadcastable) against the edge list plus one keyed
aggregate. Iterations are a fixed, data-independent count so the
lazy plan stays bounded; for high iteration counts at scale,
checkpoint per round exactly like ``curation.py`` does for label
propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

_ITER = 3
_DAMP = 0.85
_BASE = 0.15


def _oracle() -> str:
    its = []
    for k in range(1, _ITER + 1):
        its.append(f"""
c{k} AS (
  SELECT e.dst AS node,
         SUM(CAST(ROUND({_DAMP!r} * r.r * e.w / o.wout, 12) AS DECIMAL(18,12))) AS s
  FROM r{k - 1} r JOIN edges e ON r.node = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY 1
),
r{k} AS (
  SELECT n.node, ({_BASE!r} / nn.n) + CAST(COALESCE(c.s, 0) AS DOUBLE) AS r
  FROM nodes n CROSS JOIN nn LEFT JOIN c{k} c ON c.node = n.node
)""")
    return f"""
WITH hops AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM hops WHERE src IS NOT NULL GROUP BY 1, 2
),
outdeg AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
{",".join(its)}
SELECT node AS event_type, r AS pagerank FROM r{_ITER}
"""


@query("graph_pagerank_transitions", oracle=_oracle())
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, d=0.85) over the event-type
    transition graph — decimal-exact reductions keep every iteration
    bit-identical to the relational oracle."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(wlag).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    edges = edges.join(outdeg, "src")
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    nn = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = nodes.join(nn).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_ITER):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.lit(_DAMP) * F.col("r") * F.col("w") / F.col("wout"), 12
                )
                .cast("decimal(18,12)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(nn)
            .join(contribs, "node", "left")
            .select(
                "node",
                "n",
                (
                    F.lit(_BASE) / F.col("n")
                    + F.coalesce(
                        F.col("s"), F.lit(0).cast("decimal(18,12)")
                    ).cast("double")
                ).alias("r"),
            )
        )
    return ranks.select(F.col("node").alias("event_type"), F.col("r").alias("pagerank"))
