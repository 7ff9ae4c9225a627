"""End-to-end corpus curation: the composite pipeline an LLM
training-data run executes over raw documents, expressed as ONE
oracle-checked query (north-star composite over the §2.C operators):

    language filter -> quality gate -> exact dedup (md5 groupBy)
    -> near-dup clustering (5-gram Jaccard >= 0.5, connected
    components, keep cluster minimum) -> per-source corpus stats.

Scale shape: the language/quality gates are narrow maps that shrink
the corpus BEFORE any shuffle; exact dedup shuffles 16-byte digests;
near-dup pair generation over the survivor set IS the MinHash+LSH
candidate path (dedup.minhash_near_dup_pairs) — the composite runs
its production form, while its oracle computes the pairs exactly, so
the LSH-equals-exact equivalence is gated end-to-end. Clustering
takes a pairs DataFrame as input, so any candidate generator slots
in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables, spread
from .dedup import JACCARD_THRESHOLD, SHINGLE_WORDS, minhash_near_dup_pairs

MIN_TOKENS = 20
MAX_TOKENS = 1000
KEEP_LANG = "en"


def _label_propagate(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation over an
    undirected edge list (u, v) -> (doc_id, cluster_id). Each round is
    one distributed join+aggregate; the driver only checks the
    fixpoint counter.

    Each round's labels are localCheckpoint'ed (eager): without the
    truncation the label table's lineage doubles every round and
    round k replays all k-1 predecessors — the classic iterative-
    algorithm trap on a lazy engine. The checkpoint materializes
    partition blocks, never driver-side rows. Each round FREES the
    previous round's checkpoint blocks (free_local_checkpoints) once
    the new labels and the fixpoint count have materialized — leaving
    them pinned was part of the round-3 session-poisoning finding.
    The final labels frame keeps its (cluster-membership-sized)
    blocks; curation's composite frees those too once its stats
    materialize."""
    from ..plans import free_local_checkpoints

    edges = edges.cache()
    labels = (
        edges.select(F.col("u").alias("lu"))
        .distinct()
        .withColumn("label", F.col("lu"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, F.col("v") == F.col("lu"))
            .groupBy(F.col("u").alias("nu"))
            .agg(F.min("label").alias("nlabel"))
        )
        # r14 (guide §2.4): the changed flag is decidable IN the same
        # select that builds the new label (new < old iff a neighbor
        # label undercuts the stored one), so the fixpoint count scans
        # the just-checkpointed blocks instead of paying a second
        # join of new labels back to old labels every round — one
        # shuffle per round, not two.
        new_labels = (
            labels.join(neighbor_min, F.col("lu") == F.col("nu"), "left")
            .select(
                "lu",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (
                    F.col("nlabel").isNotNull()
                    & (F.col("nlabel") < F.col("label"))
                ).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("__chg")).count()
        free_local_checkpoints(labels)  # superseded round — provably dead
        labels = new_labels.select("lu", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("lu").alias("doc_id"), F.col("label").alias("cluster_id"))


_CURATION_ORACLE = f"""
WITH RECURSIVE
quality AS (
  SELECT doc_id, lang, source, text,
         LEN(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE lang = '{KEEP_LANG}'
    AND LEN(string_split(text, ' ')) BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
),
exact_kept AS (
  SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
surv AS (SELECT q.* FROM quality q JOIN exact_kept USING (doc_id)),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM surv),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - {SHINGLE_WORDS - 1}),
                               i -> array_to_string(ws[i:i+{SHINGLE_WORDS - 1}], ' '))) AS s
  FROM words
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes s1 ON s1.doc_id = doc_a
  JOIN sizes s2 ON s2.doc_id = doc_b
  WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM near
  UNION
  SELECT doc_b AS u, doc_a AS v FROM near
),
reach(u, label) AS (
  SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
),
clusters AS (SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u),
dropped AS (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id),
final AS (
  SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS min_doc_id
FROM final
GROUP BY lang, source
"""


@query("corpus_curation_pipeline", oracle=_CURATION_ORACLE)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as one DataFrame program; each stage is
    the operator family's scalable form (see module docstring).

    Cache lifecycle (the round-3 mandatory fix): the survivor table is
    persisted because three consumers need it (MinHash pair-gen, the
    final anti-join, the final stats agg), the per-source stats (a few
    rows) are materialized executor-side, and then EVERY piece of
    session state this composite created is released before it
    returns — the survivor cache, the pair-gen checkpoint, and the
    label-propagation checkpoint. A long-lived session that runs the
    composite holds no residue afterwards."""
    from ..plans import free_local_checkpoints, materialize_and_release

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])

    # 1-2. language + quality gates: narrow map, pushes to the scan
    n_tokens = F.size(F.split(F.col("text"), " "))
    quality = d.filter(
        (F.col("lang") == KEEP_LANG) & n_tokens.between(MIN_TOKENS, MAX_TOKENS)
    ).select("doc_id", "lang", "source", "text", n_tokens.alias("n_tokens"))

    # 3. exact dedup: shuffle digests, keep the minimum doc_id
    exact_kept = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = quality.join(exact_kept.select("doc_id"), "doc_id", "left_semi").persist()

    # 4. near-dup pairs over survivors via the MinHash+LSH candidate
    # path — the SCALE form, not the quadratic shingle self-join. Its
    # pair set equals the exact-Jaccard pair set on this corpus (the
    # dedup_minhash_lsh oracle certifies set equality per doc-pair,
    # and banding is per-document, so the survivor subset inherits
    # it); the composite's own oracle still computes pairs exactly,
    # gating that equivalence end-to-end.
    near = minhash_near_dup_pairs(surv.select("doc_id", "text")).select("doc_a", "doc_b")
    edges = near.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
        near.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    clusters = _label_propagate(edges)
    dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")

    # 5. corpus stats over the kept set; materialize, then release the
    # survivor cache and the (now-dead) pair/label checkpoints
    stats = (
        surv.join(dropped, "doc_id", "left_anti")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
    out = materialize_and_release(stats, surv)
    free_local_checkpoints(near)
    free_local_checkpoints(clusters)
    return out
