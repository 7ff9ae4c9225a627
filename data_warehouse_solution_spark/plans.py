"""Physical-plan introspection helpers: the programmatic form of
``df.explain("formatted")`` used by tests and tuning scripts to
assert plan SHAPE (pushdown reached the scan, joins broadcast,
buckets eliminated a shuffle) rather than just results.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (possibly AQE-wrapped) executed physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    """Operator counts + pushdown evidence for quick assertions."""
    plan = executed_plan(df)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "hash_aggregates": plan.count("HashAggregate"),
        "windows": plan.count("Window"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "partition_filters": "PartitionFilters" in plan,
        "read_schemas": re.findall(r"ReadSchema: ([^\n,]+)", plan),
    }


def has_shuffle_on(df: DataFrame, column: str) -> bool:
    """True if any Exchange hash-partitions on ``column`` — the check
    bucketed joins use to prove their shuffle was eliminated."""
    return bool(
        re.search(rf"Exchange hashpartitioning\([^)]*{re.escape(column)}", executed_plan(df))
    )
