"""Operator modules. Importing this package registers every operator
in the query registry (see ``..registry``)."""

from . import (  # noqa: F401
    aggregates,
    analytics_extra,
    behavioral,
    cow_dml,
    curation,
    ddl,
    decontam,
    dedup,
    joins,
    lm_quality,
    mllib_variants,
    multimodal,
    null_semantics,
    pii,
    pipeline_ops,
    pq,
    relational,
    sampling,
    scalars,
    setops,
    similarity,
    subqueries,
    textops,
    tpch_style,
    tpch_style2,
    udfs,
    warehouse_patterns,
    windows,
)

__all__ = [
    "aggregates",
    "ddl",
    "joins",
    "relational",
    "scalars",
    "setops",
    "subqueries",
    "windows",
]
