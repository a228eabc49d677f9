"""Operator modules. Importing this package registers every batch query
in ``plans.registry.REGISTRY`` (SURVEY.md §2.2 + §2.4)."""

from batchprocessor_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    dedup,
    graph,
    hierarchy,
    joins,
    layout,
    mining,
    pipeline,
    relational,
    sampling,
    setops,
    similarity,
    skew,
    subqueries,
    timeseries,
    tpch,
    windows,
)
