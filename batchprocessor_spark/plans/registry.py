"""Query registry — the single source of truth for the engine's declared
query surface (SURVEY.md §2.2–§2.4).

Each operator/query is registered once with BOTH its Spark builder and
its DuckDB oracle SQL (or ``oracle=None`` for non-SQL-expressible ops).
``__spark_entry__.py`` derives ``queries()`` and ``oracle_sql()`` from
this registry, which keeps the two driver-checked surfaces in sync by
construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: a Spark DataFrame builder plus (optionally)
    an equivalent ANSI-SQL oracle that DuckDB can run on the same
    parquet tables."""

    name: str
    builder: Builder
    oracle: str | None
    category: str
    doc: str = field(default="")


def register(name: str, oracle: str | None = None, category: str = "relational"):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    Column-name discipline: every computed/aggregate column must carry
    the same alias in the builder and the oracle SQL — the driver's
    compare sorts columns by name before hashing values.
    """

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, category, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: populates REGISTRY)."""
    # Imports are deferred so `import batchprocessor_spark` stays cheap.
    from batchprocessor_spark import operators as _operators  # noqa: F401
    from batchprocessor_spark import functions as _functions  # noqa: F401
    from batchprocessor_spark import streaming as _streaming  # noqa: F401

    return REGISTRY
