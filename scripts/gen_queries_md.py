#!/usr/bin/env python
"""Generate QUERIES.md — the registry's Engine.describe() cards as a
committed, browsable document (VERDICT r6 #8): one section per
category, one entry per query with its full registered doc and oracle
kind, so the 300+-query surface is readable without a SparkSession or
the CLI. COVERAGE.md stays the compact cross-check table; QUERIES.md
is the reference manual.

Run: PYTHONPATH=. python scripts/gen_queries_md.py > QUERIES.md
(stdout, like gen_coverage/gen_plans — the freshness gate
tests/test_artifact_freshness.py::test_queries_md_tracks_registry
fails the commit if this trails the registry.)
"""

from __future__ import annotations

import inspect
from collections import defaultdict

from batchprocessor_spark.plans.registry import load_all


def main() -> None:
    registry = load_all()
    by_cat: dict[str, list] = defaultdict(list)
    for name, spec in sorted(registry.items()):
        by_cat[spec.category].append(spec)

    print("# QUERIES — the registered query surface, described")
    print()
    print(
        f"{len(registry)} registered queries. Each entry below is the same "
        "card `Engine.describe(name)` / `python -m batchprocessor_spark "
        "describe <name>` prints (minus the oracle SQL, which lives in "
        "source next to each builder). Run any of them with "
        "`Engine(spark, sf_dir).query(name)`; discover programmatically "
        "with `Engine.queries(category=..., search=...)`."
    )
    print()
    print("Categories: " + ", ".join(
        f"**{cat}** ({len(specs)})" for cat, specs in sorted(by_cat.items())
    ))
    print()
    for cat in sorted(by_cat):
        print(f"## {cat}")
        print()
        for spec in by_cat[cat]:
            mod = inspect.getmodule(spec.builder)
            where = mod.__name__.removeprefix("batchprocessor_spark.") if mod else "?"
            oracle = "SQL-oracled" if spec.oracle else "rows-only"
            print(f"### `{spec.name}`")
            print()
            print(f"*{oracle}, defined in `{where}`*")
            print()
            doc = inspect.cleandoc(spec.doc) if spec.doc else "(no doc)"
            print(doc)
            print()


if __name__ == "__main__":
    main()
