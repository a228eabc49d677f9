#!/usr/bin/env python
"""Generate COVERAGE.md: the registry's query inventory cross-checked
against SURVEY.md §2, with module locations and oracle types.
Run: python scripts/gen_coverage.py > COVERAGE.md
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

    print("# COVERAGE — registered query/operator inventory")
    print()
    print(f"{len(registry)} queries registered in "
          "`batchprocessor_spark/plans/registry.py`; "
          f"{sum(1 for s in registry.values() if s.oracle)} with DuckDB SQL "
          "oracles, the rest rows-only (non-SQL-expressible: sketches, LSH "
          "internals, streaming scenarios). Cross-reference: SURVEY.md §2.")
    print()
    for cat in sorted(by_cat):
        print(f"## {cat} ({len(by_cat[cat])})")
        print()
        print("| query | oracle | where | what |")
        print("|---|---|---|---|")
        for spec in by_cat[cat]:
            mod = inspect.getmodule(spec.builder)
            where = f"`{mod.__name__.removeprefix('batchprocessor_spark.')}`"
            doc = " ".join((spec.doc or "").split())
            if len(doc) > 110:
                doc = doc[:107] + "..."
            oracle = "SQL" if spec.oracle else "rows-only"
            print(f"| `{spec.name}` | {oracle} | {where} | {doc} |")
        print()


if __name__ == "__main__":
    main()
