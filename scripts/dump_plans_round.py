#!/usr/bin/env python
"""Dump `explain("formatted")` for the bench HEADLINE queries into
plans/<tag>/<query>_<suffix>.txt — the per-round before/after plan
evidence for optimization rounds.

Run: PYTHONPATH=. python scripts/dump_plans_round.py <tag> <suffix> [query ...]
e.g. PYTHONPATH=. python scripts/dump_plans_round.py r12 before
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.session import get_spark
from scripts.fixture_layout import ensure_multifile


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = ensure_multifile(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    registry = load_all()
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        df = spec.builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt.splitlines())} lines, {n_ex} Exchange mentions -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
