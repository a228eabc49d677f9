"""CLI entry point:

    python -m batchprocessor_spark list
    python -m batchprocessor_spark run q_agg_basic [--sf DIR] [--limit N]
    python -m batchprocessor_spark explain q_join_inner_broadcast [--sf DIR]
    python -m batchprocessor_spark sql "SELECT count(*) FROM lineitem" [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="batchprocessor_spark")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="scale-factor directory with the parquet tables",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries", parents=[common])
    p_list.add_argument("--category", help="filter to one registry category")
    p_list.add_argument(
        "--search", help="substring filter over name + registered doc"
    )
    p_desc = sub.add_parser(
        "describe", help="doc + oracle card for one query", parents=[common]
    )
    p_desc.add_argument("query")
    p_run = sub.add_parser("run", help="run a registered query", parents=[common])
    p_run.add_argument("query")
    p_run.add_argument("--limit", type=int, default=20)
    p_explain = sub.add_parser("explain", help="formatted physical plan", parents=[common])
    p_explain.add_argument("query")
    p_sql = sub.add_parser("sql", help="run SQL over the catalog views", parents=[common])
    p_sql.add_argument("statement")
    p_sql.add_argument("--limit", type=int, default=20)
    args = parser.parse_args(argv)

    from batchprocessor_spark.engine import Engine
    from batchprocessor_spark.plans.registry import load_all

    if args.cmd == "list":
        registry = load_all()
        names = sorted(registry)
        if args.category:
            names = [n for n in names if registry[n].category == args.category]
        if args.search:
            s = args.search.lower()
            names = [
                n
                for n in names
                if s in n.lower() or s in (registry[n].doc or "").lower()
            ]
        for name in names:
            spec = registry[name]
            oracle = "sql " if spec.oracle else "rows"
            print(f"{oracle}  {name:32s} [{spec.category}]")
        return 0
    if args.cmd == "describe":
        registry = load_all()
        if args.query not in registry:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        # No SparkSession spin-up: the card is pure registry metadata.
        from batchprocessor_spark.plans.registry import describe

        print(describe(registry[args.query]))
        return 0

    eng = Engine(sf_dir=args.sf)
    eng.spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "run":
        if args.query not in eng.queries():
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        eng.query(args.query).show(args.limit, truncate=False)
    elif args.cmd == "explain":
        print(eng.explain(args.query))
    elif args.cmd == "sql":
        eng.sql(args.statement).show(args.limit, truncate=False)
    eng.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
