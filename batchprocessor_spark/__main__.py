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
    sub.add_parser("list", help="list registered queries", parents=[common])
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
        for name, spec in sorted(load_all().items()):
            oracle = "sql " if spec.oracle else "rows"
            print(f"{oracle}  {name:32s} [{spec.category}]")
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
