#!/usr/bin/env python
"""Emit the per-round parity artifact PARITY_r{NN}.json (VERDICT r4 #1):
one record per registered query x scale factor with the same
rows/schema/hash booleans the driver records in CORRECTNESS_r{N}.json —
committed hard evidence for ALL registry queries, not just the 50 the
driver's window covers.

Usage (from repo root):
    python -m scripts.gen_parity --round 5               # both SFs, all queries
    python -m scripts.gen_parity --round 5 --sf sf0.01   # one SF
    python -m scripts.gen_parity --round 5 --only q_agg_basic,q_win_rank

The artifact is written incrementally after every query so a crash or
timeout keeps partial evidence; rerunning with --resume keeps existing
green records and re-checks only missing/red ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchprocessor_spark.plans.registry import load_all  # noqa: E402
from batchprocessor_spark.session import get_spark  # noqa: E402
from scripts.fixture_layout import ensure_multifile  # noqa: E402
from tests.oracle import canonical_rows, duckdb_run  # noqa: E402

# Production-shaped lanes (VERDICT r7 #3): single-file driver fixtures
# are mirrored into directory-per-table layouts, the session keeps the
# 128m scan-split default, and DuckDB reads the same part files.
SF_DIRS = {
    "sf0.01": ensure_multifile("/root/testdata/sf0.01"),
    "sf0.1": ensure_multifile("/root/testdata/sf0.1"),
}


def check_one(spark, spec, sf_dir: str) -> dict:
    """Driver-faithful check: rows / schema(column names) / value hash
    (order-insensitive canonical multiset, columns sorted by name)."""
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "sec": None,
        "err": None,
    }
    t0 = time.perf_counter()
    try:
        spark_pdf = spec.builder(spark, sf_dir).toPandas()
        oracle_pdf = duckdb_run(spec.oracle, sf_dir)
        rec["spark_rows"] = int(len(spark_pdf))
        rec["oracle_rows"] = int(len(oracle_pdf))
        rec["rows_match"] = len(spark_pdf) == len(oracle_pdf)
        rec["schema_match"] = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
        if rec["rows_match"] and rec["schema_match"]:
            rec["hash_match"] = canonical_rows(spark_pdf) == canonical_rows(oracle_pdf)
    except Exception as e:  # noqa: BLE001 - recorded, not raised
        rec["err"] = f"{type(e).__name__}: {e}"[:500]
        traceback.print_exc(limit=3, file=sys.stderr)
    rec["sec"] = round(time.perf_counter() - t0, 3)
    return rec


def is_green(rec: dict | None) -> bool:
    return bool(
        rec and rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", action="append", help="SF name to run (default: all known)")
    ap.add_argument(
        "--sf-dir",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register an extra scale-factor dir (e.g. sf1=.testdata_big/sf1); "
        "combine with --sf NAME to run just it (VERDICT r6 #3: sf1 parity)",
    )
    ap.add_argument("--only", help="comma-separated query-name filter")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out", help="output artifact path (default PARITY_r{NN}.json)")
    args = ap.parse_args()

    for spec_str in args.sf_dir:
        name, _, path = spec_str.partition("=")
        if not path or not os.path.isdir(path):
            ap.error(f"--sf-dir {spec_str}: path missing or not a directory")
        SF_DIRS[name] = ensure_multifile(os.path.abspath(path))

    sfs = args.sf or list(SF_DIRS)
    unknown = [s for s in sfs if s not in SF_DIRS]
    if unknown:
        ap.error(f"unknown --sf {unknown}; known: {list(SF_DIRS)} (add via --sf-dir)")
    registry = load_all()
    names = list(registry)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    out_path = args.out or f"PARITY_r{args.round:02d}.json"
    doc: dict = {
        "generated_by": "python -m scripts.gen_parity --round " + str(args.round),
        "round": args.round,
        "sfs": {k: SF_DIRS[k] for k in sfs},
        "n_queries": len(names),
        "queries": {},
    }
    # ALWAYS load an existing artifact: a filtered run (--only / --sf)
    # must extend the committed evidence, never clobber it down to the
    # filter (review r5). --resume additionally skips green records.
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        doc["queries"] = prior.get("queries", {})
        doc["sfs"] = {**prior.get("sfs", {}), **doc["sfs"]}
        # Hand-curated exclusion notes (declared O(n^2) baselines,
        # lane documentation) ride along across regenerations.
        if "excluded" in prior:
            doc["excluded"] = prior["excluded"]

    spark = get_spark("bp-parity")
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.perf_counter()
    n_done = 0
    for name in names:
        spec = registry[name]
        q = doc["queries"].setdefault(name, {})
        for sf in sfs:
            # --only names are always re-checked (used to refresh
            # records after a code change); plain --resume skips green.
            if args.resume and not args.only and is_green(q.get(sf)):
                continue
            q[sf] = check_one(spark, spec, SF_DIRS[sf])
            status = "PASS" if is_green(q[sf]) else "FAIL"
            print(
                f"[{status}] {name} @ {sf}: {q[sf]['sec']}s"
                + (f" err={q[sf]['err']}" if q[sf]["err"] else ""),
                file=sys.stderr,
                flush=True,
            )
        n_done += 1
        # Incremental write: a crash keeps everything checked so far.
        _summarize(doc, sfs)
        with open(out_path + ".tmp", "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(out_path + ".tmp", out_path)

    doc["total_sec"] = round(time.perf_counter() - t_start, 1)
    _summarize(doc, sfs)
    with open(out_path + ".tmp", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(out_path + ".tmp", out_path)
    spark.stop()
    s = doc["summary"]
    print(json.dumps(s))
    return 0 if s["all_green"] else 1


def _summarize(doc: dict, sfs: list[str]) -> None:
    # Summarize over EVERY SF present in the records, not just the
    # current run's subset — all_green must reflect the whole artifact.
    seen = {sf for q in doc["queries"].values() for sf in q}
    sfs = sorted(set(sfs) | seen)
    per_sf = {}
    for sf in sfs:
        recs = [q.get(sf) for q in doc["queries"].values()]
        checked = [r for r in recs if r is not None]
        per_sf[sf] = {
            "checked": len(checked),
            "pass": sum(1 for r in checked if is_green(r)),
            "fail": [
                n
                for n, q in doc["queries"].items()
                if q.get(sf) is not None and not is_green(q[sf])
            ],
        }
    doc["n_queries"] = len(doc["queries"])
    doc["summary"] = {
        "per_sf": per_sf,
        # all_green: every RECORDED check passed and every query has at
        # least one record. complete_grid additionally says every query
        # was checked at every SF — true for the full registry lanes
        # (PARITY_r*.json), intentionally false for multi-lane
        # artifacts like PARITY_SF1.json (headline+heavy at sf1, the
        # graph family at the sf1-derived subgraph).
        "all_green": all(
            s["pass"] == s["checked"] for s in per_sf.values()
        )
        and all(len(q) > 0 for q in doc["queries"].values())
        and doc["n_queries"] > 0,
        "complete_grid": all(
            s["checked"] == doc["n_queries"] and s["pass"] == s["checked"]
            for s in per_sf.values()
        ),
    }


if __name__ == "__main__":
    raise SystemExit(main())
