"""Systematic SQL-twin coverage artifact (VERDICT r9 task 6).

The curated twin sets (contract + extended, tests/test_sql_twins.py)
prove ~60 queries through ``engine.sql()``; every OTHER registered
query documents equivalent SQL only via its DuckDB oracle. This
script MEASURES instead of curating: it runs every registered
query's candidate Spark-SQL text — the hand-written twin when one
exists, else the oracle with the mechanical ``//`` → ``DIV`` dialect
map — through a real ``spark.sql()`` over the catalog views and
value-compares against the DataFrame builder at sf0.01, recording
per-query pass / dialect_fail / value_mismatch into ``TWINS.json``.

The artifact makes the SQL-front-end coverage a measured number with
named gaps (which DuckDB-dialect constructs an analyst would hit),
instead of a curated subset; tests/test_artifact_freshness.py gates
it against registry drift.

Usage:
    python -m scripts.gen_twins [--sf-dir DIR] [--out TWINS.json]
        [--only name ...] [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Mapped oracles that wedge Spark's ANALYZER driver-side (where the
# job-group watchdog cannot reach — no job exists yet). Recorded as
# unserved with the reason; the DataFrame builder remains the way to
# run these.
ANALYZER_PATHOLOGICAL = {
    "q_ts_dtw": (
        "mapped oracle's DTW fold expands to a multi-megabyte nested "
        "expression tree that wedges Spark's analyzer for >10 min "
        "(DuckDB evaluates it through a materialized CTE); "
        "driver-side, uncancellable"
    ),
}


def classify_source(name: str) -> str:
    from batchprocessor_spark.plans import sql_twins as tw

    if name in tw.SPARK_SQL_TWINS:
        return "hand_twin"
    if name in tw.EXTENDED_TWIN_NAMES:
        return "extended_twin"
    if name in tw.dialect_twins():
        return "dialect_twin"
    return "oracle_div_mapped"


def candidate_sql(name: str, oracle: str) -> str:
    from batchprocessor_spark.plans import sql_twins as tw

    if name in tw.SPARK_SQL_TWINS:
        return tw.SPARK_SQL_TWINS[name]
    if name in tw.EXTENDED_TWIN_NAMES:
        return tw._extended_twins()[name]
    if name in tw.dialect_twins():
        return tw.dialect_twins()[name]
    # NOT spark_sql_for: the sweep must measure the mechanical map for
    # every query, including ones a prior artifact already admitted —
    # the artifact is regenerated evidence, not a cache of itself.
    return tw.mechanical_spark_sql(oracle)


def run_one(spark, name: str, spec, sf_dir: str, timeout_s: int = 180) -> dict:
    from tests.oracle import canonical_rows

    rec: dict = {"source": classify_source(name)}
    if spec.oracle is None:
        rec["status"] = "no_oracle"
        return rec
    # The skiplist only covers the MAPPED oracle text; a hand dialect
    # twin (e.g. q_ts_dtw's fold-DP rewrite, r11) is measured normally.
    if name in ANALYZER_PATHOLOGICAL and rec["source"] == "oracle_div_mapped":
        rec["status"] = "timeout"
        rec["error"] = ANALYZER_PATHOLOGICAL[name]
        return rec
    sql = candidate_sql(name, spec.oracle)
    # Fingerprint of the EXACT text this measurement runs: serve-time
    # (spark_sql_for) re-derives the candidate and refuses a stale
    # pass record whose text has since drifted (ADVICE r10 #1).
    from batchprocessor_spark.plans.sql_twins import sql_fingerprint

    rec["sql_md5"] = sql_fingerprint(sql)
    t0 = time.perf_counter()
    # Watchdog: a mapped oracle can be VALID Spark SQL yet plan
    # pathologically (e.g. a DTW fold that DuckDB evaluates through a
    # materialized CTE in seconds but Spark expands per-row). Such a
    # query must be recorded as unserved ("timeout"), not wedge the
    # sweep — cancel its job group after timeout_s.
    import threading

    sc = spark.sparkContext
    sc.setJobGroup(f"twins:{name}", name, interruptOnCancel=True)
    timer = threading.Timer(
        timeout_s, lambda: sc.cancelJobGroup(f"twins:{name}")
    )
    timer.daemon = True
    timer.start()
    try:
        twin_pdf = spark.sql(sql).toPandas()
    except Exception as e:  # noqa: BLE001 - the failure class IS the datum
        timed_out = time.perf_counter() - t0 >= timeout_s - 1
        rec["status"] = "timeout" if timed_out else "dialect_fail"
        rec["error"] = f"{type(e).__name__}: {e}"[:400]
        return rec
    finally:
        timer.cancel()
        sc.setJobGroup("", "")
    try:
        builder_pdf = spec.builder(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        rec["status"] = "builder_error"
        rec["error"] = f"{type(e).__name__}: {e}"[:400]
        return rec
    got = canonical_rows(twin_pdf)
    want = canonical_rows(builder_pdf)
    rec["seconds"] = round(time.perf_counter() - t0, 2)
    if got == want:
        rec["status"] = "pass"
    else:
        rec["status"] = "value_mismatch"
        rec["error"] = (
            f"twin {len(got)} rows vs builder {len(want)} rows; "
            f"first twin row: {got[0] if got else None}; "
            f"first builder row: {want[0] if want else None}"
        )[:400]
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="TWINS.json")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--timeout",
        type=int,
        default=180,
        help="per-query watchdog seconds (raise for heavy-SF sweeps)",
    )
    args = ap.parse_args()

    from batchprocessor_spark.plans.registry import load_all
    from batchprocessor_spark.session import get_spark
    from batchprocessor_spark.sources.catalog import register_views
    from scripts.fixture_layout import ensure_multifile

    sf_dir = ensure_multifile(args.sf_dir)
    registry = load_all()
    names = sorted(args.only) if args.only else sorted(registry)

    prior: dict = {}
    if args.resume and os.path.exists(args.out):
        prior = json.load(open(args.out)).get("queries", {})

    spark = get_spark("bp-gen-twins", cpus=8, shuffle_partitions=8)
    register_views(spark, sf_dir)

    from batchprocessor_spark.plans.sql_twins import sql_fingerprint

    queries: dict = dict(prior)
    for i, name in enumerate(names, 1):
        p = prior.get(name, {})
        # A prior pass is reusable only while the candidate text is
        # byte-identical to what was measured — a changed oracle or
        # dialect rule invalidates the record (ADVICE r10 #1).
        if (
            args.resume
            and p.get("status") == "pass"
            and registry[name].oracle is not None
            and p.get("sql_md5")
            == sql_fingerprint(candidate_sql(name, registry[name].oracle))
        ):
            continue
        queries[name] = run_one(
            spark, name, registry[name], sf_dir, timeout_s=args.timeout
        )
        # Per-record provenance: a sweep may legitimately mix dirs
        # (r12 — the graph family's sf1 lane runs on the sf1graph
        # subsample, mirroring PARITY_SF1), so the top-level sf_dir
        # alone can't label every record.
        queries[name]["sf_dir"] = args.sf_dir
        print(
            f"[{i}/{len(names)}] {name}: {queries[name]['status']}",
            file=sys.stderr,
            flush=True,
        )
        # Checkpoint after EVERY query: a driver-side analyzer wedge
        # (uncancellable — no job group exists yet) forces a kill, and
        # without this the whole sweep's measurements would be lost.
        _write(args.out, queries, args.sf_dir, summary=False)

    _write(args.out, queries, args.sf_dir)
    return 0


def _write(out: str, queries: dict, sf_dir: str, summary: bool = True) -> None:
    statuses = [q["status"] for q in queries.values()]
    payload = {
        "sf_dir": sf_dir,
        "n": len(queries),
        "n_pass": statuses.count("pass"),
        "n_dialect_fail": statuses.count("dialect_fail"),
        "n_value_mismatch": statuses.count("value_mismatch"),
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    if summary:
        print(
            f"TWINS: {payload['n_pass']}/{payload['n']} pass, "
            f"{payload['n_dialect_fail']} dialect_fail, "
            f"{payload['n_value_mismatch']} value_mismatch -> {out}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    raise SystemExit(main())
