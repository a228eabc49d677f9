#!/usr/bin/env python
"""Per-query execution profile for the bench HEADLINE set (guide §1).

Runs each headline query once (after a warmup) with
``setJobDescription(<query>)`` and Spark event logging enabled, then
parses the event log to attribute jobs/stages/tasks to queries:

    query  wall_s  n_jobs  n_stages  n_tasks  task_time_s  shuffle_mb

Where ``task_time_s`` is the sum of executor run time across tasks —
the real compute — and the gap between ``wall_s`` and the per-stage
critical path is scheduling/planning overhead. Writes a JSON report to
.bench/PROFILE_<tag>.json and prints a table.

Usage: PYTHONPATH=. python scripts/profile_bench.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.session import get_spark
from scripts.fixture_layout import ensure_multifile


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "profile"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = ensure_multifile(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    evdir = "/tmp/spark-events-" + tag
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "bp-profile",
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warmup (JVM/codegen/footers), unlabeled.
    registry["q_agg_basic"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    walls: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # Parse the event log (Spark 4 writes eventlog_v2_* directories).
    ev_files = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(evdir)
        for f in files
        if "appstatus" not in f
    ]
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    per_stage: dict[int, dict] = {}
    for path in ev_files:
        with open(path, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    job_desc[jid] = desc
                    for sinfo in ev.get("Stage Infos", []):
                        stage_job.setdefault(sinfo["Stage ID"], jid)
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    # TaskEnd events precede StageCompleted in the log:
                    # merge, never overwrite the accumulated task sums.
                    rec = per_stage.setdefault(
                        sid,
                        {
                            "wall_ms": 0,
                            "n_tasks": 0,
                            "run_ms": 0,
                            "shuffle_read": 0,
                            "shuffle_write": 0,
                            "fetch_wait_ms": 0,
                            "gc_ms": 0,
                        },
                    )
                    rec["wall_ms"] = (comp - sub) if sub and comp else 0
                    rec["n_tasks"] = si.get("Number of Tasks", 0)
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    rec = per_stage.setdefault(
                        sid,
                        {
                            "wall_ms": 0,
                            "n_tasks": 0,
                            "run_ms": 0,
                            "shuffle_read": 0,
                            "shuffle_write": 0,
                            "fetch_wait_ms": 0,
                            "gc_ms": 0,
                        },
                    )
                    rec["run_ms"] += tm.get("Executor Run Time", 0)
                    rec["gc_ms"] += tm.get("JVM GC Time", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    rec["shuffle_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                        "Local Bytes Read", 0
                    )
                    rec["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                    sw = tm.get("Shuffle Write Metrics") or {}
                    rec["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)

    agg: dict[str, dict] = {
        n: {
            "wall_s": walls[n],
            "n_jobs": 0,
            "n_stages": 0,
            "n_tasks": 0,
            "stage_wall_s": 0.0,
            "task_time_s": 0.0,
            "gc_s": 0.0,
            "shuffle_mb": 0.0,
            "fetch_wait_s": 0.0,
        }
        for n in names
    }
    jobs_per_query: dict[str, set] = {n: set() for n in names}
    for sid, rec in per_stage.items():
        jid = stage_job.get(sid)
        desc = job_desc.get(jid, "")
        if desc not in agg:
            continue
        a = agg[desc]
        jobs_per_query[desc].add(jid)
        a["n_stages"] += 1
        a["n_tasks"] += rec["n_tasks"]
        a["stage_wall_s"] += rec["wall_ms"] / 1e3
        a["task_time_s"] += rec["run_ms"] / 1e3
        a["gc_s"] += rec["gc_ms"] / 1e3
        a["shuffle_mb"] += (rec["shuffle_read"] + rec["shuffle_write"]) / 2 / 1e6
        a["fetch_wait_s"] += rec["fetch_wait_ms"] / 1e3
    for n in names:
        agg[n]["n_jobs"] = len(jobs_per_query[n])
        for k, v in agg[n].items():
            if isinstance(v, float):
                agg[n][k] = round(v, 3)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench",
        f"PROFILE_{tag}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(agg, fh, indent=1)
    hdr = f"{'query':32s} {'wall':>6s} {'jobs':>4s} {'stg':>4s} {'tasks':>5s} {'stgwall':>7s} {'taskt':>7s} {'gc':>5s} {'shufMB':>7s}"
    print(hdr)
    for n in names:
        a = agg[n]
        print(
            f"{n:32s} {a['wall_s']:6.2f} {a['n_jobs']:4d} {a['n_stages']:4d} {a['n_tasks']:5d}"
            f" {a['stage_wall_s']:7.2f} {a['task_time_s']:7.2f} {a['gc_s']:5.2f} {a['shuffle_mb']:7.2f}"
        )
    print(f"# -> {out}")


if __name__ == "__main__":
    main()
