#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into a noop sink (full plan runs, no
driver collect cost). A warmup run of the flagship query absorbs JVM/
codegen startup so timings reflect steady-state execution. Each query
runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the MEDIAN,
damping the 2-5x shared-host noise documented in BENCH.md so rounds
are comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.session import get_spark

# Headline set: one representative per operator family (scan, joins,
# aggregates, windows, sort, dedup, similarity, text, timeseries).
HEADLINE = [
    "q_agg_basic",
    "q_filter_pred",
    "q_join_inner_broadcast",
    "q_join_inner_sortmerge",
    "q_join_asof",
    "q_join_multiway",
    "q_agg_rollup",
    "q_win_rank",
    "q_win_frame",
    "q_topk_per_group",
    "q_sort_limit",
    "q_dedup_exact",
    "q_llm_dedup_minhash",
    "q_llm_simsearch_topk",
    "q_llm_text_stats",
    "q_llm_quality_filter",
    "q_fn_json",
    "q_win_tumbling",
    "q_win_session",
]


def run_once(spark, builder, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    if df.isStreaming:  # pragma: no cover - streaming queries self-run
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    registry = load_all()
    spark = get_spark("bp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches.
    run_once(spark, registry["q_agg_basic"].builder, sf_dir)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        runs = [run_once(spark, spec.builder, sf_dir) for _ in range(n_runs)]
        timings[name] = round(statistics.median(runs), 3)
        runs_str = "/".join(f"{r:.3f}" for r in runs)
        print(f"# {name}: median {timings[name]:.3f}s of [{runs_str}]", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
