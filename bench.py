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
import math
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


def calibrate() -> float:
    """Pure-python CPU microbenchmark (fixed work: hash 2M ints) run
    before and after the suite. Its wall time scales with ambient host
    load, so the reported ``noise_factor`` = measured / reference lets
    a reader normalize round-over-round medians taken on busy vs quiet
    hosts (BENCH.md documents 2-5x ambient noise; VERDICT r3 #8).
    Reference ≈ the quiet-host time of this loop on the round-1
    hardware."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc ^= hash((i, i >> 3))
    if acc == 42:  # keep the loop un-eliminable
        print("", end="")
    return time.perf_counter() - t0


# Quiet-host seconds for calibrate(): MEDIAN of 20 probe runs on the
# quietest observed host state (round 5, idle machine, raw samples
# committed in scripts/calibration_samples.json: median 0.3469,
# min 0.3242, max 0.727 — the max was the first, cache-cold, run).
# The emitted noise_factor is measured/REF (≈1.0 = quiet, >1 loaded).
# NB round ≤4 artifacts used the ESTIMATED REF 0.68 — multiply their
# noise_factor by 0.68/0.347 ≈ 1.96 to compare with round ≥5 values.
_CALIBRATE_REF_S = 0.347


def calibrate_spark(spark) -> float:
    """Fixed-work ALL-CORES Spark job (hash-agg over 200M synthetic
    rows). The python loop above measures single-core ambient load,
    but the headline queries run 32-way — executor-thread contention
    shows up here and not there. spark_noise_factor normalizes for
    it."""
    from pyspark.sql import functions as F  # local: bench imports stay light

    t0 = time.perf_counter()
    (
        spark.range(0, 200_000_000, 1, 64)
        .select((F.col("id") % 1_000_000).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum("c"))
        .collect()
    )
    return time.perf_counter() - t0


# Quiet-host seconds for calibrate_spark(): MEDIAN of 20 warm probe
# runs on the quietest observed host state (round 5, idle machine,
# raw samples in scripts/calibration_samples.json: median 5.0638,
# min 4.0206 — the 32-thread probe still sees 1.2-1.5x intra-run
# spread from scheduler jitter even idle, so the median, not the min,
# is the honest "quiet" expectation). Round ≤4 artifacts used the
# ESTIMATED REF 4.0 — multiply their spark_noise_factor by
# 4.0/5.064 ≈ 0.79 to compare with round ≥5 values.
_CALIBRATE_SPARK_REF_S = 5.064


def run_once(spark, builder, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    if df.isStreaming:  # pragma: no cover - streaming queries self-run
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _sf_of(sf_dir: str) -> float:
    return float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")


def scaling_curve(
    spark, registry, main_sf_dir: str, timings: dict[str, float]
) -> dict:
    """Empirical scaling exponents (VERDICT r4 #3): time each headline
    query at every on-disk SF below the main one and fit log(t) vs
    log(sf).  Two slopes are reported per query:

    - ``slope``: least-squares fit over all measured SFs.  At tiny SFs
      fixed per-query overhead (job scheduling, ~0.1-0.3 s) dominates,
      which biases this fit BELOW the true data-scaling exponent — a
      flat-looking slope is expected and fine.
    - ``slope_last``: the log-log slope of the LAST segment
      (sf0.01 → sf0.1), the least overhead-contaminated point pair and
      the one the >1.3 superlinear flag is judged on.  ≈1.0 = linear.

    A query whose candidate generation is accidentally quadratic in
    data size shows slope_last → 2 here even when every plan gate
    passes (output-size blowups are invisible to plan-shape checks)."""
    sibling_root = os.path.dirname(main_sf_dir.rstrip("/"))
    main_sf = _sf_of(main_sf_dir)
    lower = []
    for d in os.listdir(sibling_root):
        path = os.path.join(sibling_root, d)
        if not (d.startswith("sf") and os.path.isdir(path)):
            continue
        try:
            sf = _sf_of(path)
        except ValueError:
            continue  # stray dir like sf0.1_backup — not a scale factor
        if sf < main_sf:
            lower.append((sf, path))
    lower.sort()
    if not lower:
        return {}
    sfs = [s for s, _ in lower] + [main_sf]
    per_query: dict[str, dict] = {
        name: {"sec": []} for name in timings
    }
    for _, dir_ in lower:
        for name in per_query:
            # Per-QUERY warmup run (not just one q_agg_basic pass):
            # the first execution at a new SF dir pays parquet-footer
            # and plan costs for THAT query's tables; folding it into
            # a 2-run median would inflate the small-SF point and bias
            # slope_last low, weakening the >1.3 detector (review r5).
            run_once(spark, registry[name].builder, dir_)
            runs = [run_once(spark, registry[name].builder, dir_) for _ in range(2)]
            per_query[name]["sec"].append(round(statistics.median(runs), 3))
    flagged = []
    for name, rec in per_query.items():
        rec["sec"].append(timings[name])
        xs = [math.log10(s) for s in sfs]
        ys = [math.log10(max(t, 1e-3)) for t in rec["sec"]]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        rec["slope"] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 2
        )
        rec["slope_last"] = round(
            (ys[-1] - ys[-2]) / (xs[-1] - xs[-2]), 2
        )
        if rec["slope_last"] > 1.3:
            flagged.append(name)
    return {"sfs": sfs, "per_query": per_query, "flagged_superlinear": flagged}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    registry = load_all()
    spark = get_spark("bp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches.
    run_once(spark, registry["q_agg_basic"].builder, sf_dir)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cal_before = calibrate()
    scal_before = calibrate_spark(spark)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        runs = [run_once(spark, spec.builder, sf_dir) for _ in range(n_runs)]
        timings[name] = round(statistics.median(runs), 3)
        runs_str = "/".join(f"{r:.3f}" for r in runs)
        print(f"# {name}: median {timings[name]:.3f}s of [{runs_str}]", file=sys.stderr)

    scaling = (
        scaling_curve(spark, registry, sf_dir, timings)
        if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
        else {}
    )
    cal_after = calibrate()
    scal_after = calibrate_spark(spark)
    cal = statistics.median([cal_before, cal_after])
    scal = statistics.median([scal_before, scal_after])
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # Empirical scaling exponents across all on-disk SFs
                # below the main one (log-log slopes; see
                # scaling_curve docstring; slope_last > 1.3 flags
                # superlinear growth).
                "scaling": scaling,
                # Ambient-load calibration: pure-python fixed work run
                # before/after the suite; noise_factor ≈ 1.0 on a quiet
                # host, >1 when the host is loaded — divide `value` by
                # it to compare rounds taken under different load.
                "calibration_sec": round(cal, 3),
                "noise_factor": round(cal / _CALIBRATE_REF_S, 2),
                "spark_calibration_sec": round(scal, 3),
                "spark_noise_factor": round(scal / _CALIBRATE_SPARK_REF_S, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
