#!/usr/bin/env python
"""Memory-pressure parity check (VERDICT r4 #7): run the widest
aggregation states — q_agg_bitmap_distinct (per-bucket roaring
bitmaps) and q_llm_dedup_minhash (the 64-hash signature fold + band
join) — at sf0.1 in a JVM clamped far below the comfortable working
set, and verify the results still hash-match DuckDB.

The 128 GiB dev sandbox never exercises spill paths; this does. The
clamp: 1 GiB driver heap (local mode = driver+executor combined) and
spark.memory.fraction=0.2 (≈200 MiB unified execution+storage memory),
which forces hash-aggregate fallback to sort/spill for the multi-MB
per-group sketch states. Completion + parity proves the operators'
correctness does not depend on everything fitting in memory — the
property the 100 TB posture rests on.

Must run in a FRESH process (driver memory is fixed at JVM launch):
    python -m scripts.spill_check           # exits 0 on parity
Invoked by tests/test_spill.py (@slow) via subprocess.
"""

from __future__ import annotations

import os
import sys

# The clamp must be in place BEFORE the JVM starts.
os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get("BP_SPILL_MEM", "1g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["q_agg_bitmap_distinct", "q_llm_dedup_minhash"]
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_BIG", "/root/testdata/sf0.1")


def main() -> int:
    from batchprocessor_spark.plans.registry import load_all
    from batchprocessor_spark.session import get_spark
    from tests.oracle import canonical_rows, duckdb_run

    registry = load_all()
    spark = get_spark(
        "bp-spill-check",
        cpus=8,
        shuffle_partitions=8,
        extra={
            # ~20% of the 1 GiB heap for unified memory: execution
            # must spill instead of holding sketch state resident.
            "spark.memory.fraction": "0.2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for name in QUERIES:
        spec = registry[name]
        spark_pdf = spec.builder(spark, SF_DIR).toPandas()
        oracle_pdf = duckdb_run(spec.oracle, SF_DIR)
        match = (
            len(spark_pdf) == len(oracle_pdf)
            and sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
            and canonical_rows(spark_pdf) == canonical_rows(oracle_pdf)
        )
        print(f"{'PASS' if match else 'FAIL'} {name} rows={len(spark_pdf)}", flush=True)
        ok = ok and match
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
