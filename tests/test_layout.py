"""Z-order layout guarantees (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_zorder_buckets_bound_both_dimensions(spark):
    """zbucket = zkey >> 16 pins bits 8..15 of BOTH interleaved
    dimensions, so inside any bucket each dimension can vary only in
    its low 8 bits: span <= 255 — for every bucket, by construction,
    not on average. This is the two-sided locality a single-column
    sort cannot give and the reason a z-laid-out table prunes on
    either filter column."""
    rows = REGISTRY["q_layout_zorder"].builder(spark, SF_ORACLE).collect()
    assert rows, "zorder report should be non-empty"
    for r in rows:
        assert r.cust_hi - r.cust_lo <= 255, r
        assert r.day_hi - r.day_lo <= 255, r


def test_zorder_key_is_bijective_interleave(spark):
    """Distinct (custkey, day) pairs must map to distinct z-keys
    (Morton interleave is a bijection on 16-bit pairs)."""
    from batchprocessor_spark.operators.layout import zorder_key
    from batchprocessor_spark.sources.catalog import load_table

    t = load_table(spark, SF_ORACLE, "orders").select(
        F.col("o_custkey").cast("int").alias("a"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("int")
        .alias("b"),
    )
    keyed = t.distinct().withColumn("z", zorder_key(F.col("a"), F.col("b")))
    n_pairs = keyed.count()
    n_keys = keyed.select("z").distinct().count()
    assert n_pairs == n_keys


def test_sorted_write_produces_disjoint_minmax_ranges(spark):
    """Range-partitioned + sorted writes yield per-file o_orderdate
    min/max ranges that are mutually DISJOINT (each file's min is at
    or past the previous file's max), while a hash-shuffled write
    makes every file span essentially the whole date range — the
    difference between a min/max-stats scan pruning to 1/k of the
    files for a date predicate and pruning nothing. This is the
    layout half of the pruning story that q_layout_partition_pruned
    (directory pruning) and q_layout_zorder (multi-dim locality)
    already pin."""
    import glob

    import pyarrow.parquet as pq

    from batchprocessor_spark.scratch import scratch_dir

    o = (
        load_all()["q_scan_project"]
        .builder(spark, SF_ORACLE)
        .sparkSession.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
    )
    loc = scratch_dir("bp_sorted_")
    o.repartition(8).write.mode("overwrite").parquet(f"{loc}/unsorted")
    (
        o.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(f"{loc}/sorted")
    )

    def ranges(path):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(1)
                st = col.statistics
                assert st is not None and st.has_min_max
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out.append((lo, hi))
        return sorted(out)

    srt = ranges(f"{loc}/sorted")
    uns = ranges(f"{loc}/unsorted")
    assert len(srt) == 8 and len(uns) == 8

    def overlap_count(rs):
        return sum(1 for (a, b), (c, d) in zip(rs, rs[1:]) if c < b)

    # Sorted layout: zero overlapping neighbor ranges (range
    # partitioner boundaries are exact — a file starts where the
    # previous ended or later).
    assert overlap_count(srt) == 0, srt
    # Hash layout: every neighbor pair overlaps (each file spans
    # nearly the full two-year range).
    assert overlap_count(uns) == 7, uns
    # And the pruning payoff: a one-month predicate touches exactly
    # the files whose range intersects it.
    lo = min(r[0] for r in srt)
    hi = max(r[1] for r in srt)
    span = hi - lo
    probe_lo, probe_hi = lo, lo + span // 12
    touched_sorted = sum(1 for a, b in srt if a <= probe_hi and b >= probe_lo)
    touched_unsorted = sum(1 for a, b in uns if a <= probe_hi and b >= probe_lo)
    assert touched_sorted <= 2, srt
    assert touched_unsorted == 8, uns
