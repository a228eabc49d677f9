"""Storage-layout operators: multi-dimensional clustering keys.

A 100 TB table is pruned or scanned depending on how rows were LAID
OUT when written. Sorting by one column gives perfect min/max
row-group pruning on that column and none on any other; interleaving
the bits of several columns (Z-order / Morton curve — the technique
behind Delta/Iceberg `OPTIMIZE ZORDER BY`) gives every interleaved
dimension partial locality, so selective filters on ANY of them skip
most row groups. The engine exposes the key computation as a plain
column expression: `df.repartitionByRange(F.col("zkey")).sortWithin
Partitions("zkey").write...` is then a normal parquet write.

The reference has no storage layer at all (sink callbacks only,
batchprocessor-core/src/main/java/.../v2/BatchProcessor.java:24).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table

_Z_BITS = 16  # bits interleaved per dimension → 32-bit z-key


def zorder_key(a: Column, b: Column, bits: int = _Z_BITS) -> Column:
    """Morton-interleave the low `bits` of two non-negative integer
    columns: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Pure integer shift/mask arithmetic — JVM codegen, no UDF —
    and the identical expression exists in ANSI SQL for the oracle.

    Callers must pass values already inside [0, 2^bits) — q_layout_
    zorder min/max-normalizes each dimension into that domain first
    (see _norm_sql), because HIGH bits beyond `bits` are dropped here
    and un-normalized wide domains would alias distant values onto
    the same key, destroying the locality property."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft((F.shiftrightunsigned(a, i) % 2).cast("long"), 2 * i)
            + F.shiftleft((F.shiftrightunsigned(b, i) % 2).cast("long"), 2 * i + 1)
        )
    return acc


def _zorder_sql(a: str, b: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


# Min/max normalization of a dimension into the interleave domain
# [0, 2^16): rank-space scaling keeps the z-curve property at ANY
# input width (raw TPC-H custkey outgrows 16 bits past SF≈0.4).
def _norm_sql(col: str, lo: str, hi: str) -> str:
    return f"(({col} - {lo}) * 65535) // (CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END)"


_ZK = _zorder_sql("cust_n", "day_nn")


@register(
    "q_layout_zorder",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS day_n
      FROM orders),
    b AS (SELECT min(o_custkey) AS c_lo, max(o_custkey) AS c_hi,
                 min(day_n) AS d_lo, max(day_n) AS d_hi FROM t),
    normed AS (
      SELECT o_orderkey,
             {_norm_sql("o_custkey", "b.c_lo", "b.c_hi")} AS cust_n,
             {_norm_sql("day_n", "b.d_lo", "b.d_hi")} AS day_nn
      FROM t CROSS JOIN b),
    keyed AS (
      SELECT o_orderkey, cust_n, day_nn, {_ZK}::BIGINT AS zkey FROM normed),
    buckets AS (
      SELECT zkey // 65536 AS zbucket,
             count(*)::BIGINT AS n_rows,
             min(cust_n)::BIGINT AS cust_lo, max(cust_n)::BIGINT AS cust_hi,
             min(day_nn)::BIGINT AS day_lo, max(day_nn)::BIGINT AS day_hi
      FROM keyed GROUP BY 1)
    SELECT zbucket, n_rows, cust_lo, cust_hi, day_lo, day_hi
    FROM buckets
    """,
    category="scan",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order day) plus
    the per-z-bucket min/max envelope of BOTH dimensions — exactly the
    row-group statistics a reader would prune with after writing the
    table sorted by zkey. Each bucket's bounded cust AND day ranges
    are the point: a filter on either column alone skips most buckets,
    which a single-column sort only achieves for its own column.

    Each dimension is min/max-normalized into the 16-bit interleave
    domain first (a 1-row bounds aggregate, broadcast back), so the
    locality guarantee is input-width-independent — raw custkey
    outgrows 16 bits past SF≈0.4 and un-normalized interleaving would
    silently alias distant keys. Envelopes are reported in normalized
    units: every bucket bounds BOTH dims to ≤255 of 65536 by
    construction (tests/test_layout.py).

    Scale posture: the key is a narrow shift/mask projection after a
    1-row broadcast (one map stage, fully codegen'd); the layout
    write is then repartitionByRange(zkey) + sortWithinPartitions —
    one range exchange, the same cost as any sorted write. The
    bucket-envelope report here is a tiny aggregate standing in for
    parquet's own footer stats.
    """
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "day_n"
        ),
    )
    b = t.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min("day_n").alias("d_lo"),
        F.max("day_n").alias("d_hi"),
    )

    def norm(col, lo, hi):
        # integer div, not float-divide-and-cast: the double quotient
        # can land exactly on the next integer at multiples of the
        # span, where truncation would disagree with the oracle's
        # integer floor division
        return F.expr(
            f"(({col} - {lo}) * 65535) div "
            f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END)"
        )

    normed = t.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        norm("o_custkey", "c_lo", "c_hi").alias("cust_n"),
        norm("day_n", "d_lo", "d_hi").alias("day_nn"),
    )
    keyed = normed.withColumn(
        "zkey", zorder_key(F.col("cust_n").cast("int"), F.col("day_nn").cast("int"))
    )
    return (
        keyed.groupBy((F.col("zkey") / 65536).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cust_n").alias("cust_lo"),
            F.max("cust_n").alias("cust_hi"),
            F.min("day_nn").alias("day_lo"),
            F.max("day_nn").alias("day_hi"),
        )
    )


_SKIP_SCRATCH: dict[str, str] = {}


@register(
    "q_layout_sorted_skipping",
    oracle="""
    WITH m AS (
      SELECT count(*)::BIGINT AS n_rows,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents,
             count(DISTINCT o_orderkey % 8)::BIGINT AS buckets_hit
      FROM orders
      WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01')
    SELECT 'clustered' AS layout,
           least(n_rows, 1)::BIGINT AS units_hit,
           FALSE AS reads_multiple_units,
           n_rows, cents FROM m
    UNION ALL
    SELECT 'shuffled', buckets_hit, buckets_hit > 1, n_rows, cents FROM m
    """,
    category="scan",
)
def q_layout_sorted_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping via clustered file layout — the third physical-
    design lever beside hive partitioning (q_layout_partition_pruned)
    and Z-ordering (q_layout_zorder), and the one every lakehouse
    table format leans on: write the fact RANGE-CLUSTERED on the
    filter column (repartitionByRange(8, month) → 8 files with
    disjoint month ranges, parquet footer min/max tight) vs
    SCATTERED across 8 explicit key buckets (o_orderkey % 8, one
    hive dir each), then read both under the same one-month
    predicate and account which storage units actually contribute
    rows. The clustered layout touches exactly 1 unit; the scattered
    one touches every bucket the month's keys map to (all 8 at any
    realistic density) — at 100 TB that is the difference between
    scanning ~1/8th of the table (footer stats skip whole row
    groups) and scanning everything.

    Determinism (ADVICE r8 — the previous contract hard-coded the
    shuffled lane's boolean TRUE and would break on a sparse month
    whose keys all hash into one bucket): every hash-checked column
    is now oracle-computable at ANY corpus. Range partitioning
    assigns the single filter month to exactly ONE partition, so the
    clustered lane's units_hit is provably least(n_rows, 1) and its
    reads_multiple_units provably FALSE; the scattered lane's unit
    is the EXPLICIT bucket o_orderkey % 8 (a hive partition dir, not
    a murmur3 accident), so units_hit = count(DISTINCT o_orderkey
    % 8) over the month on both engines. The physical 1-of-8 vs
    8-of-8 file accounting still pins in
    tests/test_plans.py::test_layout_sorted_skipping_file_counts at
    the parity SF, and the sparse-month regime pins in
    tests/test_oracle_edgecases.py.

    Scale posture: one repartitionByRange write (the sort is
    per-partition, no global single-task sort), filter pushdown
    reaches both scans (gated), the audit aggregate is 2 rows.
    Scratch copies live in process-scoped scratch_dir.

    Reference scope: the reference engine has no storage-layout
    surface; this extends SURVEY.md §2.4's layout family.
    """
    import os

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr(
            "(year(o_orderdate) * 12 + month(o_orderdate))"
        ).alias("month_no"),
    )
    # One scratch dir PER SOURCE for the process lifetime: a fresh
    # mkdtemp per call would make the _SUCCESS cache guards below dead
    # code and rewrite both layouts on every bench/parity invocation.
    base = _SKIP_SCRATCH.get(sf_dir)
    if base is None:
        from batchprocessor_spark.scratch import scratch_dir

        base = _SKIP_SCRATCH[sf_dir] = scratch_dir("bp_skip_")
    clustered = os.path.join(base, "clustered")
    shuffled = os.path.join(base, "shuffled")
    if not os.path.exists(os.path.join(clustered, "_SUCCESS")):
        o.repartitionByRange(8, "month_no").sortWithinPartitions(
            "month_no", "o_orderkey"
        ).write.mode("overwrite").parquet(clustered)
    if not os.path.exists(os.path.join(shuffled, "_SUCCESS")):
        # One shuffle on the bucket column first so each hive dir is
        # written by exactly one task (1 file per bucket dir).
        o.withColumn("bucket", F.expr("o_orderkey % 8")).repartition(
            8, "bucket"
        ).write.partitionBy("bucket").mode("overwrite").parquet(shuffled)

    month = (F.col("o_orderdate") >= "1995-03-01") & (
        F.col("o_orderdate") < "1995-04-01"
    )
    clu = (
        spark.read.parquet(clustered)
        .where(month)
        .select("cents", F.input_file_name().alias("fn"))
        .agg(
            F.lit("clustered").alias("layout"),
            F.count_distinct("fn").cast("long").alias("units_hit"),
            (F.count_distinct("fn") > 1).alias("reads_multiple_units"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    shu = (
        spark.read.parquet(shuffled)
        .where(month)
        .select("cents", "bucket")
        .agg(
            F.lit("shuffled").alias("layout"),
            F.count_distinct("bucket").cast("long").alias("units_hit"),
            (F.count_distinct("bucket") > 1).alias("reads_multiple_units"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    cols = ["layout", "units_hit", "reads_multiple_units", "n_rows", "cents"]
    return clu.select(cols).unionAll(shu.select(cols))
