"""Aggregation operators (SURVEY.md §2.2): hash aggregates, distinct,
approximate sketches, rollup/cube/grouping sets.

Float discipline: every float aggregate is rounded IN the query (both
Spark and oracle sides) because summation order differs across engines
and even across Spark runs (partial aggregation); rounded decimals are
bit-stable. Count columns stay BIGINT on both sides.

Scale: all of these are map-side partial aggregates + one shuffle on
the grouping key (`HashAggregate` → `Exchange` → `HashAggregate` in
the plan). No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table, register_views


@register(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity::DECIMAL(12,2))::DOUBLE AS sum_qty,
           sum(l_extendedprice::DECIMAL(12,2))::DOUBLE AS sum_base_price,
           round(sum((l_extendedprice::DECIMAL(12,2)
                * ((1 - l_discount::DECIMAL(8,6))::DECIMAL(8,6)))::DECIMAL(24,8)), 4)::DOUBLE
             AS sum_disc_price,
           round(sum((l_extendedprice::DECIMAL(12,2)
                * ((1 - l_discount::DECIMAL(8,6))::DECIMAL(8,6)))::DECIMAL(24,8)
               * ((1 + l_tax::DECIMAL(8,6))::DECIMAL(8,6))), 4)::DOUBLE AS sum_charge,
           (sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*)) AS avg_qty,
           (sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / count(*)) AS avg_price,
           (sum(l_discount::DECIMAL(8,6))::DOUBLE / count(*)) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregate",
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary aggregate (TPC-H Q1 shape): filter →
    hash agg over 2 low-cardinality keys → sum/avg/count. One scan,
    one tiny shuffle of partial aggregates.

    Float discipline: sums run over DECIMAL casts (exact, order-
    independent — double summation order varies across partial
    aggregation runs) and convert to DOUBLE only at the end; averages
    are exact-sum / count so both engines divide identical doubles.
    """
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,6)")
    one_minus_disc = (F.lit(1).cast("decimal(8,6)") - disc).cast("decimal(8,6)")
    one_plus_tax = (
        F.lit(1).cast("decimal(8,6)") + F.col("l_tax").cast("decimal(8,6)")
    ).cast("decimal(8,6)")
    # Exact (non-rounding) width-control casts keep both engines inside
    # their 128-bit decimal lanes with identical scales.
    disc_price = (price * one_minus_disc).cast("decimal(24,8)")
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # Round the exact decimal to scale 4 BEFORE the double cast:
            # DuckDB's wide-decimal→double conversion (int128 / 10^14)
            # is not correctly rounded, but a scale-4 numerator fits in
            # 2^53 so both engines convert exactly.
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * one_plus_tax), 4).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)::BIGINT AS distinct_parts,
           count(DISTINCT l_suppkey)::BIGINT AS distinct_supps,
           count(*)::BIGINT AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT (Catalyst expands to a two-phase
    expand + aggregate plan; exact, shuffle on grouping key)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register("q_agg_approx", oracle=None, category="aggregate")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++). Sketch results are
    engine-specific, so the driver records a rows-only check; the
    companion pytest asserts the estimate is within 5% of exact."""
    pcts = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.03).alias("approx_parts"),
            # accuracy 1000 ≈ 0.1% rank error — plenty, and ~10× less
            # memory/merge cost than the 10000 default-ish setting.  One
            # sketch pass, unpacked to scalar columns (array columns choke
            # order-insensitive result canonicalizers downstream).
            F.element_at(pcts, 1).alias("p50_price"),
            F.element_at(pcts, 2).alias("p95_price"),
        )
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           round(median(l_quantity), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance, correlation,
    covariance, exact median and interpolated percentile."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 2).alias("p90_price"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments,
           arg_max(c_custkey, c_acctbal) AS richest_cust,
           arg_min(c_custkey, c_acctbal) AS poorest_cust,
           count(*)::BIGINT AS cnt
    FROM customer
    GROUP BY c_nationkey
    """,
    category="aggregate",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection + argmax aggregates: distinct-set-to-string (sorted
    for determinism), max_by/min_by. NB arg_max ties: c_acctbal values
    are distinct per nation in the fixture; a production query adds a
    tie-break."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.max_by("c_custkey", "c_acctbal").alias("richest_cust"),
        F.min_by("c_custkey", "c_acctbal").alias("poorest_cust"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           coalesce(count(*) FILTER (WHERE l_linestatus = 'F'), 0)::BIGINT AS status_f,
           coalesce(count(*) FILTER (WHERE l_linestatus = 'O'), 0)::BIGINT AS status_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (cross-tab): line counts by returnflag × linestatus with
    an explicit pivot-value list (required at scale — value discovery
    is an extra job)."""
    l = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)::BIGINT AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    category="aggregate",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (priority, status), (priority), ()."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)::BIGINT AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    category="aggregate",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations of (priority, status)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q_agg_gsets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)::BIGINT AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    category="aggregate",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint subtotals, no cross product)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS cnt,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


_HIST_LO, _HIST_HI, _HIST_BUCKETS = 0, 600, 12


@register(
    "q_agg_histogram",
    oracle=f"""
    WITH b AS (
      SELECT least(greatest(((n_chars - {_HIST_LO}) * {_HIST_BUCKETS})
                            // ({_HIST_HI} - {_HIST_LO}), 0),
                   {_HIST_BUCKETS} - 1) AS bucket,
             n_chars, lang
      FROM documents)
    SELECT bucket::INT AS bucket,
           (bucket * ({_HIST_HI} - {_HIST_LO}) // {_HIST_BUCKETS})::BIGINT AS lo,
           ((bucket + 1) * ({_HIST_HI} - {_HIST_LO}) // {_HIST_BUCKETS})::BIGINT AS hi,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT lang)::BIGINT AS n_langs
    FROM b GROUP BY bucket
    """,
    category="aggregate",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram of document lengths (12 equal-width
    buckets over [0, 600), clamped at the edges) — the
    distribution-profiling pass run before setting quality-filter
    thresholds. Bucketing is a narrow arithmetic map (no sampling, no
    sort); the aggregate shuffles only ``buckets`` rows per partition,
    so cost at 100 TB is one scan + a constant-size exchange."""
    d = load_table(spark, sf_dir, "documents")
    width_num, width_den = _HIST_HI - _HIST_LO, _HIST_BUCKETS
    bucket = F.least(
        F.greatest(
            ((F.col("n_chars") - _HIST_LO) * width_den).cast("long")
            / F.lit(width_num).cast("long"),
            F.lit(0).cast("double"),
        ),
        F.lit(width_den - 1).cast("double"),
    )
    bucket = F.floor(bucket).cast("int")
    return (
        d.select(bucket.alias("bucket"), "lang")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("long") * width_num / width_den)
            .cast("long")
            .alias("lo"),
            ((F.col("bucket") + 1).cast("long") * width_num / width_den)
            .cast("long")
            .alias("hi"),
            "n_docs",
            "n_langs",
        )
    )
