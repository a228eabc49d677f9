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

from batchprocessor_spark.functions.exactmath import (
    dec_sum,
    descale,
    sql_descale,
    sql_units,
    to_units,
)
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table, register_views
from batchprocessor_spark.session import materialize


@register(
    "q_agg_basic",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
             sum(round(l_quantity)::BIGINT) AS sq,
             sum(round(l_extendedprice * 100)::BIGINT) AS sp,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) AS sdp,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)
                 * (100 + round(l_tax * 100)::BIGINT)) AS sch,
             sum(round(l_discount * 100)::BIGINT) AS sd,
             count(*)::BIGINT AS cnt
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus,
           sq::DOUBLE AS sum_qty,
           (sp // 100)::DOUBLE + (sp % 100)::DOUBLE / 100 AS sum_base_price,
           (sdp // 10000)::DOUBLE + (sdp % 10000)::DOUBLE / 10000 AS sum_disc_price,
           (sch // 1000000)::DOUBLE + (sch % 1000000)::DOUBLE / 1000000 AS sum_charge,
           sq::DOUBLE / cnt AS avg_qty,
           ((sp // 100)::DOUBLE + (sp % 100)::DOUBLE / 100) / cnt AS avg_price,
           (sd::DOUBLE / 100) / cnt AS avg_disc,
           cnt AS count_order
    FROM s
    """,
    category="aggregate",
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary aggregate (TPC-H Q1 shape): filter →
    hash agg over 2 low-cardinality keys → sum/avg/count. One scan,
    one tiny shuffle of partial aggregates.

    Float discipline, fast-lane edition: the monetary columns carry at
    most 2 decimals and quantities are integral (asserted by
    tests/test_oracle_parity.py), so every per-row product is EXACT
    64-bit integer arithmetic in scaled units (cents, 1e-4 and 1e-6
    dollars) — full codegen speed, no per-row 128-bit decimal ops
    (which made this query ~1.8× slower). Only the accumulators are
    decimal(38,0) so group sums cannot overflow at 100 TB (~1e22 in
    1e-6-dollar units vs a long max of 9.2e18). The final per-GROUP
    descale uses integer DIV/MOD so the double conversion is exact on
    both engines (no wide-decimal→double rounding, which DuckDB gets
    wrong)."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_p = F.round(F.col("l_discount") * 100).cast("long")
    tax_p = F.round(F.col("l_tax") * 100).cast("long")
    # Per-row max ≈ 1e7 cents × 200 × 200 ≈ 4e11 — comfortably in long.
    dp = price_c * (100 - disc_p)
    ch = dp * (100 + tax_p)
    cnt = F.count(F.lit(1))

    def descale(col: str, unit: int):
        """Exact sum/unit as double: integer quotient + small remainder,
        each < 2^53, converted and added with identical IEEE ops on
        both engines."""
        return F.expr(f"CAST({col} DIV {unit} AS DOUBLE)") + F.expr(
            f"CAST({col} % {unit} AS DOUBLE)"
        ) / F.lit(unit)

    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sq"),
            F.sum(price_c.cast("decimal(38,0)")).alias("sp"),
            F.sum(dp.cast("decimal(38,0)")).alias("sdp"),
            F.sum(ch.cast("decimal(38,0)")).alias("sch"),
            F.sum(disc_p).alias("sd"),
            cnt.alias("cnt"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sq").cast("double").alias("sum_qty"),
            descale("sp", 100).alias("sum_base_price"),
            descale("sdp", 10000).alias("sum_disc_price"),
            descale("sch", 1000000).alias("sum_charge"),
            (F.col("sq").cast("double") / F.col("cnt")).alias("avg_qty"),
            (descale("sp", 100) / F.col("cnt")).alias("avg_price"),
            (F.col("sd").cast("double") / 100 / F.col("cnt")).alias("avg_disc"),
            F.col("cnt").alias("count_order"),
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


@register(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)::BIGINT AS distinct_parts,
           TRUE AS approx_ok,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
           TRUE AS pct_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++) + approx_percentile
    (KLL-style rank sketch). The sketch ESTIMATES are engine-specific,
    so — like q_agg_hll_rollup / q_agg_approx_pct — the DERIVED
    projection carries the value oracle: exact distinct counts and
    exact interpolated percentiles are the checked columns, and the
    sketch estimates fold into boolean in-bounds flags (HLL within its
    configured 2×rsd; percentile estimates within a ±2%-rank value
    band around the exact quantile). The oracle emits literal TRUE for
    both flags, so a drifting sketch breaks the driver hash instead of
    hiding behind a rows-only check. The companion pytest additionally
    pins the raw HLL estimate within 5% of exact."""
    pcts = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
    # ±2%-rank band expressed in value space: exact quantiles at
    # p−0.02 / p+0.02 bound the admissible estimate. accuracy=1000
    # gives ≈0.1% rank error, so the band is ~20× slack — the flag
    # catches a broken sketch, not benign implementation drift.
    #
    # r12 (guide §1.2 "per-task work"): ONE exact-percentile buffer
    # for all six quantiles. The old spelling used THREE independent
    # `percentile` aggregates (bounds array, p50, p95), each of which
    # buffers and sorts every group value separately; per-quantile
    # interpolation is independent, so one six-quantile call returns
    # identical values with a third of the buffering (4.6 → 3.7 s
    # interleaved at sf0.1).
    allq = F.expr(
        "percentile(l_extendedprice, array(0.5, 0.95, 0.48, 0.52, 0.93, 0.97))"
    )
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.03).alias("_approx"),
            F.element_at(pcts, 1).alias("_a50"),
            F.element_at(pcts, 2).alias("_a95"),
            allq.alias("_q"),
        )
    )
    return agg.select(
        "l_returnflag",
        "distinct_parts",
        (
            F.abs(F.col("_approx") - F.col("distinct_parts"))
            <= 0.06 * F.col("distinct_parts")  # 2× the configured rsd
        ).alias("approx_ok"),
        F.round(F.element_at("_q", 1), 2).alias("p50_price"),
        F.round(F.element_at("_q", 2), 2).alias("p95_price"),
        (
            F.col("_a50").between(F.element_at("_q", 3), F.element_at("_q", 4))
            & F.col("_a95").between(F.element_at("_q", 5), F.element_at("_q", 6))
        ).alias("pct_ok"),
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
           max({'a': c_acctbal, 'k': c_custkey}).k AS richest_cust,
           min({'a': c_acctbal, 'k': c_custkey}).k AS poorest_cust,
           count(*)::BIGINT AS cnt
    FROM customer
    GROUP BY c_nationkey
    """,
    category="aggregate",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection + argmax aggregates: distinct-set-to-string (sorted
    for determinism), and argmax/argmin spelled as max/min over an
    (acctbal, custkey) STRUCT so acctbal ties break deterministically
    on custkey — both engines compare structs lexicographically.
    (Round 10: the sf1 fixture's key-shifted copies repeat every
    acctbal 10× per nation, which made the bare arg_max
    tie-dependent — exactly the production hazard the old docstring
    deferred.)"""
    c = load_table(spark, sf_dir, "customer")
    by = F.struct(F.col("c_acctbal").alias("a"), F.col("c_custkey").alias("k"))
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.max(by)["k"].alias("richest_cust"),
        F.min(by)["k"].alias("poorest_cust"),
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
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority, o_orderstatus,
             count(*)::BIGINT AS cnt,
             sum({sql_units("o_totalprice", 100)}) AS sp
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus))
    SELECT o_orderpriority, o_orderstatus, cnt,
           {sql_descale("sp", 100)} AS total
    FROM s
    """,
    category="aggregate",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (priority, status), (priority), ().
    Totals in the exact cents lane (functions/exactmath.py) — the
    grand-total row sums every order, exactly where double summation
    order noise is largest."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("o_totalprice"), 100)).alias("sp"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "cnt",
            descale("sp", 100).alias("total"),
        )
    )


@register(
    "q_agg_cube",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority, o_orderstatus,
             count(*)::BIGINT AS cnt,
             sum({sql_units("o_totalprice", 100)}) AS sp
      FROM orders
      GROUP BY CUBE (o_orderpriority, o_orderstatus))
    SELECT o_orderpriority, o_orderstatus, cnt,
           {sql_descale("sp", 100)} AS total
    FROM s
    """,
    category="aggregate",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations of (priority, status); totals in
    the exact cents lane."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("o_totalprice"), 100)).alias("sp"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "cnt",
            descale("sp", 100).alias("total"),
        )
    )


@register(
    "q_agg_gsets",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority, o_orderstatus,
             count(*)::BIGINT AS cnt,
             sum({sql_units("o_totalprice", 100)}) AS sp
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()))
    SELECT o_orderpriority, o_orderstatus, cnt,
           ({sql_descale("sp", 100)}) / cnt AS avg_price
    FROM s
    """,
    category="aggregate",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint subtotals, no cross product).
    avg = exact-cents sum / count: both engines divide identical
    doubles, so no round() is needed at all."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, cnt,
               (CAST(sp DIV 100 AS DOUBLE) + CAST(sp % 100 AS DOUBLE) / 100)
                 / cnt AS avg_price
        FROM (
          SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
                 sum(CAST(CAST(round(o_totalprice * 100) AS LONG)
                          AS DECIMAL(38,0))) AS sp
          FROM orders
          GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        )
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


@register(
    "q_agg_unpivot",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity)::BIGINT AS sum_qty
    FROM lineitem
    WHERE l_linestatus IN ('F', 'O')
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregate",
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide pivot table back to long form via
    ``DataFrame.unpivot`` — the inverse pair to q_agg_pivot. Null
    cells (absent combinations) are dropped so the long form equals
    the direct GROUP BY.

    Scale: the wide input here is the already-aggregated tiny table,
    so unpivot is a constant-size Expand node; unpivoting a 100 TB
    fact (columns -> rows) is likewise a narrow per-row Expand with no
    shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    wide = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity").cast("long"))
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["F", "O"],
            variableColumnName="l_linestatus",
            valueColumnName="sum_qty",
        )
        .where(F.col("sum_qty").isNotNull())
    )


_SEL_BUCKETS = 1024  # histogram width per selection round


def exact_kth_units(
    df: DataFrame, group: str, units: str, ks: dict, group_type: str = "STRING"
) -> dict:
    """Exact k-th smallest of an integer column per group WITHOUT a
    sort and WITHOUT buffering values — iterative histogram selection:
    each round one map-side-combined aggregate histograms every live
    (group, target) search range into _SEL_BUCKETS buckets, the driver
    walks the (tiny) histogram to find the bucket containing the k-th
    value, and the range narrows by ~1024× — so a 2^31-wide domain
    resolves in 3-4 passes over the data with only
    O(groups × targets × buckets) ever reaching the driver.

    This is the 100 TB shape for exact order statistics: Spark's
    built-in `percentile` buffers every value per group in the
    aggregation state (fine at fixture scale, OOM at warehouse
    scale); selection never holds more than a histogram.

    ``ks``: {(group_value, target_id): k (1-based rank)} →
    returns {(group_value, target_id): exact value}. ``group_type``
    is the SQL type of the group column for the broadcast state
    frame. Raises ValueError up front for a group value absent from
    ``df`` or a rank beyond the group's row count (a silent drop here
    would surface as a distant KeyError in the caller).
    """
    spark = df.sparkSession
    bounds = {
        r[0]: (r["lo"], r["hi"], r["n"])
        for r in df.groupBy(group)
        .agg(
            F.min(units).alias("lo"),
            F.max(units).alias("hi"),
            F.count(units).alias("n"),
        )
        .collect()
    }
    bad = [
        (gv, tid, k)
        for (gv, tid), k in ks.items()
        if gv not in bounds or not (1 <= k <= bounds[gv][2])
    ]
    if bad:
        raise ValueError(f"rank targets outside their group's rows: {bad}")
    state = {
        (gv, tid): {"lo": bounds[gv][0], "hi": bounds[gv][1], "k": k}
        for (gv, tid), k in ks.items()
    }
    out: dict = {}
    while state:
        # Broadcast the live search ranges; ONE pass histograms all.
        st_rows = [
            (gv, tid, s["lo"], s["hi"], max(1, (s["hi"] - s["lo"]) // _SEL_BUCKETS + 1))
            for (gv, tid), s in state.items()
        ]
        st = spark.createDataFrame(
            st_rows, f"{group} {group_type}, tid INT, lo BIGINT, hi BIGINT, w BIGINT"
        )
        hist = (
            df.join(F.broadcast(st), group)
            .where(F.col(units).between(F.col("lo"), F.col("hi")))
            .groupBy(
                group,
                "tid",
                ((F.col(units) - F.col("lo")) / F.col("w")).cast("long").alias("b"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_key: dict = {}
        for r in hist:
            by_key.setdefault((r[0], r["tid"]), {})[r["b"]] = r["c"]
        nxt = {}
        for (gv, tid), s in state.items():
            w = max(1, (s["hi"] - s["lo"]) // _SEL_BUCKETS + 1)
            cum, k = 0, s["k"]
            for b in sorted(by_key.get((gv, tid), {})):
                c = by_key[(gv, tid)][b]
                if cum + c >= k:
                    lo = s["lo"] + b * w
                    hi = min(s["hi"], s["lo"] + (b + 1) * w - 1)
                    if lo == hi:
                        out[(gv, tid)] = lo
                    else:
                        nxt[(gv, tid)] = {"lo": lo, "hi": hi, "k": k - cum}
                    break
                cum += c
        state = nxt
    return out


@register(
    "q_agg_median_distributed",
    oracle="""
    SELECT l_returnflag,
           count(*)::BIGINT AS n,
           quantile_cont(round(l_extendedprice * 100)::BIGINT, 0.5)
             AS median_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median by distributed selection (iterative
    histogram narrowing) rather than sort or value buffering — the
    order-statistics algorithm that still works when one group holds
    10^11 rows. Finds both middle order statistics in the same
    passes and interpolates, matching quantile_cont(0.5) exactly
    (integer cents make the midpoint average representable).

    Scale posture: ceil(log1024(range)) ≈ 3 full passes, each ONE
    map-side-combined histogram aggregate (the driver only ever sees
    groups × 1024 counters); compare Spark's `percentile`, whose
    aggregation buffer holds every value of the group. The same
    kernel generalizes to any exact quantile set by seeding more
    (group, rank) targets — extra targets share the same passes.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", to_units(F.col("l_extendedprice"), 100).alias("cents")
    )
    counts = {r[0]: r[1] for r in l.groupBy("l_returnflag").count().collect()}
    ks = {}
    for gv, n in counts.items():
        ks[(gv, 1)] = (n + 1) // 2
        ks[(gv, 2)] = (n + 2) // 2
    vals = exact_kth_units(l, "l_returnflag", "cents", ks)
    rows = [
        (gv, counts[gv], (vals[(gv, 1)] + vals[(gv, 2)]) / 2.0)
        for gv in sorted(counts)
    ]
    return spark.createDataFrame(
        rows, "l_returnflag STRING, n BIGINT, median_cents DOUBLE"
    )


@register(
    "q_agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(user_id)::BIGINT AS all_bits,
           bit_or(user_id)::BIGINT AS any_bits,
           bit_xor(event_id)::BIGINT AS xor_fingerprint,
           count(*)::BIGINT AS n
    FROM events GROUP BY event_type
    """,
    category="aggregate",
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) per
    group. bit_xor is the load-bearing one at scale: it is an
    order-insensitive, overflow-free set fingerprint — the engine's
    connected-components fixpoint detector and any
    compare-two-table-snapshots check use exactly this (a SUM of
    hashes trips ANSI overflow; XOR cannot). All three are
    associative-commutative, so map-side partials are exact under any
    AQE re-split."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("bit_and(user_id)").alias("all_bits"),
        F.expr("bit_or(user_id)").alias("any_bits"),
        F.expr("bit_xor(event_id)").alias("xor_fingerprint"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_approx_pct",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(cents, 0.50), 4) AS p50_exact_c,
           round(quantile_cont(cents, 0.95), 4) AS p95_exact_c,
           round(quantile_cont(cents, 0.99), 4) AS p99_exact_c,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok,
           count(*)::BIGINT AS n
    FROM (SELECT l_returnflag, round(l_extendedprice * 100)::BIGINT AS cents
          FROM lineitem)
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per return flag: percentile_approx
    (Greenwald-Khanna sketch) at p50/p95/p99 over the exact cents
    lane. The sketch values themselves are engine-specific (like
    q_agg_approx), so the DERIVED projection carries the value
    oracle: the exact interpolated percentiles (deterministic — both
    engines interpolate at rank p·(n−1) over integer cents; rounded
    4 dp) plus ok-flags asserting the sketch landed within 1%
    relative error of exact. The oracle emits literal TRUE for the
    flags — if Spark's sketch ever drifts out of bounds the flag goes
    false and the hash mismatches, which converts the former
    rows-only pytest bound into a driver-checked value row.

    Scale posture: GK sketches are mergeable — map-side partial
    sketches combine associatively, ONE shuffle of sketch state (not
    data), constant memory per group. The exact q_win_dist_functions /
    F.percentile need a per-group sort; this is what replaces them at
    100 TB. (The exact percentile columns here are fixture-scale
    oracle scaffolding, not the scale path.)"""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", to_units(F.col("l_extendedprice"), 100).alias("cents")
    )
    sketch = F.percentile_approx("cents", [0.5, 0.95, 0.99], 10000)
    exact = F.percentile("cents", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    ok = lambda i: (  # noqa: E731
        F.abs(F.col("s")[i] - F.col("e")[i]) <= 0.01 * F.abs(F.col("e")[i])
    ).alias(f"p{(50, 95, 99)[i]}_ok")
    return (
        l.groupBy("l_returnflag")
        .agg(sketch.alias("s"), exact.alias("e"), F.count(F.lit(1)).alias("n"))
        .select(
            "l_returnflag",
            F.round(F.col("e")[0], 4).alias("p50_exact_c"),
            F.round(F.col("e")[1], 4).alias("p95_exact_c"),
            F.round(F.col("e")[2], 4).alias("p99_exact_c"),
            ok(0), ok(1), ok(2),
            "n",
        )
    )


@register(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, round(l_quantity)::BIGINT AS qty,
             count(*)::BIGINT AS cnt
      FROM lineitem GROUP BY 1, 2),
    ranked AS (
      SELECT l_returnflag, qty, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, qty ASC) AS rn
      FROM counted)
    SELECT l_returnflag, qty AS mode_qty, cnt AS mode_cnt
    FROM ranked WHERE rn = 1
    """,
    category="aggregate",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group: most frequent quantity value with
    a smallest-value tie-break. Built as count-by-(group, value) → one
    row_number window, NOT the built-in ``mode()`` (whose tie winner is
    engine/partition-order dependent — unusable under a cross-engine
    hash gate). Two shuffles, both on small (group, value) keys; the
    window partitions by group over value-cardinality rows, never over
    the fact table."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    counted = (
        l.select("l_returnflag", F.round("l_quantity").cast("long").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), F.col("qty").asc())
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"), F.col("cnt").alias("mode_cnt"))
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_totalprice > 100000)::BIGINT AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_filled,
           min(o_custkey) AS first_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="aggregate",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family: filtered count (count_if),
    universal and existential predicates (bool_and/bool_or, i.e.
    every/any), and a DETERMINISTIC representative via min — never
    any_value, whose pick is partition-order dependent and would fail
    a cross-engine hash gate. All reduce to partial+final hash
    aggregates (booleans fold map-side)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_filled"),
        F.min("o_custkey").alias("first_cust"),
    )


@register(
    "q_agg_spearman",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
                 / 2.0 AS rx,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)
                 / 2.0 AS ry
      FROM lineitem)
    SELECT l_returnflag,
           count(*)::BIGINT AS n,
           round(corr(rx, ry), 6) AS spearman
    FROM r GROUP BY l_returnflag
    """,
    category="aggregate",
)
def q_agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group: Pearson correlation of the
    two variables' within-group MIDRANKS (average ranks) — the
    monotonic-association measure that is robust to outliers and
    nonlinearity where plain corr (q_agg_stats) is not. Midranks, not
    min-ranks: with ties (l_quantity has ~50 distinct values) Pearson
    over min-ranks is a different, biased statistic — textbook
    Spearman assigns each tie group the mean of its ranks, built here
    as rank() + (tie_count − 1)/2, deterministic on both engines
    (rank and tie_count are exact integers; the /2 halves are exact
    doubles); only the final correlation is rounded (same convention
    as q_agg_stats). Shape: rank + tie-count windows sharing ONE
    group exchange, then the same partial+final corr aggregate.

    Scale caveat (stated, not hidden): ranking WITHIN a group puts the
    whole group in one window partition — fine for high-cardinality
    grouping keys, a skew risk for 3-value keys like l_returnflag at
    100 TB. The remedy for low-cardinality groups over DISCRETE values
    is histogram ranks (per-(group, value) counts + a cumulative over
    the tiny value table, the q_agg_median_distributed machinery);
    this query keeps the window form because it is also exercising
    rank()'s tie semantics."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    tq = Window.partitionBy("l_returnflag", "l_quantity")
    tp = Window.partitionBy("l_returnflag", "l_extendedprice")
    half = lambda w: (F.count(F.lit(1)).over(w) - 1) / 2.0  # noqa: E731
    r = l.select(
        "l_returnflag",
        (F.rank().over(wq) + half(tq)).alias("rx"),
        (F.rank().over(wp) + half(tp)).alias("ry"),
    )
    return r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman"),
    )


@register(
    "q_agg_chi_square",
    oracle="""
    WITH clean AS (
      SELECT lang, source FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL),
    obs AS (
      SELECT lang, source, count(*)::BIGINT AS o
      FROM clean GROUP BY 1, 2),
    grid AS (
      SELECT l.lang, s.source, coalesce(obs.o, 0)::BIGINT AS o
      FROM (SELECT DISTINCT lang FROM clean) l
      CROSS JOIN (SELECT DISTINCT source FROM clean) s
      LEFT JOIN obs ON obs.lang = l.lang AND obs.source = s.source),
    margins AS (
      SELECT g.lang, g.source, g.o,
             sum(g.o) OVER (PARTITION BY g.lang) AS row_n,
             sum(g.o) OVER (PARTITION BY g.source) AS col_n,
             sum(g.o) OVER () AS total
      FROM grid g),
    cells AS (
      SELECT (o - row_n::DOUBLE * col_n / total)
             * (o - row_n::DOUBLE * col_n / total)
             / (row_n::DOUBLE * col_n / total) AS term
      FROM margins)
    SELECT count(*)::BIGINT AS n_cells,
           round(sum(term), 6) AS chi2
    FROM cells
    """,
    category="aggregate",
)
def q_agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for lang × source independence —
    the contingency-table drift test a corpus pipeline runs to detect
    source/language composition shifts. The FULL grid enters: absent
    (lang, source) combinations are materialized with O = 0 via a
    distinct-langs × distinct-sources cross join (tiny) so each
    contributes its (0−E)²/E = E term — dropping them understates χ²
    exactly when composition drift empties cells, the event this test
    exists to detect. Observed counts and margins are exact integers
    from one count aggregate + margin windows over the grid; each
    cell's expected value derives via the identical IEEE sequence,
    and only the final sum (whose order differs between engines) is
    rounded. NULL lang/source rows are excluded up front (both
    engines): a NULL category would form distinct-side grid rows that
    never match obs (equi-join NULL semantics), silently zeroing that
    category's observed counts and skewing every margin — the test
    requires non-null categories and now enforces it."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    grid = (
        d.select("lang")
        .distinct()
        .crossJoin(d.select("source").distinct())
        .join(obs, ["lang", "source"], "left")
        .select("lang", "source", F.coalesce("o", F.lit(0)).cast("long").alias("o"))
    )
    margins = grid.select(
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_n"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_n"),
        F.sum("o").over(Window.partitionBy()).alias("total"),
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("total")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    return margins.select(term.alias("term")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("term"), 6).alias("chi2"),
    )


@register(
    "q_agg_grouping_labels",
    oracle="""
    SELECT CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)'
                ELSE o_orderpriority END AS priority,
           CASE WHEN grouping(o_orderstatus) = 1 THEN '(all)'
                ELSE o_orderstatus END AS status,
           (grouping(o_orderpriority) * 2 + grouping(o_orderstatus))::BIGINT
             AS level_id,
           count(*)::BIGINT AS n
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    category="aggregate",
)
def q_agg_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() indicator labels — the piece the plain
    rollup/cube queries (q_agg_rollup/q_agg_cube) don't exercise:
    distinguishing a REAL NULL group value from a subtotal row.
    grouping(col) = 1 marks the subtotal level; the query folds it
    into '(all)' labels plus an explicit level id (hi-bit = priority
    rolled up, lo-bit = status rolled up) computed identically in
    both engines rather than relying on engine-specific grouping_id
    bit orders.

    Same expand + partial/final aggregate plan as q_agg_rollup —
    grouping() is free metadata from the expand node, no extra
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    # grouping() is only legal inside the aggregate list (it reads the
    # expand node's metadata column), so emit the two indicator bits
    # there and label in a follow-up projection.
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("o_orderpriority").alias("gp"),
            F.grouping("o_orderstatus").alias("gs"),
        )
        .select(
            F.when(F.col("gp") == 1, "(all)")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            F.when(F.col("gs") == 1, "(all)")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            (F.col("gp") * 2 + F.col("gs")).cast("long").alias("level_id"),
            "n",
        )
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS wk,
             count(DISTINCT user_id)::BIGINT AS wn
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
      FROM events GROUP BY 1),
    ws AS (
      SELECT event_type, sum(wn)::BIGINT AS weekly_distinct_sum,
             count(*)::BIGINT AS n_weeks
      FROM weekly GROUP BY 1)
    SELECT t.event_type, t.distinct_users, s.weekly_distinct_sum, s.n_weeks
    FROM tot t JOIN ws s USING (event_type)
    """,
    category="aggregate",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4 RoaringBitmap-style bitmap
    aggregates (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count): weekly
    partial bitmaps per (event_type, week, bucket) are OR-merged up
    to event_type WITHOUT rescanning the fact table — the exact
    analogue of the mergeable-sketch rollup (q_agg_approx /
    q_agg_hll_rollup) for the case where "approximately distinct"
    is not acceptable (billing, dedup audits).

    The two-level shape is the load-bearing part: bitmaps are built
    per 32k-value BUCKET, so state per group is bounded by the dense
    id range actually present, merging is bitwise-OR (associative,
    AQE-resplit safe), and the final count is sum-of-bucket-
    popcounts. Merging bitmaps ACROSS different bucket numbers would
    alias distinct values (bit 0 of bucket 0 = value 0, bit 0 of
    bucket 1 = value 1) — the group-by keeps the bucket number a key
    at every level.

    weekly_distinct_sum > distinct_users measures cross-week
    revisiting — the classic "sum of dailies ≠ monthly uniques"
    identity the merge exists to answer. Oracle: exact
    count(DISTINCT) at both grains.

    Scale posture: the fact table is scanned ONCE; every re-grain
    after that shuffles only (group, bucket, 4KB-bitmap) rows. At
    100 TB the weekly partials would persist as a layout table and
    monthly/annual uniques become bitmap_or_agg over partials —
    no re-scan, exact answers."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("week", F.col("ts")).alias("wk"),
        "user_id",
    )
    part = e.groupBy(
        "event_type", "wk", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    # Materialize the weekly partials ONCE (they are aggregate state,
    # (type × week × bucket) rows) so the two re-grains below share a
    # single fact scan — the in-session analogue of persisting the
    # partial-bitmap layout table (plan-gated in tests/test_plans.py).
    part = part.transform(materialize)
    weekly = part.groupBy("event_type", "wk").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("wn")
    )
    ws = weekly.groupBy("event_type").agg(
        F.sum("wn").cast("long").alias("weekly_distinct_sum"),
        F.count(F.lit(1)).alias("n_weeks"),
    )
    merged = (
        part.groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("distinct_users"))
    )
    return merged.join(ws, "event_type")


@register(
    "q_agg_hll_rollup",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS distinct_users,
           TRUE AS hll_ok
    FROM events GROUP BY event_type
    """,
    category="aggregate",
)
def q_agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketch rollup (Apache DataSketches HLL,
    Spark 4 hll_sketch_agg / hll_union_agg / hll_sketch_estimate):
    per-(event_type, week) sketch STATE is built once, then unioned
    up to event_type — the approximate twin of
    q_agg_bitmap_distinct, for keys too sparse/wide for bitmaps
    (URLs, doc fingerprints) where 1.5 KB of sketch replaces the id
    universe. The estimate itself is engine-specific, so (like
    q_agg_approx_pct) the DERIVED projection carries the oracle:
    exact distinct counts plus an hll_ok flag pinning the estimate
    within 5% relative error — the oracle emits literal TRUE, so a
    drifting sketch breaks the driver hash.

    Scale posture: ONE fact scan; re-grains shuffle constant-size
    sketch state; union is associative/commutative so AQE re-splits
    and map-side partials are exact w.r.t. the sketch's own merge
    semantics (lossless union, unlike averaging percentiles)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("week", F.col("ts")).alias("wk"), "user_id"
    )
    part = e.groupBy("event_type", "wk").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    merged = part.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("distinct_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "distinct_users",
        (
            F.abs(F.col("est") - F.col("distinct_users"))
            <= 0.05 * F.col("distinct_users")
        ).alias("hll_ok"),
    )


# Count-min sketch geometry: d=3 seeded md5 hash rows × w=64 counters.
# Small enough that the fixture's 150 user ids force real collisions
# (the sketch must OVERcount, never undercount — the property the
# oracle pins per key), large enough that min-of-3 stays informative.
_CM_D, _CM_W = 3, 64


def _cm_bucket_sql(r: int, key_sql: str) -> str:
    return (
        f"('0x' || substring(md5('cm{r}:' || ({key_sql})::VARCHAR), 1, 8))"
        f"::BIGINT % {_CM_W}"
    )


def _cm_bucket(r: int, key):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{r}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % _CM_W
    )


@register(
    "q_sketch_countmin",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events WHERE event_type = 'click'),
    ev3 AS (
      SELECT 0 AS r, {_cm_bucket_sql(0, "user_id")} AS bkt FROM ev
      UNION ALL
      SELECT 1 AS r, {_cm_bucket_sql(1, "user_id")} AS bkt FROM ev
      UNION ALL
      SELECT 2 AS r, {_cm_bucket_sql(2, "user_id")} AS bkt FROM ev),
    counters AS (
      SELECT r, bkt, count(*)::BIGINT AS c FROM ev3 GROUP BY 1, 2),
    keys AS (
      SELECT user_id, count(*)::BIGINT AS true_cnt FROM ev GROUP BY 1),
    probes AS (
      SELECT user_id, true_cnt, 0 AS r, {_cm_bucket_sql(0, "user_id")} AS bkt
      FROM keys
      UNION ALL
      SELECT user_id, true_cnt, 1 AS r, {_cm_bucket_sql(1, "user_id")} AS bkt
      FROM keys
      UNION ALL
      SELECT user_id, true_cnt, 2 AS r, {_cm_bucket_sql(2, "user_id")} AS bkt
      FROM keys)
    SELECT p.user_id, p.true_cnt,
           min(c.c)::BIGINT AS cm_est,
           (min(c.c) - p.true_cnt)::BIGINT AS overcount
    FROM probes p JOIN counters c USING (r, bkt)
    GROUP BY 1, 2
    """,
    category="aggregate",
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (Cormode–Muthukrishnan),
    built the way it must be built at 100 TB: the d×w counter grid
    comes from ONE map-side-combined aggregate over the event stream
    (each row hashes into d=3 cells of w=64 buckets —
    per-partition state is the 192-cell grid, NEVER per-key), with
    the seeded md5 row hashes computed identically in both engines
    (the q_llm_decontaminate_bloom idiom, dedup.py:984). Estimates
    are min-over-rows counter probes via a broadcast join of the
    grid — the grid is sketch-sized by construction, the one thing
    that is always broadcastable.

    The whole query is integer, so the oracle replays the sketch
    bit-for-bit: per-key true counts, the estimate, and the
    overcount (estimate − truth) — which the CM one-sided error
    guarantee says is ≥ 0 for EVERY key; any undercount anywhere
    hash-mismatches. The fixture's 150 keys over 64 buckets force
    real collisions, so overcount > 0 rows exist and the min-of-d
    selection is actually exercised.

    Scale posture: exact per-key counting (the `keys` CTE here) is
    the thing you CANNOT afford for heavy-hitter detection over
    10^9 open keys — it exists in this query only to state the
    oracle. The production path is grid + probes-for-candidates;
    state is O(d·w) regardless of cardinality, merging partial grids
    is elementwise + (associative), and the estimate never
    undercounts, so a "count ≥ threshold" filter has perfect
    recall."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id")
    )
    uid = F.col("user_id")
    # ONE scan: each event row explodes into its d (row, bucket) cells
    # (a unionAll of d arms would read the fact table d times — the
    # oracle keeps the UNION ALL form only because DuckDB reads a view).
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket(r, uid).alias("bkt"))
            for r in range(_CM_D)
        ]
    )
    ev3 = e.select(F.explode(cells).alias("cell")).select("cell.r", "cell.bkt")
    counters = ev3.groupBy("r", "bkt").agg(F.count(F.lit(1)).alias("c"))
    keys = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = keys.select(
        "user_id", "true_cnt", F.explode(cells).alias("cell")
    ).select("user_id", "true_cnt", "cell.r", "cell.bkt")
    return (
        probes.join(F.broadcast(counters), ["r", "bkt"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("c").alias("cm_est"))
        .select(
            "user_id",
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).alias("overcount"),
        )
    )


@register(
    "q_agg_hll_intersect",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT count(*) FROM c)::BIGINT AS clickers,
           (SELECT count(*) FROM p)::BIGINT AS purchasers,
           (SELECT count(*) FROM c JOIN p USING (user_id))::BIGINT
             AS exact_intersect,
           TRUE AS hll_ok,
           TRUE AS union_lossless
    """,
    category="aggregate",
)
def q_agg_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: |clickers ∩ purchasers| by inclusion-
    exclusion over HLL sketches — est(A) + est(B) − est(A∪B), where
    est(A∪B) comes from hll_union of the two per-segment sketches
    (NOT a rescan of the union — that is the point: audience-overlap
    questions compose from already-materialized per-segment sketch
    state). The estimate is engine-specific, so the oracle follows the
    q_agg_hll_rollup pattern: exact distinct counts for all three
    sets plus an hll_ok flag pinning the intersection estimate within
    10% of exact (inclusion-exclusion compounds the per-sketch error,
    hence the looser band than the 5% single-set gate), and a
    union_lossless flag asserting that merging the two per-segment
    sketches estimates within 1% of one sketch built over the
    combined stream — HLL union is register-wise max, so composing
    from partials loses (almost) nothing vs rescanning; the residual
    tolerance exists because the union gadget promotes to the HLL_8
    target type, whose estimator can differ a hair from the direct
    HLL_4 sketch once past exact coupon mode. This is the property
    that makes sketch layout tables sound.

    Scale posture: each sketch is one map-side-combined aggregate of
    the filtered scan; the final row is sketch-function arithmetic on
    three 1.5 KB states. At 100 TB the sketches come from the layout
    table, and any k-way segment overlap is k hll_unions — no join,
    no rescan, no shuffle of ids."""
    e = load_table(spark, sf_dir, "events")
    sk = e.filter(F.col("event_type").isin("click", "purchase")).agg(
        F.expr(
            "hll_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)"
        ).alias("ska"),
        F.expr(
            "hll_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)"
        ).alias("skb"),
        F.expr("hll_sketch_agg(user_id)").alias("sku"),
    ).select(
        F.expr("hll_sketch_estimate(ska)").alias("ea"),
        F.expr("hll_sketch_estimate(skb)").alias("eb"),
        F.expr("hll_sketch_estimate(hll_union(ska, skb))").alias("eu"),
        F.expr("hll_sketch_estimate(sku)").alias("eu_direct"),
    )
    c = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        c.agg(F.count(F.lit(1)).alias("clickers"))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchasers")))
        .crossJoin(c.join(p, "user_id").agg(F.count(F.lit(1)).alias("exact_intersect")))
    )
    return exact.crossJoin(sk).select(
        "clickers",
        "purchasers",
        "exact_intersect",
        (
            F.abs(F.col("ea") + F.col("eb") - F.col("eu") - F.col("exact_intersect"))
            <= 0.10 * F.greatest(F.col("exact_intersect"), F.lit(1))
        ).alias("hll_ok"),
        (
            F.abs(F.col("eu") - F.col("eu_direct"))
            <= 0.01 * F.greatest(F.col("eu_direct"), F.lit(1))
        ).alias("union_lossless"),
    )


@register(
    "q_agg_freq_items",
    oracle="""
    WITH g AS (SELECT lang, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
    n AS (SELECT sum(cnt)::BIGINT AS n FROM g)
    SELECT lang, cnt,
           ((10000 * cnt) // (SELECT n FROM n))::BIGINT AS share_bp,
           TRUE AS in_sketch
    FROM g WHERE cnt * 4 > (SELECT n FROM n)
    """,
    category="aggregate",
)
def q_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass approximate heavy hitters (DataFrame.stat.freqItems,
    the Karp–Schenker–Papadimitriou counter algorithm): languages
    holding more than a quarter of the corpus. The sketch's output
    SET is engine- and order-dependent (it may include false
    positives — the algorithm's documented slack), so the oracle
    follows the derived-projection pattern: the EXACT heavy hitters
    (strict cnt·4 > n, integer comparison) with exact counts and
    share basis points, plus an in_sketch flag pinning the KSP RECALL
    guarantee — every truly frequent item must appear in the sketch's
    result; a miss flips the flag and breaks the driver hash.

    Scale posture: freqItems is one pass with k=1/support counters
    per partition and an associative counter-merge — no shuffle of
    data, only of 4-entry counter maps; the exact groupBy exists as
    oracle scaffolding (at 10^9 distinct keys only the sketch
    survives, and its false-positive slack is filtered by one exact
    count over the ≤k candidate keys, the classic two-pass finish)."""
    d = load_table(spark, sf_dir, "documents")
    sketch_items = set(
        d.stat.freqItems(["lang"], support=0.25).collect()[0][0]
    )  # ≤ 1/support entries — model-sized driver collect
    g = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    n = g.agg(F.sum("cnt").alias("n"))
    return (
        g.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * 4 > F.col("n"))
        .select(
            "lang",
            "cnt",
            F.expr("(10000 * cnt) div n").cast("long").alias("share_bp"),
            F.col("lang").isin(sorted(sketch_items)).alias("in_sketch"),
        )
    )


@register(
    "q_agg_higher_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*)::BIGINT AS n,
             sum(q)::BIGINT AS s1,
             sum(q * q)::BIGINT AS s2,
             sum(q * q * q)::BIGINT AS s3,
             sum(q * q * q * q)::BIGINT AS s4
      FROM (SELECT l_returnflag, round(l_quantity)::BIGINT AS q FROM lineitem)
      GROUP BY 1),
    m AS (
      SELECT l_returnflag, n,
             s1::DOUBLE / n AS mean,
             s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n) AS m2,
             s3::DOUBLE / n
               - 3 * (s1::DOUBLE / n) * (s2::DOUBLE / n)
               + 2 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s1::DOUBLE / n)
               AS m3,
             s4::DOUBLE / n
               - 4 * (s1::DOUBLE / n) * (s3::DOUBLE / n)
               + 6 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s2::DOUBLE / n)
               - 3 * (s1::DOUBLE / n) * (s1::DOUBLE / n)
                   * (s1::DOUBLE / n) * (s1::DOUBLE / n)
               AS m4
      FROM s)
    SELECT l_returnflag, n,
           round(mean, 6) AS mean_qty,
           round(m3 / (m2 * sqrt(m2)), 6) AS skew_pop,
           round(m4 / (m2 * m2) - 3, 6) AS kurt_excess
    FROM m
    """,
    category="aggregate",
)
def q_agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from RAW integer moment
    sums (Σq, Σq², Σq³, Σq⁴ — exact BIGINTs on the integral quantity
    column), assembled into central moments with the IDENTICAL double
    expression tree in both engines. The builtins are deliberately
    avoided: Spark's skewness/kurtosis and DuckDB's differ in bias
    convention (population vs sample corrections) AND in accumulation
    scheme, so their outputs are not cross-engine comparable — raw
    integer sums are, under any partial-aggregation split, because
    integer addition is associative. This is the same exactness
    doctrine as the cents lane, one level up the moment ladder.

    Scale posture: ONE map-side-combined aggregate carrying 5 integer
    accumulators per group; per-row q⁴ ≤ 6.25e6 so even 10^12-row
    groups fit decimal accumulators (here longs suffice and stay in
    codegen). Everything after is 3-row arithmetic."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round("l_quantity").cast("long").alias("q")
    )
    q = F.col("q")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sk = lambda k: F.col(f"s{k}").cast("double") / F.col("n")  # noqa: E731
    m2 = sk(2) - mean * mean
    m3 = sk(3) - 3 * mean * sk(2) + 2 * mean * mean * mean
    m4 = sk(4) - 4 * mean * sk(3) + 6 * mean * mean * sk(2) - 3 * mean * mean * mean * mean
    return s.select(
        "l_returnflag",
        "n",
        F.round(mean, 6).alias("mean_qty"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurt_excess"),
    )


@register(
    "q_agg_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS x
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM spend),
    s AS (
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
             sum(i::HUGEINT * x::HUGEINT) AS six
      FROM ranked)
    SELECT n, sx AS total_cents,
           round((2.0 * six::DOUBLE) / (n::DOUBLE * sx::DOUBLE)
                 - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
    category="aggregate",
)
def q_agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the
    inequality measure a curation pipeline uses on SOURCE contribution
    (is 90% of the corpus coming from 2 domains?) and an ops team uses
    on tenant load. Computed by the rank formula G = 2·Σ(i·xᵢ)/(n·Σx)
    − (n+1)/n over ascending per-customer integer-cents totals with a
    total order (spend, custkey), so Σ(i·x) is an exact BIGINT and the
    two final divides are the identical IEEE ops in both engines.

    Scale posture: one aggregate to per-key totals, then the global
    rank is a TWO-PHASE distributed prefix count over the KEY table
    (the pack_by_cumsum shape, sampling.py:214): range-repartition on
    (x, custkey), pin the assignment (materialize — range
    partitioning is sampling-based, so two jobs could otherwise
    disagree), per-partition counts to the driver (model-sized offset
    table), partition-LOCAL row_number + broadcast offset. No single
    task ever holds the whole key table — an unpartitioned
    row_number() window would. The rank is a pure function of the
    data (boundaries only move rows between partitions, never change
    a key's global rank). Σ(i·x) accumulates in decimal(38,0)/HUGEINT
    — it grows ~n²·x̄ and overflows BIGINT around SF 2; the double
    conversion happens once per GROUP, after the exact sum."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("x"))
    )
    from pyspark.sql import Window

    parted = (
        spend.repartitionByRange(16, "x", "o_custkey")
        .withColumn("pid", F.spark_partition_id())
        .transform(materialize)
    )
    counts = {
        r.pid: r.cnt
        for r in parted.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ),
        F.col("pid"),
    )
    local = F.row_number().over(
        Window.partitionBy("pid").orderBy("x", "o_custkey")
    )
    ranked = parted.select("x", (local + off).cast("long").alias("i"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        # Cast BEFORE the multiply: the per-row product itself can
        # exceed long range once ranks reach ~10^11.
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("x")).alias("six"),
    )
    return s.select(
        "n",
        F.col("sx").alias("total_cents"),
        F.round(
            (2.0 * F.col("six").cast("double"))
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "q_agg_winsorized_mean",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, round(l_extendedprice * 100)::BIGINT AS cents
      FROM lineitem),
    ranked AS (
      SELECT l_returnflag, cents,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM c),
    ks AS (
      SELECT l_returnflag,
             max(n)::BIGINT AS n,
             ((max(n) * 5) // 100 + 1)::BIGINT AS klo,
             (max(n) - (max(n) * 5) // 100)::BIGINT AS khi
      FROM ranked GROUP BY 1),
    ordered AS (
      SELECT l_returnflag, cents,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cents) AS r
      FROM c),
    th AS (
      SELECT o.l_returnflag, max(k.n) AS n,
             max(CASE WHEN o.r = k.klo THEN o.cents END) AS lo_c,
             max(CASE WHEN o.r = k.khi THEN o.cents END) AS hi_c
      FROM ordered o JOIN ks k USING (l_returnflag)
      GROUP BY 1)
    SELECT c.l_returnflag, max(th.n) AS n, max(th.lo_c) AS lo_c,
           max(th.hi_c) AS hi_c,
           sum(least(greatest(c.cents, th.lo_c), th.hi_c))::BIGINT
             AS winsorized_sum_c,
           (sum(least(greatest(c.cents, th.lo_c), th.hi_c))
              // max(th.n))::BIGINT AS winsorized_mean_c
    FROM c JOIN th ON th.l_returnflag = c.l_returnflag
    GROUP BY c.l_returnflag
    """,
    category="aggregate",
)
def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group — the robust location estimate a DQ
    pipeline uses when trimming is too lossy: every price below the
    5th-percentile RANK is clamped up to it, everything above the
    95th clamped down, then a plain mean. The clamp thresholds are
    RANK-based order statistics (k = ⌊0.05·n⌋+1 from each end), NOT
    interpolated quantiles — an interpolated threshold is a float
    whose last-ulp placement could differ cross-engine and flip rows
    sitting exactly on it; the k-th smallest integer cents value
    cannot.

    Scale posture: thresholds come from exact_kth_units — the
    iterative-histogram distributed selection (no sort, no per-group
    value buffering, 3-4 passes; aggregates.py:458) — then ONE
    broadcast of the (group, lo, hi) table and one clamped
    map-side-combined sum. The oracle states the same ranks with
    OFFSET subqueries (fixture-sized; the selection kernel is the
    scale path). Integer cents end-to-end; the mean is DIV-floored."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", to_units(F.col("l_extendedprice"), 100).alias("cents")
    )
    counts = {r[0]: r[1] for r in l.groupBy("l_returnflag").count().collect()}
    ks = {}
    for gv, n in counts.items():
        ks[(gv, 1)] = n * 5 // 100 + 1      # lower clamp rank
        ks[(gv, 2)] = n - n * 5 // 100      # upper clamp rank
    vals = exact_kth_units(l, "l_returnflag", "cents", ks)
    th = spark.createDataFrame(
        [
            (gv, counts[gv], vals[(gv, 1)], vals[(gv, 2)])
            for gv in sorted(counts)
        ],
        "l_returnflag STRING, n BIGINT, lo_c BIGINT, hi_c BIGINT",
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo_c")), F.col("hi_c"))
    return (
        l.join(F.broadcast(th), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max("lo_c").alias("lo_c"),
            F.max("hi_c").alias("hi_c"),
            F.sum(clamped).alias("winsorized_sum_c"),
        )
        .select(
            "l_returnflag",
            "n",
            "lo_c",
            "hi_c",
            "winsorized_sum_c",
            F.expr("winsorized_sum_c div n").cast("long").alias("winsorized_mean_c"),
        )
    )


@register(
    "q_agg_decile_summary",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             round(o_totalprice * 100)::BIGINT AS cents,
             o_orderkey,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY round(o_totalprice * 100)::BIGINT,
                                      o_orderkey) AS decile
      FROM orders)
    SELECT o_orderpriority, decile,
           count(*)::BIGINT AS n,
           min(cents)::BIGINT AS lo_c,
           max(cents)::BIGINT AS hi_c,
           sum(cents)::BIGINT AS sum_c
    FROM c GROUP BY o_orderpriority, decile
    """,
    category="aggregate",
)
def q_agg_decile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group decile distribution summary: order values split into
    10 equal-count buckets per priority (ntile over the exact-cents
    total order, orderkey tie-break so bucket assignment is
    engine-deterministic even for equal values), then count/min/max/
    sum per bucket — the value-distribution profile a pricing or DQ
    dashboard draws, and the exact-rank complement to the sketch
    percentiles (q_agg_approx_pct).

    Scale posture: ONE exchange on o_orderpriority feeds both the
    ntile window and the (priority, decile) aggregate (partial agg
    map-side); output is groups × 10 rows. ntile's remainder rule
    (earlier buckets get the extra row) is identical in Spark and
    DuckDB, which the parity hash verifies at both SFs."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    c = o.select(
        "o_orderpriority",
        to_units(F.col("o_totalprice"), 100).alias("cents"),
        "o_orderkey",
    ).withColumn("decile", F.ntile(10).over(w))
    return c.groupBy("o_orderpriority", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo_c"),
        F.max("cents").alias("hi_c"),
        F.sum("cents").alias("sum_c"),
    )


_CORR_VARS = [
    ("qty", "round(l_quantity)::BIGINT"),
    ("price", "round(l_extendedprice * 100)::BIGINT"),
    ("disc", "round(l_discount * 10000)::BIGINT"),
    ("tax", "round(l_tax * 10000)::BIGINT"),
]


def _corr_matrix_oracle() -> str:
    units = ", ".join(f"{expr} AS {name}" for name, expr in _CORR_VARS)
    sums = ["count(*)::BIGINT AS n"]
    for a, _ in _CORR_VARS:
        sums.append(f"sum({a})::DOUBLE AS s_{a}")
        sums.append(f"sum({a} * {a})::DOUBLE AS s_{a}{a}")
    pairs = []
    for i, (a, _) in enumerate(_CORR_VARS):
        for b, _ in _CORR_VARS[i + 1:]:
            sums.append(f"sum({a} * {b})::DOUBLE AS s_{a}{b}")
            pairs.append((a, b))
    rows = "\n      UNION ALL ".join(
        f"SELECT '{a}' AS var_x, '{b}' AS var_y, n, "
        f"round((n * s_{a}{b} - s_{a} * s_{b}) / "
        f"(sqrt(n * s_{a}{a} - s_{a} * s_{a}) * "
        f"sqrt(n * s_{b}{b} - s_{b} * s_{b})), 6) AS corr FROM s"
        for a, b in pairs
    )
    return f"""
    WITH u AS (SELECT {units} FROM lineitem),
    s AS (SELECT {', '.join(sums)} FROM u)
    {rows}
    """


@register("q_agg_corr_matrix", oracle=_corr_matrix_oracle(), category="aggregate")
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four
    numeric measures (quantity, price cents, discount bp, tax bp) —
    the one-pass profiling step a feature pipeline runs before
    modeling. All 15 moment sums (n, 4 sums, 4 square sums, 6 cross
    sums) come from ONE scan / ONE partial+final aggregate; each sum
    accumulates exact integers (products fit BIGINT row-wise, sums
    held in decimal(38) / HUGEINT so no engine overflows), and the
    correlation r = (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa^2) *
    sqrt(n*Sbb - Sb^2)) is the identical correctly-rounded double
    sequence on both engines (6-dp belt). The 6 upper-triangle pairs
    unpivot from the single moment row — never 6 corr() passes.

    Scale posture: one scan, one 1-row fold, a 6-row stack. This is
    the shape that profiles 100 columns at 100 TB (k^2/2 sums in one
    aggregate) without k^2 scans."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = l.select(
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("tax"),
    )
    names = [n for n, _ in _CORR_VARS]
    aggs = [F.count(F.lit(1)).alias("n")]
    pairs = []
    for a in names:
        aggs.append(F.sum(dec(F.col(a))).cast("double").alias(f"s_{a}"))
        aggs.append(
            F.sum(dec(F.col(a) * F.col(a))).cast("double").alias(f"s_{a}{a}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(
                F.sum(dec(F.col(a) * F.col(b))).cast("double").alias(f"s_{a}{b}")
            )
            pairs.append((a, b))
    s = u.agg(*aggs)
    n = F.col("n")

    def corr(a: str, b: str):
        num = n * F.col(f"s_{a}{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = F.sqrt(n * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
        db = F.sqrt(n * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        return F.round(num / (da * db), 6)

    stacked = s.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("var_x"),
                        F.lit(b).alias("var_y"),
                        corr(a, b).alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("cell"),
    )
    return stacked.select("cell.var_x", "cell.var_y", "n", "cell.corr")


@register(
    "q_agg_group_size_histogram",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, count(*)::BIGINT AS k
      FROM lineitem GROUP BY l_orderkey),
    hist AS (
      SELECT k, count(*)::BIGINT AS n_orders, sum(k)::BIGINT AS n_lines
      FROM sizes GROUP BY k)
    SELECT k, n_orders, n_lines,
           ((10000 * sum(n_lines) OVER (ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              // (sum(n_lines) OVER ()))::BIGINT AS cum_lines_bp
    FROM hist
    """,
    category="aggregate",
)
def q_agg_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of GROUP SIZES (how many orders have k line items,
    and what share of all lines the orders of size ≤ k carry) — the
    first diagnostic anyone runs on a join/aggregation key before
    trusting it at scale: a heavy tail here is exactly the skew that
    breaks a shuffle (the q_join_skew_salted / AQE-skew remediations
    exist for what this query detects). Two-level aggregate: per-key
    counts, then a histogram over the COUNTS; the cumulative
    line-share runs over the tiny k-histogram in exact integer bp.

    Scale posture: the first aggregate is the only fact shuffle; the
    histogram input is |distinct k| rows (≤ max group size), so its
    window is value-table sized. At 100 TB this query is how you
    decide the key is safe BEFORE running the real join."""
    sizes = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    hist = sizes.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("k").cast("long").alias("n_lines"),
    )
    return hist.select(
        "k",
        "n_orders",
        "n_lines",
        F.expr(
            "CAST((10000 * sum(n_lines) OVER (ORDER BY k"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
            " DIV (sum(n_lines) OVER ()) AS BIGINT)"
        ).alias("cum_lines_bp"),
    )


@register(
    "q_agg_weighted_median",
    oracle="""
    WITH buckets AS (
      SELECT l_returnflag AS grp,
             round(l_extendedprice * 100)::BIGINT // 100 AS dollars,
             sum(round(l_quantity)::BIGINT)::BIGINT AS w
      FROM lineitem GROUP BY grp, dollars),
    cum AS (
      SELECT grp, dollars, w,
             sum(w) OVER (PARTITION BY grp ORDER BY dollars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY grp) AS tw
      FROM buckets)
    SELECT grp,
           max(tw)::BIGINT AS total_weight,
           min(CASE WHEN 2 * cw >= tw THEN dollars END)::BIGINT
             AS wmedian_dollars
    FROM cum GROUP BY grp
    """,
    category="aggregate",
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower convention): the smallest price level
    whose cumulative quantity weight reaches half the group total —
    the statistic behind volume-weighted 'typical price' and any
    fair-aggregation rule where rows carry different mass (plain
    median, q_agg_median_distributed, weights every row 1). Prices
    enter at DOLLAR grain, so the histogram is bounded and the
    crossing test 2·cum ≥ total stays in exact integers — no float,
    no interpolation convention to disagree on.

    Scale posture: one fact scan → a (group, dollar) weight rollup
    with map-side combine → cumulative windows over that bounded
    histogram (the q_agg_median_distributed discipline: windows on
    value tables). For an unbounded-domain exact weighted median the
    remedy is the same iterative histogram selection
    q_agg_median_distributed uses, with weights in place of
    counts."""
    buckets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("grp"),
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT) DIV 100"
            ).alias("dollars"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("w")
        )
    )
    from pyspark.sql import Window as W

    wcum = W.partitionBy("grp").orderBy("dollars").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy("grp")
    cum = buckets.select(
        "grp",
        "dollars",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    return cum.groupBy("grp").agg(
        F.max("tw").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("dollars"))
        )
        .cast("long")
        .alias("wmedian_dollars"),
    )


@register(
    "q_agg_bool_family",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT AS n,
           bool_and(o_totalprice > 100) AS all_over_100,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')::BIGINT
             AS n_urgent,
           count(*) FILTER (WHERE o_totalprice > 200000)::BIGINT AS n_big
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    category="aggregate",
)
def q_agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family — every(), some(), and
    count_if(), the predicates-as-aggregates surface (DuckDB twins:
    bool_and / bool_or / count FILTER). These are the invariant-check
    primitives data-quality jobs run per partition key ("ALL rows
    priced", "ANY outlier present", "how many urgent") without a
    self-join or a CASE pyramid.

    Scale posture: all four are partial-aggregable (AND/OR/COUNT
    merge associatively), so the plan is the standard partial+final
    hash aggregate with map-side combine — one shuffle of
    |groups|-sized partials. Predicate comparisons on the money
    column happen against integer-safe literals on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.every(F.col("o_totalprice") > 100).alias("all_over_100"),
            F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_agg_percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT AS n,
           quantile_cont(round(o_totalprice * 100)::BIGINT, 0.25) AS p25,
           quantile_cont(round(o_totalprice * 100)::BIGINT, 0.50) AS p50,
           quantile_cont(round(o_totalprice * 100)::BIGINT, 0.90) AS p90,
           quantile_cont(round(o_totalprice * 100)::BIGINT, 0.99) AS p99
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    category="aggregate",
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linearly-interpolated percentiles (SQL percentile_cont
    semantics) per group over the integer-cents lane — the latency-
    style p50/p90/p99 readout where the approx sketch
    (q_agg_approx_pct) isn't acceptable, e.g. revenue SLAs. Both
    engines implement the same type-7 interpolation lo + (hi−lo)·frac
    over exact integers, verified bit-identical (including
    non-terminating fractions) — so the outputs carry NO rounding
    belt: a single ulp of divergence fails the hash.

    Scale posture: Spark's percentile is a partial-aggregable
    typed-imperative aggregate (per-partition count maps merged on
    the reducer) — one shuffle of value-histogram partials, same
    shape as the exact median lane; for the single-group giant-table
    case q_agg_median_distributed's two-phase histogram selection
    swaps in."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", to_units(F.col("o_totalprice"), 100).alias("cents")
    )
    # r12: ONE percentile buffer for all four quantiles — each
    # separate `percentile` aggregate buffers every group value
    # independently; per-quantile interpolation is independent, so
    # the array form is value-identical at a quarter of the buffering
    # (the q_agg_approx consolidation, guide §1.2).
    allq = F.percentile(
        F.col("cents"),
        F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90), F.lit(0.99)),
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), allq.alias("_q"))
        .select(
            "o_orderstatus",
            "n",
            F.element_at("_q", 1).alias("p25"),
            F.element_at("_q", 2).alias("p50"),
            F.element_at("_q", 3).alias("p90"),
            F.element_at("_q", 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_agg_theil_between",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT
               AS cents
      FROM orders GROUP BY 1),
    g AS (
      SELECT c.c_nationkey AS nationkey,
             count(*)::BIGINT AS n_customers,
             coalesce(sum(rev.cents), 0)::BIGINT AS revenue_cents
      FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey
      GROUP BY 1),
    tot AS (
      SELECT sum(n_customers)::BIGINT AS n, sum(revenue_cents)::BIGINT AS y,
             list_reduce(
               list(CASE WHEN revenue_cents = 0 THEN 0.0
                         ELSE (revenue_cents::DOUBLE
                               / (SELECT sum(revenue_cents) FROM g))
                              * ln((revenue_cents::DOUBLE
                                    * (SELECT sum(n_customers) FROM g))
                                   / ((SELECT sum(revenue_cents) FROM g)
                                      * n_customers::DOUBLE))
                    END ORDER BY nationkey),
               (a, x) -> a + x) AS theil
      FROM g)
    SELECT n.n_name, g.n_customers, g.revenue_cents,
           ((10000 * g.revenue_cents) // t.y)::BIGINT AS revenue_share_bp,
           round(t.theil, 6) AS theil_between
    FROM g JOIN nation n ON n.n_nationkey = g.nationkey
    CROSS JOIN tot t
    """,
    category="aggregate",
)
def q_agg_theil_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-nation Theil-T inequality of customer revenue — the
    decomposable inequality index (unlike Gini, Theil splits exactly
    into between-group + within-group terms), answering "how much of
    revenue concentration is ACROSS markets rather than within
    them": T_between = Σ_g s_g · ln(s_g / p_g) with s_g the group's
    revenue share and p_g its customer-population share. Per nation:
    customer count, exact revenue cents, share in basis points, and
    the index repeated on each row. Zero-revenue nations contribute
    exactly 0 (the lim x→0 x·ln x convention, spelled as a CASE in
    both engines — a bare ln would raise/−inf).

    Cross-engine exactness: population counts and revenue cents are
    exact integers off one LEFT join (non-purchasing customers count
    in p_g); the one float stage folds the ≤25 per-nation terms in
    EXPLICIT nationkey order (array_sort left fold vs list_reduce
    over an ORDER BY list — the q_ts_weekday_effect discipline), so
    the doubles are bit-identical with the 6-dp round as a belt;
    ln is correctly-rounded libm on both engines over identical
    inputs. Shares are exact integer DIV basis points.

    Scale posture: one map-side-combined per-customer aggregate, one
    customer-keyed LEFT join, a nation-sized (enum-bounded) group
    table, a 1-row total, and a 25-row dimension join. No windows
    over facts, no Python, no hints (AQE broadcasts the dim).

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's aggregate family beside
    q_agg_gini_concentration and q_agg_hhi.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = o.groupBy(F.col("o_custkey")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    g = (
        c.join(rev, c["c_custkey"] == rev["o_custkey"], "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    tot = g.agg(
        F.sum("n_customers").cast("long").alias("n"),
        F.sum("revenue_cents").cast("long").alias("y"),
        F.array_sort(
            F.collect_list(F.struct("nationkey", "n_customers", "revenue_cents"))
        ).alias("gs"),
    ).selectExpr(
        "n",
        "y",
        # 0·ln(0) := 0 for zero-revenue nations, spelled identically
        # in the oracle's CASE
        "aggregate(gs, 0.0D, (a, x) -> a + CASE WHEN x.revenue_cents = 0"
        " THEN 0.0D ELSE (CAST(x.revenue_cents AS DOUBLE) / y)"
        " * ln((CAST(x.revenue_cents AS DOUBLE) * n)"
        " / (CAST(y AS DOUBLE) * x.n_customers)) END) AS theil",
    )
    return (
        g.crossJoin(tot)
        .join(n, g["nationkey"] == n["n_nationkey"])
        .selectExpr(
            "n_name",
            "n_customers",
            "revenue_cents",
            "CAST((10000 * revenue_cents) DIV y AS BIGINT)"
            " AS revenue_share_bp",
            "round(theil, 6) AS theil_between",
        )
    )


@register(
    "q_agg_cramers_v",
    oracle="""
    WITH clean AS (
      SELECT lang, source FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL),
    obs AS (
      SELECT lang, source, count(*)::BIGINT AS o
      FROM clean GROUP BY 1, 2),
    grid AS (
      SELECT l.lang, s.source, coalesce(obs.o, 0)::BIGINT AS o
      FROM (SELECT DISTINCT lang FROM clean) l
      CROSS JOIN (SELECT DISTINCT source FROM clean) s
      LEFT JOIN obs ON obs.lang = l.lang AND obs.source = s.source),
    m AS (
      SELECT g.lang, g.source, g.o,
             sum(g.o) OVER (PARTITION BY g.lang)::BIGINT AS row_n,
             sum(g.o) OVER (PARTITION BY g.source)::BIGINT AS col_n,
             sum(g.o) OVER ()::BIGINT AS total
      FROM grid g),
    dims AS (
      SELECT count(DISTINCT lang)::BIGINT AS r,
             count(DISTINCT source)::BIGINT AS c,
             max(total)::BIGINT AS n
      FROM m),
    tot AS (
      SELECT list_reduce(
               list((o::DOUBLE - row_n::DOUBLE * col_n / total)
                    * (o::DOUBLE - row_n::DOUBLE * col_n / total)
                    / (row_n::DOUBLE * col_n / total)
                    ORDER BY lang, source),
               (a, x) -> a + x) AS chi2
      FROM m)
    SELECT m.lang, m.source, m.o,
           ((1000 * m.row_n * m.col_n) // m.total)::BIGINT AS e_milli,
           round((m.o::DOUBLE - m.row_n::DOUBLE * m.col_n / m.total)
                 / sqrt(m.row_n::DOUBLE * m.col_n / m.total), 4)
             AS pearson_resid,
           round(sqrt(t.chi2 / (d.n
                 * (CASE WHEN d.r < d.c THEN d.r ELSE d.c END - 1))), 6)
             AS cramers_v
    FROM m CROSS JOIN tot t CROSS JOIN dims d
    """,
    category="aggregate",
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for the lang×source
    contingency table, with per-cell Pearson residuals — the two
    numbers q_agg_chi_square's omnibus statistic doesn't give: HOW
    STRONG the association is on the comparable 0–1 scale
    (V = sqrt(χ²/(N·(min(r,c)−1)))), and WHICH cells drive it
    ((O−E)/sqrt(E) — |resid| > 2 flags the anomalous combinations a
    corpus-balance audit acts on). Expected counts ride as exact
    integer milli-units beside the rounded residuals.

    Cross-engine exactness: observed counts and margins are exact
    integers off the zero-filled enum grid; χ² folds its cell terms
    in EXPLICIT (lang, source) order (array_sort left fold vs
    list_reduce over an ORDER BY list — q_agg_chi_square's plain
    float SUM is safe only because the grid is enum-small; this op
    removes even that residual ordering risk); residuals and V are
    shared float formulas over identical inputs, rounded 4/6.

    Scale posture: one map-side-combined cell aggregate; every later
    frame is the langs×sources enum grid. The corpus is scanned
    once. No Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's aggregate family beside
    q_agg_chi_square (whose docstring points the effect-size reader
    here).
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    langs = obs.select("lang").distinct()
    srcs = obs.select("source").distinct()
    grid = (
        langs.crossJoin(srcs)
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang", "source", F.coalesce("o", F.lit(0)).cast("long").alias("o")
        )
    )
    from pyspark.sql import Window as W

    m = grid.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(W.partitionBy("lang")).cast("long").alias("row_n"),
        F.sum("o").over(W.partitionBy("source")).cast("long").alias("col_n"),
        F.sum("o").over(W.partitionBy()).cast("long").alias("total"),
    )
    dims = m.agg(
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
        F.max("total").cast("long").alias("n"),
    )
    term = (
        "(CAST(x.o AS DOUBLE) - CAST(x.row_n AS DOUBLE) * x.col_n / x.total)"
        " * (CAST(x.o AS DOUBLE) - CAST(x.row_n AS DOUBLE) * x.col_n / x.total)"
        " / (CAST(x.row_n AS DOUBLE) * x.col_n / x.total)"
    )
    tot = m.agg(
        F.array_sort(
            F.collect_list(F.struct("lang", "source", "o", "row_n", "col_n", "total"))
        ).alias("gs")
    ).selectExpr(f"aggregate(gs, 0.0D, (a, x) -> a + {term}) AS chi2")
    return m.crossJoin(tot).crossJoin(dims).selectExpr(
        "lang",
        "source",
        "o",
        "CAST((1000 * row_n * col_n) DIV total AS BIGINT) AS e_milli",
        "round((CAST(o AS DOUBLE) - CAST(row_n AS DOUBLE) * col_n / total)"
        " / sqrt(CAST(row_n AS DOUBLE) * col_n / total), 4)"
        " AS pearson_resid",
        "round(sqrt(chi2 / (n * (CASE WHEN r < c THEN r ELSE c END - 1))), 6)"
        " AS cramers_v",
    )
