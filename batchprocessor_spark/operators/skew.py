"""Skew-handling join utilities (SURVEY.md §4.3 / the 100 TB posture).

AQE's skew-join splitting handles moderate skew automatically
(enabled in session.py); explicit salting is the manual fallback when
one key dominates so heavily that even split partitions overwhelm a
task, or when AQE is unavailable (streaming joins).

``salted_join`` replicates the small side SALT_N ways and scatters the
big side's hot keys across salt buckets — same result set as a plain
equi join (proven by tests/test_skew.py against the unsalted join),
but the shuffle spreads the hot key over SALT_N reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Scalable range join: ``points ⋈ intervals ON lo <= p < hi``.

    A naive non-equi join of two LARGE sides is a broadcast/cartesian
    nested loop — O(n·m). Binning converts it to an equi join: every
    interval is exploded to the bins it overlaps, every point maps to
    exactly one bin, the join runs hash/SMJ on ``__bin``, and the
    residual range predicate filters within matching bins. Cost is
    O(n + m·span/bin_width + matches) with ONE shuffle per side —
    the plan that survives when neither side broadcasts.

    ``bin_width`` should be ≈ the typical interval span (smaller →
    more interval replication; larger → more false candidates).
    """
    p_bin = F.floor(F.col(point_col) / bin_width).cast("long")
    lo_bin = F.floor(F.col(lo_col) / bin_width).cast("long")
    hi_bin = F.floor((F.col(hi_col)) / bin_width).cast("long")
    binned_points = points.withColumn("__bin", p_bin)
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    joined = binned_points.join(binned_intervals, "__bin", how).where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bin")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join ``big ⋈ small`` on ``key`` with salt-based skew
    mitigation. ``small`` is replicated ``salt_n``× (so it must be the
    dimension side); ``big`` rows get a random-but-deterministic salt
    from a hash of the full row position — here a hash of all columns,
    which needs no extra state and stays stable across retries.

    Only join shapes that never emit an unmatched SMALL-side row are
    allowed: with ``small`` replicated salt_n×, right/full joins would
    surface every unmatched replica (salt_n duplicate rows), silently
    breaking equivalence with the unsalted join."""
    safe = {"inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in safe:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched small-side "
            f"rows {salt_n}x; supported shapes: {sorted(safe)}"
        )
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_n).alias("__salt")
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    joined = big_salted.join(small_salted, [key, "__salt"], how)
    return joined.drop("__salt")


def _register_query():
    """Deferred so this module keeps zero import-time Spark deps for
    the pure helpers above."""
    from pyspark.sql import SparkSession

    from batchprocessor_spark.plans.registry import register
    from batchprocessor_spark.sources.catalog import load_table

    @register(
        "q_join_skew_salted",
        oracle="""
        WITH j AS (
          SELECT s_nationkey,
                 round(l_quantity)::BIGINT AS qty,
                 round(l_extendedprice * 100)::BIGINT AS price_c
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        s AS (
          SELECT s_nationkey, count(*)::BIGINT AS n_items,
                 sum(qty) AS sq, sum(price_c) AS sp
          FROM j GROUP BY s_nationkey)
        SELECT s_nationkey, n_items, sq::DOUBLE AS sum_qty,
               (sp // 100)::DOUBLE + (sp % 100)::DOUBLE / 100 AS revenue
        FROM s
        """,
        category="join",
    )
    def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Skew-mitigated fact⋈dim join: lineitem ⋈ supplier through
        ``salted_join`` (supplier replicated SALT_N×, lineitem scattered
        across salt buckets), aggregated per supplier nation. The result
        is identical to the plain equi join — which is exactly what the
        oracle checks — while the shuffle spreads any hot supplier key
        over SALT_N reducers. This is the manual fallback shape for the
        skew AQE can't split (streaming joins, or one catastrophic key).

        Money math uses the exact scaled-integer lanes (see
        q_agg_basic): cents products in long, decimal(38,0) accumulators,
        DIV/MOD descale."""
        l = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        )
        s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        joined = salted_join(l, s, "s_suppkey", salt_n=8, how="inner")
        return (
            joined.groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum("qty").alias("sq"),
                F.sum(F.col("price_c").cast("decimal(38,0)")).alias("sp"),
            )
            .select(
                "s_nationkey",
                "n_items",
                F.col("sq").cast("double").alias("sum_qty"),
                (
                    F.expr("CAST(sp DIV 100 AS DOUBLE)")
                    + F.expr("CAST(sp % 100 AS DOUBLE)") / 100
                ).alias("revenue"),
            )
        )


_register_query()
