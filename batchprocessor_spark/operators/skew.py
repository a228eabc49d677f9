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
