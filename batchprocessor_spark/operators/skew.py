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
    which needs no extra state and stays stable across retries."""
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_n).alias("__salt")
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    joined = big_salted.join(small_salted, [key, "__salt"], how)
    return joined.drop("__salt")
