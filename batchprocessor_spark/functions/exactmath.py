"""Exact scaled-integer money/quantity lanes, shared by every query
that aggregates monetary columns.

Why: the driver's correctness gate hashes float results, and double
summation order differs across engines AND across Spark runs (partial
aggregation), while 128-bit decimal arithmetic is exact but ~1.8×
slower per row (measured on q_agg_basic). The test tables' monetary
columns carry at most 2 decimals and quantities are integral (asserted
in tests/test_oracle_parity.py), so the fast AND exact lane is:

1. per row: scale to integer units (cents, 1e-4 dollars, ...) with
   ``round(x*scale)`` — a codegen-friendly long, products stay in long
   (max ≈ 4e11 per row, see q_agg_basic);
2. accumulate: ``sum(cast(decimal(38,0)))`` so group totals cannot
   overflow at 100 TB (~1e22 in 1e-6-dollar units vs long max 9.2e18);
3. descale per GROUP: integer DIV/MOD so the double conversion is
   exact on both engines — both the quotient and remainder are < 2^53
   (DuckDB's wide-decimal→double descale is not correctly rounded, so
   never cast a wide decimal straight to double).

Each Spark helper has a ``sql_*`` twin emitting the identical DuckDB
expression, keeping both engines on the same IEEE operations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_units(col: Column, scale: int) -> Column:
    """Exact integer units: round(col * scale) as long. ``scale`` must
    cover the column's true decimal width (100 for 2-decimal money)."""
    return F.round(col * scale).cast("long") if scale != 1 else F.round(col).cast("long")


def pd_to_units(series, scale: int):
    """Pandas twin of :func:`to_units` for Arrow-batched UDF paths.

    pandas ``.round()`` is numpy half-to-even, while Spark ``F.round``
    and DuckDB ``round`` are half-away-from-zero — a value whose
    ``x*scale`` lands exactly on ``.5`` in binary would differ by one
    unit between the lanes. Sign-aware ``floor(|x|*scale + 0.5)``
    reproduces the half-away convention exactly (ADVICE r2)."""
    import numpy as np

    scaled = series.to_numpy(dtype="float64") * scale
    return np.copysign(np.floor(np.abs(scaled) + 0.5), scaled).astype("int64")


def dec_sum(col: Column) -> Column:
    """Overflow-proof exact accumulator for integer-unit columns."""
    return F.sum(col.cast("decimal(38,0)"))


def descale(agg_name: str, unit: int) -> Column:
    """Exact ``sum/unit`` as double from an already-aliased aggregate
    column: quotient + remainder, each < 2^53, same IEEE ops as the
    ``sql_descale`` twin."""
    if unit == 1:
        return F.expr(f"CAST({agg_name} AS DOUBLE)")
    return F.expr(f"CAST({agg_name} DIV {unit} AS DOUBLE)") + F.expr(
        f"CAST({agg_name} % {unit} AS DOUBLE)"
    ) / F.lit(unit)


def sql_units(expr: str, scale: int) -> str:
    if scale == 1:
        return f"round({expr})::BIGINT"
    return f"round(({expr}) * {scale})::BIGINT"


def sql_descale(expr: str, unit: int) -> str:
    if unit == 1:
        return f"({expr})::DOUBLE"
    return f"(({expr}) // {unit})::DOUBLE + (({expr}) % {unit})::DOUBLE / {unit}"
