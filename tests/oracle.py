"""Driver-faithful oracle comparison: run a registered query on Spark
and its SQL twin on DuckDB over the same parquet tables, then compare
row count + sorted-column value multiset (the driver hashes; we diff
for actionable failure messages)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from batchprocessor_spark.sources.catalog import TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written multi-file layout (<name>.parquet/ is a
            # directory of part files) — same layout load_table reads.
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return None
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        # to_pydatetime() silently truncates to µs; keep the Timestamp
        # when sub-µs components exist so a ns-level mismatch is a
        # reported diff, not a hidden truncation (Timestamp == datetime
        # comparisons are exact across the two representations).
        return ts if ts.nanosecond else ts.to_pydatetime()
    if isinstance(v, datetime.date):
        return v
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # numpy array
        return tuple(_canon(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
        return _canon(v) if not isinstance(v, (int, str, bool, bytes)) else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def _fast_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool | None:
    """Vectorized equality for plain-scalar frames (the 600k-row
    queries cost ~35 s/side through the per-value canonical path but
    <1 s here). Returns True when provably equal, None when this path
    cannot decide (object/array/decimal columns, dtype surprises, or
    ANY mismatch — the caller falls back to the canonical comparison,
    which is also what produces readable diffs). Never returns a
    decisive False, so semantics are identical to the slow path."""
    import numpy as np

    a = a.reindex(sorted(a.columns), axis=1).copy()
    b = b.reindex(sorted(b.columns), axis=1).copy()
    for df in (a, b):
        for c in df.columns:
            dt = df[c].dtype
            if str(dt).startswith("datetime64"):
                s = df[c]
                if getattr(s.dt, "tz", None) is not None:
                    s = s.dt.tz_convert("UTC").dt.tz_localize(None)
                cast = s.astype("datetime64[us]")
                # If the [us] cast truncated anything (sub-microsecond
                # components, e.g. a ns-typed DuckDB result), this path
                # can no longer prove equality — fall back to the
                # canonical comparison instead of comparing truncated
                # values (ADVICE r4: never hide a ns-level mismatch).
                if not cast.astype(s.dtype).equals(s):
                    return None
                df[c] = cast
            elif np.issubdtype(dt, np.integer):
                df[c] = df[c].astype("int64")
            elif np.issubdtype(dt, np.floating):
                df[c] = df[c].astype("float64")
            elif np.issubdtype(dt, np.bool_):
                df[c] = df[c].astype("bool")
            elif dt == object and df[c].map(lambda v: isinstance(v, str)).all():
                pass  # plain strings sort/compare fine
            else:
                return None
    if list(a.dtypes) != list(b.dtypes):
        return None
    cols = list(a.columns)
    try:
        a = a.sort_values(cols, kind="mergesort", na_position="last").reset_index(
            drop=True
        )
        b = b.sort_values(cols, kind="mergesort", na_position="last").reset_index(
            drop=True
        )
    except TypeError:
        return None  # mixed-type column: let the canonical path handle it
    return True if a.equals(b) else None


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    spark_pdf = spark_df.toPandas()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    if _fast_equal(spark_pdf, oracle_pdf):
        return
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch, first diffs (sorted-row idx, spark, oracle): {diffs}"
        )
