#!/usr/bin/env python
"""Synthesize a repo-local sf0.3 scale point from the driver's sf0.1
parquet (VERDICT r5 #5: every headline query was still overhead-
dominated at sf0.1, so the measured log-log slopes under-constrained
the linearity claim — one larger SF makes slope_last load-bearing).

/root/testdata is read-only, so the output lands at
``<repo>/.testdata/sf0.3/<table>.parquet`` where ``bench.py``'s
``_scale_dirs`` auto-discovers it (headline queries only).

Construction: 3 key-shifted copies of every sf0.1 table (dims
``region``/``nation`` stay single-copy, as TPC-H holds them constant
across SF).  The shift keeps every *distribution* the data-dependent
operators see invariant, so a 3x time ratio means "3x data", not
"different data":

- every key domain (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) shifts by ``copy * 10**9`` — joins and
  group-bys gain 3x groups of the same size rather than 3x-heavier
  groups, matching how a bigger TPC-H SF grows;
- ``documents.text`` is caesar-rotated per copy (letters only,
  length-preserving, so ``n_chars`` stays valid) — near-dup density
  per document is unchanged and copies are NOT near-dups of each
  other, otherwise minhash candidate counts would blow up
  quadratically by construction and fake a superlinear flag;
- ``embeddings.embedding`` gets a small deterministic per-copy,
  per-dimension offset — copies are not exact duplicates, cosine
  structure is preserved;
- timestamps are untouched: a bigger SF means denser activity over
  the same calendar window, exactly like TPC-H.

Run: PYTHONPATH=. python scripts/gen_sf03.py   (~10 s, idempotent)
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchprocessor_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF03_SRC", "/root/testdata/sf0.1")
# Overridable for one-off larger points (e.g. COPIES=10 → sf1, written
# somewhere bench does NOT auto-discover, for a manual 5-point run
# recorded in BENCH.md — the driver's per-round bench stays bounded).
COPIES = int(os.environ.get("SPARK_GRAFT_SF_COPIES", "3"))
OUT = os.environ.get(
    "SPARK_GRAFT_SF_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata",
        "sf0.3",
    ),
)
SHIFT = 10**9  # > any sf0.1 key

# table -> columns to key-shift per copy
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # constant across SF, like TPC-H


def rotated_text(col, k: int):
    """Caesar-rotate a-z/A-Z by k (length-preserving, deterministic).

    The rotation alphabet has period 26, so a copy index k >= 26 would
    silently collapse to the identity mapping and emit exact-duplicate
    document texts — faking a quadratic near-dup blowup in scaling
    data (ADVICE r6). Guard the period explicitly: beyond 26 copies
    the generator must grow a second distinguishing transform, not
    quietly duplicate. ValueError, not assert, so the guard survives
    ``python -O`` (ADVICE r7)."""
    if not 0 <= k < 26:
        raise ValueError(
            f"rotated_text period exhausted at k={k}: >26 copies need a "
            "second text transform (e.g. per-copy token prefix)"
        )
    if k == 0:
        return col
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    return F.translate(
        col,
        lower + upper,
        lower[k:] + lower[:k] + upper[k:] + upper[:k],
    )


def main() -> None:
    spark = get_spark("gen-sf03")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = OUT + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{t}.parquet")
        print(f"# {t}: copied (dim)")

    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT).cast("bigint"))
            if t == "documents":
                df = df.withColumn("text", rotated_text(F.col("text"), i))
            if t == "embeddings":
                # small per-copy, per-dim offset; keeps copies distinct
                # without destroying cosine neighborhoods
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x + F.lit(i * 0.0137) * ((j % 7) - 3).cast("float")
                        ).cast("float"),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(8).write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
        n = spark.read.parquet(f"{tmp}/{t}.parquet").count()
        print(f"# {t}: {n} rows")

    shutil.rmtree(OUT, ignore_errors=True)
    os.rename(tmp, OUT)
    print(f"# sf0.3 written to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
