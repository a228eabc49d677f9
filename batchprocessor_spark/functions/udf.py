"""User-code surface (SURVEY.md §2.4 end): pandas UDFs (scalar and
grouped) — the engine's analogue of the reference's only extension
point, the sink callback (V1/AsyncProcessor.java:18, V2/Flusher.java:12).

Both run as Arrow-batched pandas UDFs (vectorized JVM↔Python
exchange), never row-at-a-time Python UDFs. Both are SQL-oracled: the
UDF bodies compute expressions DuckDB can state declaratively, so the
correctness gate covers the Arrow exchange itself.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batchprocessor_spark.functions.exactmath import pd_to_units, to_units
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * 0.07 + 5.0, 4) AS fee,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders
    """,
    category="udf",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized): per-row fee computation +
    tier classification, applied to 15k orders in columnar batches."""

    @F.pandas_udf(T.DoubleType())
    def fee_udf(price: pd.Series) -> pd.Series:
        return (price * 0.07 + 5.0).round(4)

    @F.pandas_udf(T.StringType())
    def tier_udf(price: pd.Series) -> pd.Series:
        return pd.cut(
            price,
            bins=[float("-inf"), 50000, 200000, float("inf")],
            labels=["low", "mid", "high"],
            right=False,
        ).astype(str)

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        fee_udf("o_totalprice").alias("fee"),
        tier_udf("o_totalprice").alias("tier"),
    )


@register(
    "q_udf_grouped",
    oracle="""
    WITH stats AS (
      SELECT c_nationkey,
             avg(c_acctbal) AS mu,
             count(*)::BIGINT AS n
      FROM customer GROUP BY c_nationkey)
    SELECT c.c_custkey,
           c.c_nationkey,
           round(c.c_acctbal - s.mu, 6) AS bal_centered,
           s.n AS group_size
    FROM customer c JOIN stats s USING (c_nationkey)
    """,
    category="udf",
)
def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-nation mean-centering
    of account balances — each group arrives as one pandas DataFrame on
    an executor after a single shuffle on the group key."""
    c = load_table(spark, sf_dir, "customer")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_centered": (pdf["c_acctbal"] - mu).round(6),
                "group_size": len(pdf),
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        center,
        schema="c_custkey BIGINT, c_nationkey INT, bal_centered DOUBLE, group_size BIGINT",
    )


_CHUNK_W = 100


@register(
    "q_udf_table",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, text,
             unnest(generate_series(0, (length(text) - 1) // {_CHUNK_W})) AS i
      FROM documents)
    SELECT doc_id, i::INT AS chunk_id,
           substring(text, (i * {_CHUNK_W} + 1)::INT, {_CHUNK_W}) AS chunk,
           length(substring(text, (i * {_CHUNK_W} + 1)::INT, {_CHUNK_W}))::INT
             AS chunk_len
    FROM e
    """,
    category="udf",
)
def q_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one row in, N chunk rows out —
    fixed 100-char document chunking, the RAG-ingestion shape. This
    completes the user-code surface triple (scalar pandas UDF /
    grouped applyInPandas / table UDTF). Arrow exchange is enabled for
    the UDTF (runtime conf) so batches cross the JVM↔Python boundary
    columnar. The chunking itself is SQL-expressible (that is what
    makes the oracle possible); the query exists to exercise and
    value-check the UDTF path itself."""
    from pyspark.sql.functions import lit, udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="doc_id bigint, chunk_id int, chunk string, chunk_len int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            for i in range(0, max(1, len(text)), _CHUNK_W):
                piece = text[i : i + _CHUNK_W]
                yield doc_id, i // _CHUNK_W, piece, len(piece)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("bp_docs_udtf")
    return spark.sql(
        "SELECT c.* FROM bp_docs_udtf, LATERAL chunk_doc(doc_id, text) c"
    )


@register(
    "q_udf_grouped_agg",
    oracle="""
    SELECT c_mktsegment,
           round(sum(c_acctbal::DECIMAL(12,2) * (c_custkey % 7 + 1))::DOUBLE
                 / sum(c_custkey % 7 + 1), 6) AS weighted_bal,
           count(*)::BIGINT AS n
    FROM customer GROUP BY c_mktsegment
    """,
    category="udf",
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the UDAF analogue): one scalar per
    group, computed vectorized on the whole group's Arrow batch — here
    a weighted mean with deterministic synthetic weights. Distinct
    from applyInPandas (grouped-map): the UDF participates in a real
    aggregation plan, so Catalyst can combine it with other aggregates
    in one pass."""

    @F.pandas_udf(T.DoubleType())
    def weighted_bal(bal: pd.Series, key: pd.Series) -> float:
        # Exact integer accumulation (balances have 2 decimals), so the
        # result is independent of row arrival order — a float .sum()
        # would vary in the last bits across shuffles and risk flipping
        # the 6-decimal round against the oracle.
        w = (key % 7 + 1).astype("int64")
        cents = pd_to_units(bal, 100)
        return float(round((cents * w).sum() / 100.0 / w.sum(), 6))

    # Spark refuses to mix group-agg pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count is a
    # pandas aggregate too.
    @F.pandas_udf(T.LongType())
    def n_rows(key: pd.Series) -> int:
        return int(len(key))

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        weighted_bal("c_acctbal", "c_custkey").alias("weighted_bal"),
        n_rows("c_custkey").alias("n"),
    )


@register(
    "q_udf_arrow_map",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT AS dim,
           round(list_aggregate(list_transform(embedding::DOUBLE[],
                                               x -> x * x),
                                'sum'), 6) AS sq_norm
    FROM embeddings
    """,
    category="udf",
)
def q_udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow transform (the 4th Python-exchange API after scalar
    pandas UDF / applyInPandas / UDTF): per-vector squared L2 norm
    computed directly on Arrow RecordBatches with pyarrow+numpy — no
    pandas materialization at all, the cheapest possible Python
    exchange for numeric array data.

    Scale posture: embarrassingly parallel over whatever partitioning
    the scan produced (no shuffle); each batch moves JVM→Python once
    as Arrow buffers and numpy reduces it vectorized. The float
    arithmetic (square + pairwise-ordered sum) is written to match
    the oracle's left-fold exactly: np.add.reduce over the value
    buffer reshaped per row — for float32 inputs upcast to float64
    first, accumulation order is the list order on both engines.
    """
    import numpy as np
    import pyarrow as pa

    def sq_norms(batches):
        for batch in batches:
            vec_id = batch.column("vec_id")
            emb = batch.column("embedding")
            n = len(batch)
            # Per-row lengths from the ListArray offsets — NEVER a
            # uniform reshape, which would silently mix neighbouring
            # rows' elements whenever dims vary (or a null shifts the
            # flattened buffer) yet total length divides n.
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            lengths = (offsets[1:] - offsets[:-1]).astype("int64")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
            sq = flat * flat
            if n and (lengths == lengths[0]).all():
                # uniform dims: vectorized column-wise LEFT fold, the
                # association the SQL oracle states
                m = sq.reshape(n, lengths[0]) if lengths[0] else np.empty((n, 0))
                acc = np.zeros(n)
                for j in range(m.shape[1]):
                    acc = acc + m[:, j]
            else:
                # ragged dims: explicit per-row left fold
                acc = np.zeros(n)
                base = offsets[0]
                for i in range(n):
                    a = 0.0
                    for v in sq[offsets[i] - base : offsets[i + 1] - base]:
                        a = a + v
                    acc[i] = a
            yield pa.RecordBatch.from_arrays(
                [
                    vec_id,
                    pa.array(lengths.astype("int32"), type=pa.int32()),
                    pa.array(np.round(acc, 6), type=pa.float64()),
                ],
                names=["vec_id", "dim", "sq_norm"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(sq_norms, "vec_id BIGINT, dim INT, sq_norm DOUBLE")


@register(
    "q_udf_cogrouped",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*)::BIGINT AS n_clicks,
             sum(round(value * 100)::BIGINT)::BIGINT AS click_cents
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (
      SELECT user_id, count(*)::BIGINT AS n_purchases,
             sum(round(value * 100)::BIGINT)::BIGINT AS purchase_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(p.n_purchases, 0) AS n_purchases,
           (coalesce(p.purchase_cents, 0) - coalesce(c.click_cents, 0))::BIGINT
             AS cents_delta
    FROM c FULL JOIN p ON c.user_id = p.user_id
    """,
    category="udf",
)
def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped per-key Python merge: clicks and purchases grouped by
    user arrive as TWO aligned frames in one function call — the API
    for per-entity logic that needs both sides at once without a
    pre-join (sessionized attribution, feature joins, trajectory
    alignment). Computes per-user counts and the purchase-minus-click
    cents delta, exact by integer cents.

    r13 (guide §4, VERDICT r12 #3): applyInPandas → applyInArrow.
    With ~40k one-call-per-user keys the cost was never the payload
    (r12 measured pre-aggregation SLOWER) but the per-call pandas
    overhead: each key built two pandas frames (block manager,
    index) and one single-row result frame. The Arrow cogroup hands
    the same two aligned tables per key as zero-copy pyarrow.Tables
    and returns a one-row pa.table — 4.23 → 1.31 s median
    interleaved ×5 (3.2×, wins 5/5 reps). The cents conversion also
    moved JVM-side (to_units — identical half-away rounding to
    pd_to_units/DuckDB), so Python does a counted sum and nothing
    else.

    Scale posture: one shuffle per side on user_id (the cogroup key),
    then Arrow-batched per-key tables; no wide pre-join row explosion
    — each side arrives separately, sized by its own per-user volume.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load_table(spark, sf_dir, "events")
    cents = to_units(F.col("value"), 100).alias("cents")
    clicks = e.where(F.col("event_type") == "click").select("user_id", cents)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", cents
    )

    def merge(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        # Cogroup guarantees at least one side non-empty per key; the
        # key value is whatever either side carries.
        uid = (left if left.num_rows else right).column("user_id")[0].as_py()
        c = (pc.sum(left.column("cents")).as_py() or 0) if left.num_rows else 0
        p = (pc.sum(right.column("cents")).as_py() or 0) if right.num_rows else 0
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_clicks": pa.array([left.num_rows], pa.int64()),
                "n_purchases": pa.array([right.num_rows], pa.int64()),
                "cents_delta": pa.array([p - c], pa.int64()),
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInArrow(
            merge,
            "user_id BIGINT, n_clicks BIGINT, n_purchases BIGINT, cents_delta BIGINT",
        )
    )


# Per-language weights for the iterator-UDF scoring demo — stands in
# for the deserialized model artifact loaded once per executor task.
_ITER_WEIGHTS = {"en": 3, "de": 4, "fr": 5, "es": 6, "zh": 7}
_ITER_DEFAULT_W = 2

_ITER_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _ITER_WEIGHTS.items())
    + f" ELSE {_ITER_DEFAULT_W} END"
)


@register(
    "q_udf_scalar_iter",
    oracle=f"""
    SELECT doc_id,
           (({_ITER_CASE}) * len(string_split(text, ' ')) * 100)
             // n_chars AS score_bp
    FROM documents WHERE n_chars > 0
    """,
    category="udf",
)
def q_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF (SCALAR_ITER) — the
    model-inference exchange shape: the UDF body runs ONCE per task,
    pays its initialization (here a weight-table "model" load; in a
    real pipeline a tokenizer / ONNX session / embedding model) before
    the loop, then streams Arrow batches through the loaded state.
    This is the per-partition-amortized-init pattern that makes Python
    scoring of 10^9 documents viable — per-ROW or even per-BATCH model
    loads are the classic accidental 100× slowdown; the plain scalar
    pandas UDF (q_udf_scalar) cannot express "once per task" at all.

    The math stays integer (weight · word-count · 100 DIV chars) so
    the oracle pins the Arrow round-trip bit-for-bit; word counts are
    computed JVM-side (split) and only the weighted scoring crosses
    into Python — ship the narrow columns, not the text.

    Scale posture: no shuffle at all (scan → project → UDF); batches
    stream at spark.sql.execution.arrow.maxRecordsPerBatch, and
    executor memory holds one batch + the model, never the
    partition."""
    @F.pandas_udf(T.LongType())
    def score_iter(
        it: Iterator[Tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        weights = dict(_ITER_WEIGHTS)  # "model load": once per task
        for lang, n_words, n_chars in it:
            w = lang.map(weights).fillna(_ITER_DEFAULT_W).astype("int64")
            yield (w * n_words.astype("int64") * 100) // n_chars.astype("int64")

    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    d = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        "n_chars",
    )
    return d.select(
        "doc_id", score_iter("lang", "n_words", "n_chars").alias("score_bp")
    )
