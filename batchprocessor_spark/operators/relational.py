"""Scan / projection / filter operators (SURVEY.md §2.2).

These are the base of the engine's relational surface. They are
expressed declaratively so Catalyst pushes predicates and prunes
columns into the parquet scan — at 100 TB the scan reads only the
referenced columns and row groups (`PushedFilters` / `ReadSchema`
visible in `.explain("formatted")`).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import dec_sum, to_units
from batchprocessor_spark.plans.registry import REGISTRY, register
from batchprocessor_spark.scratch import scratch_dir
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
    category="scan",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan: reads exactly 4 of lineitem's 11 columns
    (column pruning reaches the parquet footer)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 30
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus IS NOT NULL
      AND (l_discount < 0.05 OR l_tax > 0.03)
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
    category="scan",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (AND/OR/IN/BETWEEN/IS NOT NULL + timestamp
    comparison); the conjunctive parts push down to the parquet reader."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").isNotNull()
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") > 0.03))
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q_source_formats",
    oracle="""
    SELECT l_returnflag,
           count(*)::BIGINT AS cnt,
           sum(l_orderkey)::BIGINT AS key_sum,
           sum(round(l_quantity)::BIGINT) AS qty_sum
    FROM lineitem GROUP BY l_returnflag
    """,
    category="scan",
)
def q_source_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON source/sink round-trip: even order keys exported to
    CSV, odd to JSON (sources/io.py sinks), both read back with
    EXPLICIT schemas (text-format inference is a second full scan at
    100 TB), unioned, and aggregated — the result must equal the same
    aggregate over the native parquet, which is exactly what the
    oracle computes. l_quantity is integral, so its text round-trip is
    exact by construction.

    This is an interop demo: at scale the pipeline reads whatever
    format the data landed in directly; the point driver-checked here
    is that the csv/json read AND write paths produce the same rows as
    parquet.
    """
    import tempfile

    from batchprocessor_spark.sources import io

    cols = ["l_orderkey", "l_returnflag", "l_quantity"]
    l = load_table(spark, sf_dir, "lineitem").select(*cols)
    tmp = scratch_dir("bp_fmt_")
    io.write(l.where(F.col("l_orderkey") % 2 == 0), f"{tmp}/csv", "csv")
    io.write(l.where(F.col("l_orderkey") % 2 == 1), f"{tmp}/json", "json")
    schema = "l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE"
    back = io.read(spark, f"{tmp}/csv", "csv", schema).unionByName(
        io.read(spark, f"{tmp}/json", "json", schema)
    )
    # NB: tmp intentionally outlives this function — the returned
    # DataFrame is lazy and still reads it at collect time.
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_orderkey").alias("key_sum"),
        F.sum(F.round("l_quantity").cast("long")).alias("qty_sum"),
    )


_MERGE_SPLIT = 400  # doc_id < 400 = current corpus; >= 400 plays the arriving batch
_MERGE_SHIFT = 50  # batch keys land at 350+: half collide (update), half are new (insert)


@register(
    "q_merge_upsert",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE doc_id < {_MERGE_SPLIT}),
    batch AS (
      SELECT doc_id - {_MERGE_SHIFT} AS doc_id, lang, source,
             n_chars + 1 AS n_chars
      FROM documents WHERE doc_id >= {_MERGE_SPLIT}),
    merged AS (
      SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             coalesce(b.lang, c.lang) AS lang,
             coalesce(b.source, c.source) AS source,
             coalesce(b.n_chars, c.n_chars) AS n_chars,
             CASE WHEN b.doc_id IS NULL THEN 'kept'
                  WHEN c.doc_id IS NULL THEN 'inserted'
                  ELSE 'updated' END AS op
      FROM corpus c FULL JOIN batch b ON c.doc_id = b.doc_id)
    SELECT op, count(*)::BIGINT AS cnt, sum(n_chars)::BIGINT AS chars
    FROM merged GROUP BY op
    """,
    category="scan",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert semantics without a table format: an arriving
    batch (keys shifted so half collide with the corpus and half are
    brand new) is merged —
    matching keys take the batch's row ("when matched update"),
    unmatched batch keys insert, untouched corpus rows are kept. The
    merge is ONE full outer join on the key + coalesce projection;
    the output audits the op mix, which the oracle pins exactly.

    Scale posture: this is the copy-on-write MERGE kernel — one
    shuffle of each side on the key (AQE handles skew), no driver
    involvement, and when the corpus is bucketed by key
    (sources/bucketing.py) the corpus-side shuffle disappears. Table
    formats (Delta/Iceberg) add file-level pruning on top; the join
    shape is the same.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    corpus = d.where(F.col("doc_id") < _MERGE_SPLIT)
    batch = d.where(F.col("doc_id") >= _MERGE_SPLIT).select(
        (F.col("doc_id") - _MERGE_SHIFT).alias("doc_id"),
        "lang",
        "source",
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    c, b = corpus.alias("c"), batch.alias("b")
    merged = c.join(b, F.col("c.doc_id") == F.col("b.doc_id"), "full").select(
        F.coalesce("b.doc_id", "c.doc_id").alias("doc_id"),
        F.coalesce("b.n_chars", "c.n_chars").alias("n_chars"),
        F.when(F.col("b.doc_id").isNull(), "kept")
        .when(F.col("c.doc_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("op"),
    )
    return merged.groupBy("op").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_chars").alias("chars"),
    )


@register(
    "q_source_partitioned",
    oracle="""
    SELECT o_orderstatus, count(*)::BIGINT AS cnt,
           sum(o_orderkey)::BIGINT AS key_sum
    FROM orders WHERE o_orderstatus IN ('O', 'F')
    GROUP BY o_orderstatus
    """,
    category="scan",
)
def q_source_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-pruned source: orders
    written `partitionBy(o_orderstatus)`, read back with a partition
    filter that must prune to 2 of 3 directories BEFORE any IO
    (`PartitionFilters` on the scan — gated in tests/test_plans.py),
    then aggregated; the result must equal the same aggregate over
    the native table, which the oracle computes.

    Scale posture: partition layout is THE first-order 100 TB lever —
    a date/status-partitioned table turns full scans into directory
    listings. The write side shows the layout contract (one dir per
    key, no shuffle beyond the write's own file sizing); the read
    side proves pruning happens at planning time, not per-row.
    """
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tmp = scratch_dir("bp_part_")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(tmp)
    back = spark.read.parquet(tmp).where(F.col("o_orderstatus").isin("O", "F"))
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "q_source_orc",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT AS cnt,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders
    WHERE o_totalprice > 1000
    GROUP BY o_orderstatus
    """,
    category="scan",
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip: orders exported to ORC (the other
    columnar format Spark ships natively — common when interoperating
    with Hive/Trino warehouses), read back, filtered and aggregated.
    The result must equal the same aggregate over the native parquet,
    which is what the oracle computes.

    Scale posture: ORC, like parquet, carries min/max stripe
    statistics — the o_totalprice > 1000 predicate reaches the ORC
    scan (PushedFilters), so the round-trip preserves not just the
    rows but the PRUNING characteristics a 100 TB table depends on.
    Totals ride the exact cents lane.
    """
    import tempfile

    from batchprocessor_spark.sources import io

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = scratch_dir("bp_orc_")
    io.write(o, f"{tmp}/orders_orc", "orc")
    back = io.read(spark, f"{tmp}/orders_orc", "orc")
    # NB: tmp intentionally outlives this function — the returned
    # DataFrame is lazy and still reads it at collect time.
    return (
        back.where(F.col("o_totalprice") > 1000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("o_totalprice"), 100)).cast("long").alias("cents"),
        )
    )


@register(
    "q_sql_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT)
             ::BIGINT AS revenue_u,
           (epoch_us(o.o_orderdate) // 1000000)::BIGINT AS odate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_u DESC, l.l_orderkey
    LIMIT 10
    """,
    category="scan",
)
def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) written in PURE SQL through the
    engine's SQL front end — the proof that `spark.sql` over the
    registered catalog views is a first-class query path with the
    same correctness discipline as the DataFrame builders (revenue in
    the exact 1e-4-dollar lane; the oracle is the same statement in
    DuckDB's dialect).

    Scale posture: Catalyst plans it identically to the DataFrame
    form — customer filter pushed to the scan and broadcast, orders ⋈
    lineitem as the large join, TakeOrderedAndProject for the top-10
    (no global sort). SQL text changes nothing about the physical
    strategy.
    """
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS revenue_u,
               unix_timestamp(o.o_orderdate) AS odate_s,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_u DESC, l.l_orderkey
        LIMIT 10
        """
    )


@register(
    "q_sql_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT)
             ::BIGINT AS revenue_u,
           count(*)::BIGINT AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_u DESC, n.n_name
    """,
    category="scan",
)
def q_sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) through the PURE-SQL front
    end: six-table join with the customer-and-supplier-share-a-nation
    constraint, region filter, one-year order window; revenue in the
    exact 1e-4-dollar lane. Same statement in DuckDB's dialect is the
    oracle.

    Scale posture (gated in tests/test_plans.py): region/nation/
    supplier/customer are dimension-sized and broadcast; lineitem ⋈
    orders is the one large join; the date filter reaches the orders
    parquet scan as PushedFilters. SQL text vs DataFrame builder
    changes nothing physical — which is the point of the twin."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS revenue_u,
               count(*) AS n_items
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue_u DESC, n.n_name
        """
    )


@register(
    "q_sql_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT)
             ::BIGINT AS revenue_u,
           round(c.c_acctbal * 100)::BIGINT AS acctbal_c,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_u DESC, c.c_custkey
    LIMIT 20
    """,
    category="scan",
)
def q_sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting) through the PURE-SQL front
    end: customers ranked by revenue lost to returned line items in a
    quarter — top 20. Money in the exact integer lanes (1e-4 dollars
    for revenue, cents for the balance).

    Scale posture (gated): l_returnflag and the date window reach the
    scans as PushedFilters; nation broadcasts; the top-20 is
    TakeOrderedAndProject, never a global sort."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS revenue_u,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_u DESC, c.c_custkey
        LIMIT 20
        """
    )


@register(
    "q_layout_bucketed",
    oracle="""
    SELECT o.o_orderstatus,
           count(*)::BIGINT AS n_lines,
           sum(round(l.l_quantity)::BIGINT)::BIGINT AS qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    category="scan",
)
def q_layout_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table layout + shuffle-free co-located join: orders and
    lineitem written `bucketBy(8, key).sortBy(key)` into catalog
    tables, then fact-fact joined reading the bucket layout — the join
    needs NO exchange and NO sort (both gated in tests/test_plans.py:
    exactly one Exchange in the whole plan, the aggregate's).

    Scale posture: bucketing is how a 100 TB warehouse amortizes its
    biggest joins — pay one clustered write, then every subsequent
    join/aggregate on the bucket key is exchange-free. The MERGE hint
    pins SMJ so the demonstration doesn't degrade to broadcast at
    fixture scale."""
    import tempfile

    from batchprocessor_spark.sources.bucketing import save_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    loc = scratch_dir("bp_bucket_")
    spark.sql("DROP TABLE IF EXISTS bp_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS bp_lineitem_bucketed")
    save_bucketed(o, "bp_orders_bucketed", "o_orderkey", buckets=8, path=f"{loc}/orders")
    save_bucketed(l, "bp_lineitem_bucketed", "l_orderkey", buckets=8, path=f"{loc}/lineitem")
    ob = spark.table("bp_orders_bucketed").hint("merge")
    lb = spark.table("bp_lineitem_bucketed")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
        )
    )


# Guarantee q_agg_basic is registered even when this module is
# imported standalone (outside operators/__init__'s ordered import).
import batchprocessor_spark.operators.aggregates  # noqa: E402,F401


@register(
    "q_sql_pricing_summary",
    # Same contract as q_agg_basic: reuse its oracle verbatim so the
    # SQL-front-end twin is value-identical to the DataFrame builder.
    oracle=REGISTRY["q_agg_basic"].oracle,
    category="scan",
)
def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) through the PURE SQL front end — the
    SQL twin of the flagship q_agg_basic DataFrame builder, sharing
    its exact scaled-integer money lane and its oracle verbatim.
    Catalyst plans both to the same partial+final hash aggregate over
    one pushed-down scan (plan equality gated in tests/test_plans.py).
    """
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH s AS (
          SELECT l_returnflag, l_linestatus,
                 sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
                 sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     AS DECIMAL(38,0))) AS sp,
                 sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS DECIMAL(38,0))) AS sdp,
                 sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     * (100 + CAST(round(l_tax * 100) AS BIGINT))
                     AS DECIMAL(38,0))) AS sch,
                 sum(CAST(round(l_discount * 100) AS BIGINT)) AS sd,
                 count(*) AS cnt
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus,
               CAST(sq AS DOUBLE) AS sum_qty,
               CAST(sp DIV 100 AS DOUBLE) + CAST(sp % 100 AS DOUBLE) / 100
                 AS sum_base_price,
               CAST(sdp DIV 10000 AS DOUBLE) + CAST(sdp % 10000 AS DOUBLE) / 10000
                 AS sum_disc_price,
               CAST(sch DIV 1000000 AS DOUBLE) + CAST(sch % 1000000 AS DOUBLE) / 1000000
                 AS sum_charge,
               CAST(sq AS DOUBLE) / cnt AS avg_qty,
               (CAST(sp DIV 100 AS DOUBLE) + CAST(sp % 100 AS DOUBLE) / 100) / cnt
                 AS avg_price,
               (CAST(sd AS DOUBLE) / 100) / cnt AS avg_disc,
               cnt AS count_order
        FROM s
        """
    )


@register(
    "q_sql_forecast_revenue",
    oracle="""
    SELECT count(*)::BIGINT AS n_lines,
           sum(round(l_extendedprice * 100)::BIGINT
               * round(l_discount * 100)::BIGINT)::BIGINT AS revenue_u
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    category="scan",
)
def q_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) through the pure SQL
    front end: the canonical full-pushdown query — a single scan whose
    date/discount/quantity conjunction must ALL reach the parquet
    reader (gated in tests/test_plans.py), one global aggregate, no
    join, no shuffle beyond the 1-row partial merge. Revenue in the
    exact 1e-4-dollar lane (cents × discount-percent)."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_lines,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_u
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "q_source_schema_evolution",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang, NULL::BIGINT AS n_chars
      FROM documents WHERE doc_id % 2 = 0),
    v2 AS (
      SELECT doc_id, lang, n_chars
      FROM documents WHERE doc_id % 2 = 1),
    merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           count(n_chars)::BIGINT AS n_with_chars,
           coalesce(sum(n_chars), 0)::BIGINT AS chars
    FROM merged GROUP BY lang
    """,
    category="scan",
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches: an old writer emitted
    (doc_id, lang), a later one added n_chars; `mergeSchema` unifies
    the footers at read time and the missing column surfaces as NULL
    for old files — the additive-evolution contract every long-lived
    ingest pipeline depends on. The aggregate separates row counts
    from non-null counts so the NULL-fill behavior is value-pinned by
    the oracle.

    Scale posture: mergeSchema costs one footer read per file at
    planning (fine for batch); production tables at 100 TB register
    the evolved schema in a catalog instead, but the NULL-fill read
    semantics are identical."""
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    tmp = scratch_dir("bp_evo_")
    d.where(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/b1")
    d.where(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/b2")
    back = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/b1", f"{tmp}/b2")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").alias("n_with_chars"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("chars"),
    )


@register(
    "q_layout_partition_pruned",
    oracle="""
    SELECT year(o_orderdate)::INT AS o_year, o_orderstatus,
           count(*)::BIGINT AS n_orders
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    """,
    category="scan",
)
def q_layout_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout + DYNAMIC partition pruning: orders
    written ``partitionBy(o_year)`` to a scratch location, then joined
    against a tiny year dimension whose filter is only known at run
    time — Catalyst inserts a dynamicpruning subquery into the fact
    scan's PartitionFilters, so only the 2 matching year directories
    are read (gated in tests/test_plans.py). This is the OTHER half
    of the 100 TB layout story next to bucketing (q_layout_bucketed):
    bucketing kills the join exchange, partitioning kills the scan —
    a date-partitioned fact at scale is read 2/7ths instead of 7/7ths
    by exactly this mechanism.

    The year dim is a bounded constant table (same pattern as
    q_join_range_bands's banding table); the oracle states the
    equivalent static filter semantics.

    The registered builder freezes the (tiny, aggregated) result and
    removes the scratch copy (ADVICE r4 — mkdtemp leak per run); the
    DPP plan gate uses partition_pruned_lazy() directly to inspect
    the live plan before cleanup."""
    df, loc = partition_pruned_lazy(spark, sf_dir)
    try:
        rows = df.collect()
        return spark.createDataFrame(rows, df.schema)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def partition_pruned_lazy(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """The LAZY q_layout_partition_pruned plan plus its scratch dir.
    Caller owns cleanup (shutil.rmtree of the returned path) after
    materializing/inspecting the plan."""
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.year("o_orderdate").alias("o_year"),
    )
    loc = scratch_dir("bp_part_")
    o.write.mode("overwrite").partitionBy("o_year").parquet(f"{loc}/orders_by_year")
    fact = spark.read.parquet(f"{loc}/orders_by_year")
    years = spark.createDataFrame(
        [(1996, "target"), (1997, "target"), (1990, "cold")],
        "y INT, tag STRING",
    ).where(F.col("tag") == "target")
    df = (
        fact.join(years, fact.o_year == years.y)
        .groupBy(F.col("o_year").cast("int").alias("o_year"), "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return df, loc



@register(
    "q_layout_dynamic_overwrite",
    oracle="""
    SELECT year(o_orderdate)::INT AS o_year,
           count(*)::BIGINT AS n_orders,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders
    WHERE NOT (year(o_orderdate) = 1996 AND o_orderstatus = 'F')
    GROUP BY 1
    """,
    category="scan",
)
def q_layout_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (INSERT OVERWRITE ... PARTITION
    semantics, spark.sql.sources.partitionOverwriteMode=dynamic): a
    year-partitioned orders table gets ONE partition (1996) rewritten
    with corrected data (its 'F'-status rows dropped) — and only the
    directories present in the incoming write are replaced; every
    other year survives untouched. This is the warehouse's daily
    backfill/compaction primitive: in STATIC mode the same overwrite
    would TRUNCATE the whole table to the one incoming partition —
    the classic data-loss footgun the dynamic mode exists to prevent.
    The read-back per-year totals carry the value oracle (exact
    cents), which fails if the overwrite either leaked into other
    years or left stale 1996 rows behind.

    Scale posture: rewrite cost is proportional to the TOUCHED
    partitions, never the table; the final read is one partitioned
    scan. The mode is set transiently and restored (session configs
    are engine-owned elsewhere — session.py)."""
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.year("o_orderdate").alias("o_year"),
    )
    loc = tempfile.mkdtemp(prefix="bp_dynow_")
    try:
        path = f"{loc}/orders_by_year"
        o.write.mode("overwrite").partitionBy("o_year").parquet(path)
        fixed_1996 = o.where(
            (F.col("o_year") == 1996) & (F.col("o_orderstatus") != "F")
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            fixed_1996.write.mode("overwrite").partitionBy("o_year").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        out = (
            spark.read.parquet(path)
            .groupBy(F.col("o_year").cast("int").alias("o_year"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(to_units(F.col("o_totalprice"), 100)).alias("cents"),
            )
        )
        rows = out.collect()  # freeze before the scratch dir is removed
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "q_sql_promo_share",
    oracle="""
    WITH j AS (
      SELECT round(l.l_extendedprice * 100)::BIGINT
               * (100 - round(l.l_discount * 100)::BIGINT) AS rev_u,
             (p.p_type LIKE 'STANDARD%') AS is_std
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
        AND l.l_shipdate < TIMESTAMP '1996-10-01')
    SELECT count(*)::BIGINT AS n_lines,
           sum(CASE WHEN is_std THEN rev_u ELSE 0 END)::BIGINT AS std_rev_u,
           sum(rev_u)::BIGINT AS total_rev_u,
           ((10000 * sum(CASE WHEN is_std THEN rev_u ELSE 0 END))
              // sum(rev_u))::BIGINT AS std_share_bp
    FROM j
    """,
    category="scan",
)
def q_sql_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion-revenue share; the fixture's part
    types are STANDARD/ECONOMY/etc., so 'STANDARD%' plays PROMO's
    role) through the pure SQL front end: one ship-month of lineitem
    joined to part, conditional revenue share of the matching type
    class. The plan this must make: the date conjunction pushed into
    the fact scan (one month read, not seven years), part BROADCAST
    (it is the dimension), and ONE conditional aggregate — no second
    pass for the numerator. Revenue in the exact 1e-4-dollar lane;
    the share emitted in integer basis points via DIV so the ratio
    cannot drift cross-engine."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH j AS (
          SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_u,
                 (p.p_type LIKE 'STANDARD%') AS is_std
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
            AND l.l_shipdate < TIMESTAMP '1996-10-01')
        SELECT count(*) AS n_lines,
               sum(CASE WHEN is_std THEN rev_u ELSE 0 END) AS std_rev_u,
               sum(rev_u) AS total_rev_u,
               CAST((10000 * sum(CASE WHEN is_std THEN rev_u ELSE 0 END))
                    DIV sum(rev_u) AS BIGINT) AS std_share_bp
        FROM j
        """
    )


@register(
    "q_sql_market_share",
    oracle="""
    WITH vol AS (
      SELECT year(o.o_orderdate)::BIGINT AS o_year,
             round(l.l_extendedprice * 100)::BIGINT
               * (100 - round(l.l_discount * 100)::BIGINT) AS rev_u,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01')
    SELECT o_year,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN supp_nation = 'NATION_0' THEN rev_u ELSE 0 END)
             ::BIGINT AS nation_rev_u,
           sum(rev_u)::BIGINT AS total_rev_u,
           ((10000 * sum(CASE WHEN supp_nation = 'NATION_0'
                              THEN rev_u ELSE 0 END))
              // sum(rev_u))::BIGINT AS share_bp
    FROM vol GROUP BY o_year
    """,
    category="sql",
)
def q_sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share) through the pure SQL
    front end: within AMERICA's consumer market for STANDARD parts
    over 1995-96, what yearly share of supplied revenue came from
    NATION_0's suppliers. The widest declared join tree in the
    registry — lineitem joined to orders (fact-fact) plus FIVE
    dimension hops (part, supplier, customer, nation x2 via distinct
    roles, region) — exactly the query Catalyst's join reordering +
    broadcast selection exists for. Revenue in the exact
    1e-4-dollar lane; shares in integer basis points via DIV (both
    operands non-negative, so floor == truncate cross-engine).

    The plan this must make (gated): the two-year date range pushed
    into the orders scan, the region/part filters pushed into their
    dim scans, every dimension BROADCAST (no dim ever shuffles the
    fact side), and the single fact-fact SortMergeJoin carrying the
    only big exchange. Reference: the engine's SQL lifecycle
    (SURVEY §3.4) — same text runs via Engine.sql()."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH vol AS (
          SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_u,
                 n2.n_name AS supp_nation
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'AMERICA'
            AND p.p_type = 'STANDARD'
            AND o.o_orderdate >= TIMESTAMP '1995-01-01'
            AND o.o_orderdate < TIMESTAMP '1997-01-01')
        SELECT o_year,
               count(*) AS n_lines,
               sum(CASE WHEN supp_nation = 'NATION_0' THEN rev_u ELSE 0 END)
                 AS nation_rev_u,
               sum(rev_u) AS total_rev_u,
               CAST((10000 * sum(CASE WHEN supp_nation = 'NATION_0'
                                      THEN rev_u ELSE 0 END))
                    DIV sum(rev_u) AS BIGINT) AS share_bp
        FROM vol GROUP BY o_year
        """
    )


@register(
    "q_source_corrupt_records",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
    SELECT o_orderstatus AS status,
           count(*)::BIGINT AS n,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM base WHERE o_orderkey % 7 <> 0 GROUP BY o_orderstatus
    UNION ALL
    SELECT '_corrupt', count(*)::BIGINT, 0::BIGINT
    FROM base WHERE o_orderkey % 7 = 0
    """,
    category="source",
)
def q_source_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSONL ingestion with corrupt-record quarantine —
    the batch twin of the streaming retry→DLQ lane (O12): orders are
    round-tripped through a scratch JSON-lines file in which every
    7th row (o_orderkey % 7 == 0, deterministic) is mangled into
    invalid JSON; the read back declares an explicit schema plus
    columnNameOfCorruptRecord, so bad lines land in the quarantine
    column with NULL data fields instead of killing the job
    (FAILFAST) or silently disappearing (DROPMALFORMED). Output:
    per-status counts + exact cents over the GOOD rows, plus one
    '_corrupt' audit row — the oracle recomputes both directly from
    orders, which fails if the reader dropped, double-counted, or
    mis-quarantined any line.

    Scale posture: schema-explicit JSON read (no inference pass —
    inference at 100 TB is a full extra scan), quarantine predicate
    evaluated inline, one aggregate. Scratch is collect-frozen and
    removed (the q_layout_dynamic_overwrite discipline)."""
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    line = F.when(
        F.col("o_orderkey") % 7 == 0,
        F.concat(F.lit('{"o_orderkey": '), F.col("o_orderkey"), F.lit(" BROKEN")),
    ).otherwise(
        F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
    )
    loc = tempfile.mkdtemp(prefix="bp_corrupt_")
    try:
        path = f"{loc}/orders_jsonl"
        o.select(line.alias("value")).write.mode("overwrite").text(path)
        schema = (
            "o_orderkey BIGINT, o_orderstatus STRING, "
            "o_totalprice DOUBLE, _corrupt STRING"
        )
        r = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path)
        )
        # One conditional aggregate for both lanes: a branch that only
        # referenced _corrupt would trip Spark's
        # QUERY_ONLY_CORRUPT_RECORD_COLUMN guard (and re-scan anyway).
        out = (
            r.select(
                F.when(F.col("_corrupt").isNotNull(), F.lit("_corrupt"))
                .otherwise(F.col("o_orderstatus"))
                .alias("status"),
                F.when(
                    F.col("_corrupt").isNull(),
                    to_units(F.col("o_totalprice"), 100),
                )
                .otherwise(F.lit(0))
                .alias("cents_i"),
            )
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents_i").cast("long").alias("cents"),
            )
        )
        rows = out.collect()  # freeze before the scratch dir is removed
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "q_sql_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT))::BIGINT
               AS total_rev_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev_u
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev_u = (SELECT max(total_rev_u) FROM revenue)
    """,
    category="sql",
)
def q_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue) through the
    pure SQL front end: the revenue CTE stands in for Q15's view, and
    the max-revenue filter is a SCALAR SUBQUERY over the same CTE —
    the shape that tests whether the planner evaluates the tiny
    aggregate once as a reusable subquery result instead of per-row
    (Spark plans it as a ReusedExchange/Subquery over the revenue
    aggregate; ties return multiple rows, which the set-compare
    handles). Revenue in the exact 1e-4-dollar lane, quarter filter
    pushed to the fact scan (gated), supplier joined by broadcast."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS total_rev_u
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_rev_u
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_rev_u = (SELECT max(total_rev_u) FROM revenue)
        """
    )


@register(
    "q_layout_compaction",
    oracle="""
    SELECT 'before' AS stage, 32::BIGINT AS n_files,
           count(*)::BIGINT AS n_rows,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders
    UNION ALL
    SELECT 'after', 4::BIGINT, count(*)::BIGINT,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT
    FROM orders
    """,
    category="scan",
)
def q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the operational fix for the
    many-small-files problem every spool/flush sink creates (at
    100 TB each file costs an open + footer parse + scheduler task;
    10x fewer files is 10x less planning overhead): orders written as
    32 deliberately-small files, then `sources/compaction.compact`
    rewrites them into 4 via coalesce (merge-down needs NO shuffle)
    with an atomic temp-dir swap. The audit row pair pins file counts
    AND exact content (rows + cents) before/after — a compaction that
    lost or duplicated a single row fails the hash.

    Scale posture: coalesce(4) is a map-side file merge; the atomic
    swap (write sibling, rename, remove old) is the pattern that
    keeps concurrent readers consistent. Scratch is collect-frozen
    and removed (the q_layout_dynamic_overwrite discipline)."""
    import os
    import shutil
    import tempfile

    from batchprocessor_spark.sources.compaction import compact

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    loc = tempfile.mkdtemp(prefix="bp_compact_")
    try:
        path = f"{loc}/orders_small"
        o.repartition(32).write.mode("overwrite").parquet(path)

        def audit(stage: str, n_files: int) -> DataFrame:
            return (
                spark.read.parquet(path)
                .agg(
                    F.lit(stage).alias("stage"),
                    F.lit(n_files).cast("long").alias("n_files"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(to_units(F.col("o_totalprice"), 100))
                    .cast("long")
                    .alias("cents"),
                )
            )

        n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        before = audit("before", n_before)
        rows = before.collect()
        n_after = compact(spark, path, target_files=4)
        after = audit("after", n_after)
        rows += after.collect()
        return spark.createDataFrame(rows, after.schema)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "q_sql_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    category="sql",
)
def q_sql_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) through the pure SQL
    front end: one quarter of orders having at least one line shipped
    after the order date, counted by priority. The shape tests
    correlated-EXISTS decorrelation: Spark must rewrite the subquery
    as a LEFT SEMI join on o_orderkey with the l_shipdate >
    o_orderdate condition attached — never a per-row subquery probe —
    while the quarter filter pushes into the orders scan (both
    plan-gated)."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_sql_waiting_orders",
    oracle="""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1),
    late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
      WHERE l_shipdate > TIMESTAMP '1998-01-01'),
    only_late AS (
      SELECT late.l_orderkey, min(late.l_suppkey) AS s
      FROM late JOIN multi ON late.l_orderkey = multi.l_orderkey
      GROUP BY late.l_orderkey HAVING count(DISTINCT late.l_suppkey) = 1)
    SELECT s_name, count(*)::BIGINT AS numwait
    FROM only_late JOIN supplier ON s = s_suppkey
    GROUP BY s_name
    """,
    category="sql",
)
def q_sql_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting),
    restated set-wise instead of with Q21's double correlated
    EXISTS/NOT EXISTS: among multi-supplier orders, find those where
    EXACTLY ONE supplier shipped late (after the cutoff) — that
    supplier is the one who held the order up — and count blamed
    orders per supplier. The aggregate-then-having formulation is the
    decorrelated form the EXISTS pair rewrites to, and at scale it is
    strictly better: two grouped passes over lineitem + one join,
    instead of two correlated probes per line.

    Plan gate: supplier broadcasts; both lineitem aggregates are
    partial+final on l_orderkey; the late-date filter pushes to its
    scan."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH multi AS (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1),
        late AS (
          SELECT l_orderkey, l_suppkey FROM lineitem
          WHERE l_shipdate > TIMESTAMP '1998-01-01'),
        only_late AS (
          SELECT late.l_orderkey, min(late.l_suppkey) AS s
          FROM late JOIN multi ON late.l_orderkey = multi.l_orderkey
          GROUP BY late.l_orderkey
          HAVING count(DISTINCT late.l_suppkey) = 1)
        SELECT s_name, count(*) AS numwait
        FROM only_late JOIN supplier ON s = s_suppkey
        GROUP BY s_name
        """
    )


@register(
    "q_sql_big_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice * 100)::BIGINT AS total_cents,
           sum(round(l.l_quantity)::BIGINT)::BIGINT AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 280)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    category="sql",
)
def q_sql_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders) through the pure SQL
    front end: orders whose total line quantity exceeds a threshold,
    found via an IN-subquery OVER AN AGGREGATE WITH HAVING — the
    planner shape where the subquery must first group lineitem, apply
    the having filter, and then semi-join the result back (never a
    per-row membership probe). Quantities are integral in the
    fixture, so the HAVING threshold and the output total_qty are
    exact; money in cents.

    Plan gate: the aggregated subquery reaches the orders side as a
    join (LeftSemi or inner on the grouped keys), customer joins by
    broadcast, and no InSubquery probe survives planning."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_name, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               sum(CAST(round(l.l_quantity) AS BIGINT)) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 280)
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        """
    )


@register(
    "q_source_text_lines",
    oracle="""
    SELECT lang,
           count(*)::BIGINT AS n_lines,
           sum(length(text))::BIGINT AS total_chars,
           min(length(text))::BIGINT AS min_len,
           max(length(text))::BIGINT AS max_len
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    category="scan",
)
def q_source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-format source round-trip — the rawest ingestion path a
    corpus pipeline has (one document per line, no schema): documents
    are exported line-per-doc with a `lang\\ttext` prefix via the text
    SINK, read back with `spark.read.text`, and the prefix is split
    off again. The per-lang line counts and length stats must equal
    the same aggregate over the native parquet (the oracle) — a lost
    or merged line, a mangled delimiter, or an encoding slip changes
    a count or a length. Completes the source-format matrix
    (parquet / CSV / JSON / ORC / text).

    Scale posture: text read is splittable by line and carries no
    footer metadata — the format you get from upstream dumps; the
    point of the round-trip is that parsing happens as narrow JVM
    projections (split on the FIRST tab only), then one aggregate.
    The fixture text is tab-free and single-line (pinned by the
    count parity itself: an embedded newline would split a doc)."""
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    tmp = scratch_dir("bp_text_")
    lines = d.select(
        F.concat_ws("\t", F.col("lang"), F.col("text")).alias("value")
    )
    lines.write.mode("overwrite").text(f"{tmp}/docs_txt")
    back = spark.read.text(f"{tmp}/docs_txt")
    # NB: tmp outlives this function (lazy read), removed at exit.
    parsed = back.select(
        F.substring_index(F.col("value"), "\t", 1).alias("lang"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return (
        parsed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.min(F.length("text")).cast("long").alias("min_len"),
            F.max(F.length("text")).cast("long").alias("max_len"),
        )
        .orderBy("lang")
    )


_BINSRC_N = 50  # files materialized for the binaryFile round-trip


@register(
    "q_source_binary_files",
    oracle=f"""
    SELECT doc_id,
           length(text)::BIGINT AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {_BINSRC_N}
    """,
    category="source",
)
def q_source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` built-in source — the ingestion path for
    multimodal corpora that land as LOOSE FILES (images, audio, PDFs)
    rather than rows: one row per file with (path, modificationTime,
    length, content BINARY), here round-tripped by materializing
    document texts as .txt files and reading them back; the check is
    content fidelity (byte length + md5 vs the documents table — the
    fixture is ASCII, pinned by tests/test_multimodal.py, so DuckDB's
    string md5 equals the file-bytes md5).

    Scale posture: binaryFile parallelizes BY FILE (small files pack
    many per task under maxPartitionBytes; a huge file is one task —
    binary content is not splittable), pushes down path predicates
    (pathGlobFilter here), and feeds content straight into the
    mapInPandas decode stage (functions/multimodal.py) without any
    row-materialization detour through a manifest table. The 50-file
    driver-side materialization is test scaffolding, not the
    operator: real corpora arrive as files."""
    import os

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _BINSRC_N)
        .select("doc_id", "text")
    )
    tmp = scratch_dir("bp_binsrc_")
    for r in docs.collect():  # model-sized: _BINSRC_N tiny fixture rows
        with open(os.path.join(tmp, f"doc_{int(r['doc_id']):06d}.txt"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(tmp)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
