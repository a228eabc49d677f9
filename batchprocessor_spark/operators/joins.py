"""Join operators (SURVEY.md §2.2): broadcast/sort-merge equi joins,
outer, semi/anti, cross, non-equi range, and a scalable as-of join.

Scale notes (100 TB posture):
- Small dimensions are explicitly ``F.broadcast`` so the fact table
  never shuffles for them.
- Fact-fact joins shuffle on the join key once; AQE handles skew.
- The as-of join deliberately avoids the naive range-join explosion
  (every purchase × every preceding click): it is a union + windowed
  last-non-null, i.e. ONE shuffle on (user_id) and a per-partition
  sort — the idiom that survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import (
    dec_sum,
    descale,
    sql_descale,
    sql_units,
    to_units,
)
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_join_inner_broadcast",
    oracle=f"""
    WITH s AS (
      SELECT p_brand, count(*)::BIGINT AS cnt,
             sum({sql_units("l_extendedprice", 100)}
                 * (100 - {sql_units("l_discount", 100)})) AS sdp
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand)
    SELECT p_brand, cnt, {sql_descale("sdp", 10000)} AS revenue FROM s
    """,
    category="join",
)
def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact→small dim; the dim is broadcast so lineitem
    never shuffles for the join (only for the tiny final agg). Revenue
    runs in the exact scaled-integer lane (functions/exactmath.py):
    long products per row, decimal(38,0) accumulator, DIV/MOD descale."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dp = to_units(F.col("l_extendedprice"), 100) * (
        100 - to_units(F.col("l_discount"), 100)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum(dp).alias("sdp"))
        .select("p_brand", "cnt", descale("sdp", 10000).alias("revenue"))
    )


@register(
    "q_join_inner_sortmerge",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority, count(*)::BIGINT AS cnt,
             sum({sql_units("l_extendedprice", 100)}) AS sp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority)
    SELECT o_orderpriority, cnt, {sql_descale("sp", 100)} AS revenue FROM s
    """,
    category="join",
)
def q_join_inner_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join (orders ⋈ lineitem). At scale both sides are
    large → Catalyst picks shuffle sort-merge; AQE splits skewed keys.
    Revenue uses the exact cents lane — a double sum's rounding is
    summation-order-dependent and partial aggregation makes that order
    nondeterministic."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("l_extendedprice"), 100)).alias("sp"),
        )
        .select("o_orderpriority", "cnt", descale("sp", 100).alias("revenue"))
    )


@register(
    "q_join_left",
    oracle=f"""
    WITH s AS (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS num_orders,
             coalesce(sum({sql_units("o_totalprice", 100)}), 0) AS sp
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_custkey, num_orders, {sql_descale("sp", 100)} AS total_spent FROM s
    """,
    category="join",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (num_orders=0);
    totals in the exact cents lane."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            F.coalesce(
                dec_sum(to_units(F.col("o_totalprice"), 100)),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("sp"),
        )
        .select("c_custkey", "num_orders", descale("sp", 100).alias("total_spent"))
    )


@register(
    "q_join_full",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, count(*)::BIGINT AS sup_cnt FROM supplier GROUP BY 1),
         c AS (SELECT c_nationkey AS nk, count(*)::BIGINT AS cust_cnt FROM customer GROUP BY 1)
    SELECT coalesce(s.nk, c.nk) AS nationkey, sup_cnt, cust_cnt
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
    category="join",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (aggregate-then-join
    keeps the shuffled data minimal)."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("sup_cnt"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    return (
        s.join(c, s.nk == c.nk2, "full")
        .select(F.coalesce("nk", "nk2").alias("nationkey"), "sup_cnt", "cust_cnt")
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 100000)
    """,
    category="join",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join (left semi): customers with at least one big order.
    Semi joins shuffle only keys — no row multiplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    category="join",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_acctbal")


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    category="join",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two bounded dimensions (5 × 25). Cross joins are
    only ever issued on provably small inputs; the small side broadcasts."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@register(
    "q_join_theta_range",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS cnt,
           round(avg(l_quantity), 4) AS avg_qty
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_shipdate > o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    category="join",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range-band join ("shipped within 60 days of ordering").
    The equi key carries the shuffle; the range predicate is evaluated
    post-match, so this stays a sort-merge join — NOT a nested loop."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate)
        & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return (
        o.join(l, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@register(
    "q_join_range_bands",
    oracle="""
    WITH bands(band_id, lo, hi) AS (
      VALUES (0, 0.0, 250.0), (1, 250.0, 500.0), (2, 500.0, 750.0),
             (3, 750.0, 1000.0), (4, 1000.0, 1250.0), (5, 1250.0, 1500.0),
             (6, 1500.0, 1750.0), (7, 1750.0, 2100.0)
    )
    SELECT band_id, count(*)::BIGINT AS cnt,
           sum(round(p_retailprice * 100)::BIGINT) / 100.0 / count(*) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
    category="join",
)
def q_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join against a tiny banding table →
    broadcast nested-loop with a broadcast side of 8 rows. The only
    sane physical plan for arbitrary theta joins at scale."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(i, i * 250.0, (i + 1) * 250.0 if i < 7 else 2100.0) for i in range(8)],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    # avg in the exact cents lane: sum(cents)/100.0/cnt runs the same
    # two IEEE divides on both engines, so no round() is needed.
    cents = F.sum(F.round(p.p_retailprice * 100).cast("long"))
    return (
        p.join(F.broadcast(bands), (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (cents / F.lit(100.0) / F.count(F.lit(1))).alias("avg_price"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
         pc AS (
           SELECT p.event_id AS purchase_id, p.user_id AS user_id,
                  c.event_id AS click_id, c.value AS click_value,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT purchase_id, user_id, click_id, click_value
    FROM pc WHERE rn = 1
    """,
    category="join",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest click of the same user
    at-or-before the purchase time (ties broken by highest event_id).

    Implemented as the SCALABLE idiom — union both sides, one window
    over (user_id, ts) carrying the last-seen click forward — instead
    of the naive `ts <= ts` join that multiplies rows quadratically.
    The oracle states the same semantics declaratively.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("tag"),
        # Null on purchase rows so last(..., ignorenulls) skips them;
        # a struct keeps (click_id, click_value) from the SAME click row.
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("event_id").alias("click_id"), F.col("value").alias("click_value")),
        ).alias("click"),
    )
    # Order: time asc; at equal ts clicks sort before purchases (tag),
    # and among same-ts clicks the highest event_id wins (last).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tag").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "tag",
        F.last("click", ignorenulls=True).over(w).alias("click"),
    )
    return merged.where(F.col("tag") == 1).select(
        "purchase_id",
        "user_id",
        F.col("click.click_id").alias("click_id"),
        F.col("click.click_value").alias("click_value"),
    )


@register(
    "q_join_multiway",
    oracle=f"""
    WITH s AS (
      SELECT r_name, n_name,
             count(*)::BIGINT AS n_lines,
             sum({sql_units("l_extendedprice", 100)}
                 * (100 - {sql_units("l_discount", 100)})) AS sdp
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY r_name, n_name)
    SELECT r_name, n_name, n_lines, {sql_descale("sdp", 10000)} AS revenue FROM s
    """,
    category="join",
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join (TPC-H Q5 shape): revenue per region and
    nation for one order year. The scale-determining choices: the
    orders filter is pushed to the scan BEFORE the fact-fact join, the
    lineitem⋈orders and ⋈customer joins shuffle on their keys exactly
    once each, and the two bounded dimensions (nation 25 rows, region
    5) are explicit broadcasts so the fact stream never shuffles for
    them. The final agg groups ~125 keys — a trivial exchange.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    disc_price = to_units(F.col("l_extendedprice"), 100) * (
        100 - to_units(F.col("l_discount"), 100)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_lines"), dec_sum(disc_price).alias("sdp"))
        .select("r_name", "n_name", "n_lines", descale("sdp", 10000).alias("revenue"))
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             count(*)::BIGINT AS cnt_even
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
    b AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             count(*)::BIGINT AS cnt_odd
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
    SELECT coalesce(a.pr, 'URGENT-AS-NULL') AS pr, a.cnt_even, b.cnt_odd
    FROM a JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
    """,
    category="join",
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): the two
    halves of `orders` aggregated on a DELIBERATELY nullable key
    (urgent priority mapped to NULL) and joined so the NULL groups
    match each other — the semantics a plain equi join silently drops
    (NULL = NULL is NULL, and rows vanish). Real pipelines hit this
    whenever a dimension key is optional.

    Scale posture: <=> is still hash-joinable — Catalyst plans the
    same BroadcastHashJoin/SMJ with null-safe key comparison, NOT a
    nested loop (asserted in tests/test_plans.py); both sides here
    pre-aggregate to priority-cardinality rows before joining.
    """
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pr")
    a = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt_even"))
    )
    b = (
        o.where(F.col("o_orderkey") % 2 == 1)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt_odd"))
    )
    return a.join(b, a.pr.eqNullSafe(b.pr)).select(
        F.coalesce(a.pr, F.lit("URGENT-AS-NULL")).alias("pr"),
        "cnt_even",
        "cnt_odd",
    )


@register(
    "q_join_shuffle_hash",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_lines,
           sum(round(l_quantity)::BIGINT)::BIGINT AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    category="join",
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join under an explicit SHUFFLE_HASH hint — the
    third join strategy next to broadcast (small side) and sort-merge
    (default large-large). Shuffle-hash skips BOTH sort phases by
    hash-building the smaller shuffled side per partition: the right
    call when one side is much smaller than the other but too big to
    broadcast, and the build side fits executor memory per partition.
    The plan gate (tests/test_plans.py) asserts ShuffledHashJoin with
    no SortMergeJoin.

    Scale posture: same single shuffle per side as SMJ on the equi
    key; the trade is sort CPU vs build-side memory — with AQE,
    Spark can also make this choice at runtime, the hint pins it
    for predictable memory sizing.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    joined = l.join(
        o.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round("l_quantity").cast("long")).alias("qty"),
    )


@register(
    "q_join_interval_overlap",
    oracle="""
    WITH ev AS (
      SELECT event_id, ts AS s,
             ts + to_minutes(least(greatest(round(value)::BIGINT, 0),
                                   1000000000)) AS e
      FROM events),
    win AS (
      SELECT DISTINCT date_trunc('day', ts) AS ws,
             date_trunc('day', ts) + INTERVAL 2 HOUR AS we
      FROM events)
    SELECT event_id,
           (epoch_us(ws) // 1000000)::BIGINT AS day_s,
           (epoch_us(least(e, we)) // 1000000
            - epoch_us(greatest(s, ws)) // 1000000)::BIGINT AS overlap_s
    FROM ev JOIN win ON s < we AND ws < e
    """,
    category="join",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: event activity intervals [ts, ts +
    round(value) minutes) against daily maintenance windows
    [day 00:00, day 02:00), strict overlap (zero-length touches
    excluded), emitting the overlap duration in whole seconds.

    Scale posture: a naive theta join (s < we AND ws < e) is a
    broadcast-nested-loop — O(|A|·|B|) when BOTH interval sets are
    large. Instead each side explodes into the hour buckets its
    interval covers and the join becomes an EQUI join on the bucket
    (one shuffle, hash/SMJ, AQE-skew-splittable), with a distinct to
    collapse pairs that share several buckets and the exact overlap
    predicate re-checked after. Bucket fan-out is HARD-bounded at 49
    rows per interval: intervals longer than 48 h are split off into a
    long-tail side that joins windows with the exact theta predicate
    via broadcast — a pathological duration (the clamp admits up to
    10^9 minutes) can therefore never explode ~16M bucket rows; it
    costs one broadcast row instead. Both paths re-check the same
    exact overlap predicate, so the split is output-invariant.

    Exactness: overlap seconds are computed as floor-to-second epoch
    integers on both engines (unix_micros // 1e6), never float.
    Durations clamp at zero (greatest(round(value), 0), both sides):
    a negative duration would otherwise make Spark's ascending bucket
    sequence throw while the oracle still emits rows — the clamp pins
    one semantics for intervals, and zero-length ones are excluded by
    the strict overlap predicate anyway."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        F.col("ts").alias("s"),
        # Seconds instead of the INT minutes slot (whose cast wraps at
        # 2^31 minutes). make_interval's secs parameter is
        # DECIMAL(18,6), so durations are ALSO capped at 10^9 minutes
        # on BOTH sides (a 1900-year interval; past the decimal's
        # range the implicit cast would return NULL and silently drop
        # rows that the oracle kept).
        F.expr(
            "ts + make_interval(0, 0, 0, 0, 0, 0,"
            " least(greatest(cast(round(value) as bigint), 0),"
            " 1000000000) * 60)"
        ).alias("e"),
    )
    win = (
        e.select(F.date_trunc("day", "ts").alias("ws"))
        .distinct()
        .select("ws", (F.col("ws") + F.expr("INTERVAL 2 HOURS")).alias("we"))
    )
    hour = F.expr("INTERVAL 1 HOUR")
    cap = F.expr("INTERVAL 48 HOURS")
    short = ev.where(F.col("e") <= F.col("s") + cap)
    long_tail = ev.where(F.col("e") > F.col("s") + cap)
    evb = short.withColumn(
        "bucket",
        F.explode(F.sequence(F.date_trunc("hour", "s"), F.date_trunc("hour", "e"), hour)),
    )
    winb = win.withColumn(
        "bucket",
        F.explode(F.sequence(F.date_trunc("hour", "ws"), F.date_trunc("hour", "we"), hour)),
    )
    pairs_short = evb.join(winb, "bucket").select("event_id", "s", "e", "ws", "we").distinct()
    # Long-tail intervals (>48 h) are rare by construction; broadcast
    # them against the window set with the exact theta predicate —
    # bounded work regardless of duration magnitude.
    pairs_long = F.broadcast(long_tail).join(
        win, (F.col("s") < F.col("we")) & (F.col("ws") < F.col("e"))
    ).select("event_id", "s", "e", "ws", "we")
    return (
        pairs_short.unionByName(pairs_long)
        .where((F.col("s") < F.col("we")) & (F.col("ws") < F.col("e")))
        .select(
            "event_id",
            F.expr("unix_micros(ws) DIV 1000000").alias("day_s"),
            # Same floor-each-then-subtract integer shape as the
            # oracle's epoch_us(..) // 1e6 - epoch_us(..) // 1e6.
            (
                F.expr("unix_micros(least(e, we)) DIV 1000000")
                - F.expr("unix_micros(greatest(s, ws)) DIV 1000000")
            ).alias("overlap_s"),
        )
    )


@register(
    "q_join_bloom_pruned",
    oracle="""
    SELECT l.l_returnflag, count(*)::BIGINT AS n_lines,
           sum(round(l.l_quantity)::BIGINT)::BIGINT AS qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY l.l_returnflag
    """,
    category="join",
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-fact join shaped for Spark's RUNTIME BLOOM
    FILTER injection (the row-level complement to dynamic partition
    pruning): the selective orders side builds a bloom_filter_agg at
    run time and the lineitem scan gains a might_contain() filter, so
    most fact rows die AT THE SCAN instead of travelling through the
    join shuffle. tests/test_plans.py gates the injected filter with
    the thresholds scaled to fixture size; at 100 TB the default
    thresholds fire on exactly this shape (big probe side, selective
    creation side) and typically cut the probe shuffle by the dim
    filter's selectivity. Semantics are a plain join — the oracle
    states them directly; the bloom filter is physical-only (false
    positives re-checked by the join)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    ).select("o_orderkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
        )
    )


@register(
    "q_join_asof_tolerance",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         vp AS (
           SELECT v.event_id AS view_id, v.user_id AS user_id,
                  p.event_id AS purchase_id,
                  (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS wait_s,
                  row_number() OVER (PARTITION BY v.event_id
                                     ORDER BY p.ts ASC, p.event_id ASC) AS rn
           FROM v LEFT JOIN p
             ON p.user_id = v.user_id
            AND p.ts >= v.ts
            AND p.ts <= v.ts + INTERVAL 1 HOUR)
    SELECT view_id, user_id, purchase_id, wait_s::BIGINT AS wait_s
    FROM vp WHERE rn = 1
    """,
    category="join",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (the pandas/polars
    merge_asof(direction='forward', tolerance=1h) contract): every
    view matches the EARLIEST purchase of the same user at-or-after
    it, but only within 1 hour — later purchases leave the view
    unmatched (NULL), giving the time-to-convert signal attribution
    funnels need. Complements q_join_asof (backward, unbounded).

    Implemented as the scalable union idiom run in REVERSE time
    order: one window over (user_id, ts DESC) carries the
    next-seen purchase backward to each view (ties: a same-ts
    purchase is eligible, lowest event_id wins), then the tolerance
    is a post-filter that NULLs the carried match — never the naive
    p.ts BETWEEN v.ts AND v.ts+1h join the oracle states (quadratic
    under hot users). ONE user_id exchange (plan-gated, no Join
    operator); exact integer wait seconds."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("tag"),
        F.when(
            F.col("event_type") == "purchase",
            F.struct(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            ),
        ).alias("purchase"),
    )
    # Scan latest-first; at equal ts purchases sort before views
    # (tag desc puts views after purchases? tag: view=1, purchase=0 —
    # ascending tag at equal ts scans purchases first), and among
    # same-ts purchases the LOWEST event_id is seen last, so last()
    # keeps it.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("tag").asc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        "ts",
        "tag",
        F.last("purchase", ignorenulls=True).over(w).alias("m"),
    )
    # Microsecond-exact wait: unix_timestamp() would truncate EACH
    # side to seconds before subtracting (floor(a)-floor(b)), which
    # disagrees with the oracle's floor(a-b) when sub-second parts
    # straddle; the tolerance itself compares in microseconds so the
    # 1-hour boundary is exact on both engines.
    # ts arrives TIMESTAMP_NTZ from parquet and unix_micros rejects
    # NTZ (same guard as q_ts_downsample_m4); the NTZ->LTZ cast's
    # session-zone shift cancels in the difference.
    wait_us = F.expr(
        "unix_micros(cast(m.p_ts as timestamp))"
        " - unix_micros(cast(ts as timestamp))"
    )
    wait_s = F.expr(
        "(unix_micros(cast(m.p_ts as timestamp))"
        " - unix_micros(cast(ts as timestamp))) DIV 1000000"
    ).cast("long")
    in_tol = F.col("m").isNotNull() & (wait_us <= 3600 * 1000000)
    return merged.where(F.col("tag") == 1).select(
        "view_id",
        "user_id",
        F.when(in_tol, F.col("m.purchase_id")).alias("purchase_id"),
        F.when(in_tol, wait_s).alias("wait_s"),
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         vp AS (
           SELECT v.event_id AS view_id, v.user_id AS user_id,
                  p.event_id AS purchase_id,
                  abs(epoch_us(p.ts) - epoch_us(v.ts)) AS dist_us,
                  row_number() OVER (
                    PARTITION BY v.event_id
                    ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)),
                             CASE WHEN p.ts <= v.ts THEN 0 ELSE 1 END,
                             p.event_id) AS rn
           FROM v LEFT JOIN p
             ON p.user_id = v.user_id
            AND p.ts >= v.ts - INTERVAL 1 HOUR
            AND p.ts <= v.ts + INTERVAL 1 HOUR)
    SELECT view_id, user_id, purchase_id,
           (dist_us // 1000000)::BIGINT AS dist_s
    FROM vp WHERE rn = 1
    """,
    category="join",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join with tolerance (merge_asof
    direction='nearest'): every view matches the purchase of the same
    user closest in time — in EITHER direction — within 1 hour, ties
    broken backward (the pandas convention), then by lowest event_id.
    Completes the as-of family: q_join_asof (backward, unbounded),
    q_join_asof_tolerance (forward, bounded), and this (nearest,
    bounded).

    Implemented as BOTH directional scans off ONE user_id
    partitioning: the backward candidate (last purchase at-or-before)
    and the forward candidate (first purchase at-or-after) come from
    two windows that share the exchange (same partition keys,
    opposite sort — Catalyst re-sorts but never re-shuffles,
    plan-gated: 1 Exchange, no Join), and the nearer in-tolerance
    candidate wins with the backward tie-break. Microsecond-exact
    distances (the unix_timestamp floor trap documented at
    q_join_asof_tolerance applies here too)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("tag"),
        F.when(
            F.col("event_type") == "purchase",
            F.struct(
                F.col("event_id").alias("pid"), F.col("ts").alias("pts")
            ),
        ).alias("purchase"),
    )
    # Backward: scan time-asc, purchases before same-ts views, highest
    # event_id last (so last() keeps it) — the q_join_asof convention.
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tag").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: scan time-desc, purchases before same-ts views, LOWEST
    # event_id seen last — the q_join_asof_tolerance convention.
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("tag").asc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        "ts",
        "tag",
        F.last("purchase", ignorenulls=True).over(wb).alias("b"),
        F.last("purchase", ignorenulls=True).over(wf).alias("f"),
    ).where(F.col("tag") == 1)
    us = "unix_micros(cast({} as timestamp))"
    b_dist = F.expr(
        f"{us.format('ts')} - {us.format('b.pts')}"
    )
    f_dist = F.expr(
        f"{us.format('f.pts')} - {us.format('ts')}"
    )
    tol = 3600 * 1000000
    b_ok = F.col("b").isNotNull() & (b_dist <= tol)
    f_ok = F.col("f").isNotNull() & (f_dist <= tol)
    # Nearer wins; exact tie -> backward (pandas convention). The
    # same-ts purchase appears as BOTH candidates at distance 0, so
    # the backward branch takes it.
    pick_b = b_ok & (~f_ok | (b_dist <= f_dist))
    pick_f = f_ok & ~pick_b
    chosen = F.when(pick_b, F.col("b")).when(pick_f, F.col("f"))
    dist = F.when(pick_b, b_dist).when(pick_f, f_dist)
    # dist <= 3.6e9 µs is exactly representable as double; the cast's
    # truncation equals the oracle's // on the non-negative quotient.
    return merged.select(
        "view_id",
        "user_id",
        chosen.getField("pid").alias("purchase_id"),
        (dist / F.lit(1000000)).cast("long").alias("dist_s"),
    )


@register(
    "q_join_scd2_pointintime",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type <> 'purchase'),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type),
    dim AS (
      SELECT user_id, event_type AS state, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS vt
      FROM changes),
    facts AS (
      SELECT user_id, ts, round(value * 100)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase')
    SELECT d.state,
           count(*)::BIGINT AS n_purchases,
           sum(f.cents)::BIGINT AS cents
    FROM facts f
    JOIN dim d ON f.user_id = d.user_id
      AND f.ts >= d.vf AND (d.vt IS NULL OR f.ts < d.vt)
    GROUP BY d.state
    """,
    category="join",
)
def q_join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal AS-OF) read against the SCD2 dimension
    q_scd2_dimension builds: every purchase is enriched with the
    user's ENGAGEMENT state valid at the purchase timestamp — the
    last non-purchase activity type in effect (valid_from ≤ t <
    valid_to over the non-purchase change stream) — and revenue
    aggregates by that historical state ("what were they doing when
    they bought"). The read side of slowly-changing-dimension
    warehousing, and the query that silently goes wrong when people
    join the CURRENT dimension row onto historical facts. Purchases
    with no preceding dimension version drop, exactly like the
    oracle's inner interval join.

    Engine vs oracle formulations intentionally DIFFER (same
    discipline as q_join_asof): the oracle spells the textbook
    interval-containment join on [valid_from, valid_to); the engine
    never builds intervals at all — change rows and fact rows union
    into ONE stream, sorted (ts, change-before-fact, event_id) within
    the user partition, and `last(state) ignore nulls` carries the
    in-effect state onto each fact. Equal-timestamp semantics (a
    purchase that itself triggers the change sees the NEW state; of
    two same-microsecond changes the higher event_id wins) fall out
    identically in both.

    Scale posture: zero join operators — two user_id hash Exchanges
    total (one under the change-detection lag, one re-partitioning
    the change+fact union for the carry window; a union cannot
    inherit its children's partitioning), and the final aggregate is
    value-table sized. The interval join the oracle uses would
    shuffle both sides AND range-explode per dimension version; the
    union+window shape keeps the fact stream to plain hash
    exchanges."""
    e = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.where(F.col("event_type") != "purchase")
        .withColumn("prev", F.lag("event_type").over(w_ord))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("is_fact"),
            F.col("event_type").alias("state"),
            F.lit(None).cast("long").alias("cents"),
        )
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("is_fact"),
        F.lit(None).cast("string").alias("state"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_carry = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = changes.unionByName(facts).withColumn(
        "state_at", F.last("state", ignorenulls=True).over(w_carry)
    )
    return (
        carried.where((F.col("is_fact") == 1) & F.col("state_at").isNotNull())
        .groupBy(F.col("state_at").alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
