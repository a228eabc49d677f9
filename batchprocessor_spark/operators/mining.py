"""Pattern-mining / concentration / ranking-quality operators (round 5,
third session): market-basket association rules, drawdown analysis,
market-concentration indices, pointwise mutual information, NDCG
ranking quality, and inter-rater agreement. None exist in the
reference (its pipeline is T-agnostic,
`batchprocessor-core/src/main/java/.../v2/BatchProcessor.java:24`);
they are the classic large-scale mining kernels a curation/analytics
user runs right after the relational surface.

Determinism discipline: every metric lands in exact integer units
(counts, cents, ppm/bp via integer DIV on non-negative operands, sign
decomposed where deltas can be negative) so the driver's value-hash
compare cannot drift on float summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import to_units
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_ml_assoc_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT count(DISTINCT basket)::BIGINT AS n_baskets FROM items),
    item_cnt AS (
      SELECT item, count(*)::BIGINT AS cnt FROM items GROUP BY item),
    pair_cnt AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS n_ab
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item),
    rules AS (
      SELECT item_a AS antecedent, item_b AS consequent, n_ab FROM pair_cnt
      UNION ALL
      SELECT item_b, item_a, n_ab FROM pair_cnt)
    SELECT r.antecedent, r.consequent, r.n_ab,
           ca.cnt AS n_a, cb.cnt AS n_b, n.n_baskets,
           ((1000000 * r.n_ab) // n.n_baskets)::BIGINT AS support_ppm,
           ((1000000 * r.n_ab) // ca.cnt)::BIGINT AS confidence_ppm,
           ((1000000::HUGEINT * r.n_ab * n.n_baskets)
              // (ca.cnt::HUGEINT * cb.cnt))::BIGINT AS lift_ppm
    FROM rules r
    JOIN item_cnt ca ON r.antecedent = ca.item
    JOIN item_cnt cb ON r.consequent = cb.item
    CROSS JOIN n
    WHERE r.n_ab >= 50
    ORDER BY lift_ppm DESC, antecedent, consequent
    LIMIT 20
    """,
    category="ml",
)
def q_ml_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (the Apriori/FP-growth readout)
    over order baskets with part brands as items: for every brand pair
    seen together in >= 50 orders, both directed rules a=>b with
    support, confidence and lift in exact integer ppm; top 20 by lift.

    Scale posture: baskets are orders and the item vocabulary is
    brand-sized (25), so the pair expansion is the per-basket
    k-choose-2 with k <= items-per-order — bounded fanout on an
    equi-join key (basket), never a cross join. One distinct on
    (basket, item), one self equi-join, then every further join is
    against vocabulary-sized count tables (broadcast). The 1e6-scaled
    lift numerator runs in decimal(38) so 100 TB basket counts cannot
    overflow; DIV on non-negative operands is floor==truncate on both
    engines. Final order is TakeOrderedAndProject (never a global
    sort)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    rules = pair_cnt.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_ab",
    ).unionAll(
        pair_cnt.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_ab",
        )
    )
    item_cnt = items.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    n_baskets = items.select(
        F.count_distinct("basket").alias("n_baskets")
    )
    out = (
        rules.where(F.col("n_ab") >= 50)
        .join(
            F.broadcast(item_cnt.select(F.col("item"), F.col("cnt").alias("n_a"))),
            F.col("antecedent") == F.col("item"),
        )
        .drop("item")
        .join(
            F.broadcast(item_cnt.select(F.col("item"), F.col("cnt").alias("n_b"))),
            F.col("consequent") == F.col("item"),
        )
        .drop("item")
        .join(F.broadcast(n_baskets))
        .selectExpr(
            "antecedent",
            "consequent",
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            "(1000000 * n_ab) DIV n_baskets AS support_ppm",
            "(1000000 * n_ab) DIV n_a AS confidence_ppm",
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab * n_baskets)"
            " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_ppm",
        )
    )
    return out.orderBy(
        F.desc("lift_ppm"), "antecedent", "consequent"
    ).limit(20)


@register(
    "q_ts_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m-%d') AS day,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
      FROM orders GROUP BY priority, day),
    dd AS (
      SELECT priority, day, rev_cents,
             max(rev_cents) OVER (PARTITION BY priority ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS peak_cents
      FROM daily),
    ranked AS (
      SELECT priority, day, rev_cents, peak_cents,
             (peak_cents - rev_cents)::BIGINT AS dd_cents,
             row_number() OVER (PARTITION BY priority
                                ORDER BY (peak_cents - rev_cents) DESC,
                                         day) AS rn
      FROM dd)
    SELECT priority,
           dd_cents AS max_dd_cents,
           day AS trough_day,
           peak_cents,
           rev_cents AS trough_cents,
           ((10000 * dd_cents) // peak_cents)::BIGINT AS dd_bp
    FROM ranked WHERE rn = 1
    ORDER BY priority
    """,
    category="timeseries",
)
def q_ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series per order
    priority: the worst peak-to-trough fall from the running
    historical maximum — the stability readout every
    revenue/latency/throughput dashboard puts beside the trend line.
    Reports the drawdown in exact cents and in basis points of the
    peak, plus the (deterministically earliest) trough day.

    Scale posture: the fact scan collapses to the bounded
    (priority x day) grid in ONE partial+final aggregate; both windows
    (running max, argmax rank) share the same priority partitioning
    and run over the grid, never the fact table. Integer cents
    end-to-end — the running max and the subtraction are exact, so
    the argmax row cannot flip between engines."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("rev_cents"))
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.withColumn("peak_cents", F.max("rev_cents").over(w)).withColumn(
        "dd_cents", F.col("peak_cents") - F.col("rev_cents")
    )
    rank_w = Window.partitionBy("priority").orderBy(F.desc("dd_cents"), "day")
    return (
        dd.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .selectExpr(
            "priority",
            "dd_cents AS max_dd_cents",
            "day AS trough_day",
            "peak_cents",
            "rev_cents AS trough_cents",
            "(10000 * dd_cents) DIV peak_cents AS dd_bp",
        )
        .orderBy("priority")
    )


# Pinned integer DCG position weights: floor(1e6 / log2(rank+1)) for
# ranks 1..10 — the textbook NDCG discount in exact micro-units, so the
# metric is pure integer arithmetic on both engines (the irrational
# discount enters only through these 10 shared literal constants).
_NDCG_W = [1000000, 630929, 500000, 430676, 386852, 356207, 333333, 315464, 301029, 289064]


def _ndcg_oracle() -> str:
    w = ", ".join(str(v) for v in _NDCG_W)
    return f"""
    WITH rev AS (
      SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY o_custkey),
    graded AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey, c.c_acctbal,
             least(3, coalesce(r.cents, 0) // 150000000)::BIGINT AS grade
      FROM customer c LEFT JOIN rev r ON c.c_custkey = r.o_custkey),
    sys AS (
      SELECT nationkey, grade,
             row_number() OVER (PARTITION BY nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM graded),
    ideal AS (
      SELECT nationkey, grade,
             row_number() OVER (PARTITION BY nationkey
                                ORDER BY grade DESC, c_custkey) AS rn
      FROM graded),
    dcg AS (
      SELECT nationkey,
             sum(grade * list_extract([{w}], rn::INT))::BIGINT AS dcg_micro
      FROM sys WHERE rn <= 10 GROUP BY nationkey),
    idcg AS (
      SELECT nationkey,
             sum(grade * list_extract([{w}], rn::INT))::BIGINT AS idcg_micro
      FROM ideal WHERE rn <= 10 GROUP BY nationkey)
    SELECT n.n_name AS nation, d.dcg_micro, i.idcg_micro,
           ((1000000 * d.dcg_micro) // i.idcg_micro)::BIGINT AS ndcg_ppm
    FROM dcg d JOIN idcg i USING (nationkey)
    JOIN nation n ON d.nationkey = n.n_nationkey
    WHERE i.idcg_micro > 0
    ORDER BY nation
    """


@register("q_ml_ndcg", oracle=_ndcg_oracle(), category="ml")
def q_ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 ranking quality per nation: the "search engine" ranks
    each nation's customers by account balance; graded relevance
    (0..3) comes from actual revenue (150k-dollar steps). DCG uses the
    textbook 1/log2(rank+1) discount pinned as integer micro-unit
    constants (see _NDCG_W), so DCG, ideal DCG, and NDCG (ppm) are
    exact integers — the evaluation head for any learned ranker over
    this engine's retrieval operators.

    Scale posture: one fact aggregate to customer grain, broadcast
    dim join, then TWO rank-limited windows per nation
    (WindowGroupLimit keeps only 10 rows per partition before the
    aggregate); everything after the first aggregate is
    customer-dim-sized. No float enters the plan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", to_units(F.col("o_totalprice"), 100).alias("cents")
    )
    rev = orders.groupBy("o_custkey").agg(F.sum("cents").alias("cents"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    graded = (
        cust.join(rev, cust.c_custkey == rev.o_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "c_custkey",
            "c_acctbal",
            F.least(
                F.lit(3), F.expr("coalesce(cents, 0) DIV 150000000")
            ).alias("grade"),
        )
    )
    warr = F.array(*[F.lit(v) for v in _NDCG_W])
    sys_w = Window.partitionBy("nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    ideal_w = Window.partitionBy("nationkey").orderBy(F.desc("grade"), "c_custkey")
    dcg = (
        graded.withColumn("rn", F.row_number().over(sys_w))
        .where(F.col("rn") <= 10)
        .groupBy("nationkey")
        .agg(
            F.sum(F.col("grade") * F.element_at(warr, F.col("rn"))).alias(
                "dcg_micro"
            )
        )
    )
    idcg = (
        graded.withColumn("rn", F.row_number().over(ideal_w))
        .where(F.col("rn") <= 10)
        .groupBy("nationkey")
        .agg(
            F.sum(F.col("grade") * F.element_at(warr, F.col("rn"))).alias(
                "idcg_micro"
            )
        )
    )
    return (
        dcg.join(idcg, "nationkey")
        .where(F.col("idcg_micro") > 0)
        .join(F.broadcast(nation), F.col("nationkey") == F.col("n_nationkey"))
        .selectExpr(
            "n_name AS nation",
            "dcg_micro",
            "idcg_micro",
            "(1000000 * dcg_micro) DIV idcg_micro AS ndcg_ppm",
        )
        .orderBy("nation")
    )


@register(
    "q_ml_cohens_kappa",
    oracle="""
    WITH rated AS (
      SELECT (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS ra,
             (CASE WHEN len(string_split(text, ' ')) >= 55
                   THEN 1 ELSE 0 END) AS rb
      FROM documents),
    conf AS (
      SELECT count(*)::HUGEINT AS n,
             sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)::HUGEINT AS a,
             sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)::HUGEINT AS b,
             sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)::HUGEINT AS c,
             sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)::HUGEINT AS d
      FROM rated)
    SELECT n::BIGINT AS n, a::BIGINT AS a, b::BIGINT AS b,
           c::BIGINT AS c, d::BIGINT AS d,
           ((10000 * (a + d)) // n)::BIGINT AS po_bp,
           ((10000 * ((a + b) * (a + c) + (c + d) * (b + d))) // (n * n))::BIGINT
             AS pe_bp,
           (CASE WHEN n * (a + d) >= (a + b) * (a + c) + (c + d) * (b + d)
                 THEN 1 ELSE -1 END
            * ((10000 * abs(n * (a + d)
                            - ((a + b) * (a + c) + (c + d) * (b + d))))
               // (n * n - ((a + b) * (a + c) + (c + d) * (b + d)))))::BIGINT
             AS kappa_bp
    FROM conf
    """,
    category="ml",
)
def q_ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two deterministic
    document quality raters (char-length >= 300 vs word-count >= 55):
    observed agreement, chance agreement, and kappa, all as exact
    integer basis points — the agreement audit run before trusting a
    cheap heuristic labeler as training signal.

    kappa = (N(a+d) - E) / (N^2 - E) with E = (a+b)(a+c) + (c+d)(b+d)
    stays a ratio of exact integers; the sign is decomposed
    (sign * DIV of absolutes) because DuckDB // floors while Spark DIV
    truncates on negatives. Scale posture: ONE conditional-aggregate
    scan to a 1-row confusion table; the N^2 products run in
    decimal(38)/HUGEINT."""
    rated = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("ra"),
        F.when(F.size(F.split(F.col("text"), " ")) >= 55, 1)
        .otherwise(0)
        .alias("rb"),
    )
    conf = rated.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("a"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("b"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("c"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    e = "((a + b) * (a + c) + (c + d) * (b + d))"
    return conf.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(a AS BIGINT) AS a",
        "CAST(b AS BIGINT) AS b",
        "CAST(c AS BIGINT) AS c",
        "CAST(d AS BIGINT) AS d",
        "CAST((10000 * (a + d)) DIV n AS BIGINT) AS po_bp",
        f"CAST((10000 * {e}) DIV (n * n) AS BIGINT) AS pe_bp",
        f"CAST((CASE WHEN n * (a + d) >= {e} THEN 1 ELSE -1 END)"
        f" * ((10000 * abs(n * (a + d) - {e}))"
        f" DIV (n * n - {e})) AS BIGINT) AS kappa_bp",
    )


@register(
    "q_agg_hhi",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nationkey, o.o_custkey),
    per_nation AS (
      SELECT nationkey,
             count(*)::BIGINT AS n_customers,
             sum(x)::HUGEINT AS total,
             sum(x::HUGEINT * x) AS sumsq,
             max(x)::BIGINT AS top_cents
      FROM per_cust GROUP BY nationkey)
    SELECT n.n_name AS nation,
           p.n_customers,
           p.total::BIGINT AS total_cents,
           ((100000000::HUGEINT * p.sumsq) // (p.total * p.total))::BIGINT
             AS hhi_e8,
           ((10000::HUGEINT * p.top_cents) // p.total)::BIGINT
             AS top_share_bp,
           ((100000000000::HUGEINT)
              // ((100000000::HUGEINT * p.sumsq) // (p.total * p.total))
             )::BIGINT AS eff_n_milli
    FROM per_nation p JOIN nation n ON p.nationkey = n.n_nationkey
    ORDER BY nation
    """,
    category="aggregate",
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of customer revenue within
    each nation: HHI = sum(share^2) in exact 1e-8 units (10000 == one
    fully-monopolized market in bp^2), the largest customer's share in
    bp, and the implied effective number of equal customers
    (1/HHI, milli-units) — the market-concentration audit that decides
    whether a join key or a customer base is dangerously skewed.

    Scale posture: one shuffle to the (nation, customer) grain, then a
    nation-sized aggregate; the share-squared sum runs in decimal(38)
    (HUGEINT on the oracle side) so 100 TB cent totals squared cannot
    overflow, and every division is integer DIV on non-negative
    operands — no float enters the plan. The nation dim is broadcast."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", to_units(F.col("o_totalprice"), 100).alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.sum("cents").alias("x"))
    )
    per_nation = per_cust.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("total"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")
        ).alias("sumsq"),
        F.max("x").alias("top_cents"),
    )
    return (
        per_nation.join(
            F.broadcast(nation), per_nation.nationkey == nation.n_nationkey
        )
        .selectExpr(
            "n_name AS nation",
            "n_customers",
            "CAST(total AS BIGINT) AS total_cents",
            "CAST((CAST(100000000 AS DECIMAL(38,0)) * sumsq)"
            " DIV (total * total) AS BIGINT) AS hhi_e8",
            "CAST((CAST(10000 AS DECIMAL(38,0)) * top_cents)"
            " DIV total AS BIGINT) AS top_share_bp",
            "CAST(CAST(100000000000 AS DECIMAL(38,0)) DIV"
            " ((CAST(100000000 AS DECIMAL(38,0)) * sumsq)"
            " DIV (total * total)) AS BIGINT) AS eff_n_milli",
        )
        .orderBy("nation")
    )


def _dtw_oracle(max_len: int = 32) -> str:
    """Unrolled anti-diagonal DTW dynamic program. dp(i,j) = |a_i-b_j|
    + min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1)) has a same-row dependency
    in row order, but every cell on anti-diagonal d = i+j depends only
    on diagonals d-1 and d-2 — so the whole DP unrolls into one chained
    CTE per diagonal (the same unrolled-iteration idiom as the kmeans /
    BFS oracles), 2*max_len diagonals for series up to max_len points."""
    big = "999999999999999999"
    parts = [
        """
    WITH q AS (
      SELECT o_orderpriority AS p,
             (year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3) AS qi,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS v
      FROM orders GROUP BY p, qi),
    idx AS (
      SELECT p, v, row_number() OVER (PARTITION BY p ORDER BY qi) AS i
      FROM q),
    len AS MATERIALIZED (SELECT p, count(*)::BIGINT AS n FROM idx GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb FROM len a JOIN len b ON a.p < b.p),
    cost AS MATERIALIZED (
      SELECT pr.pa, pr.pb, a.i AS i, b.i AS j, abs(a.v - b.v)::BIGINT AS c
      FROM pairs pr
      JOIN idx a ON a.p = pr.pa
      JOIN idx b ON b.p = pr.pb),
    d2 AS MATERIALIZED (
      SELECT pa, pb, i, j, c AS dp FROM cost WHERE i = 1 AND j = 1)"""
    ]
    for d in range(3, 2 * max_len + 1):
        # diagonal d-2 has no cells when d == 3 (i+j == 1 is empty), so
        # the diagonal-predecessor join only exists from d == 4 on.
        ul_join = (
            f"""
      LEFT JOIN d{d - 2} ul
        ON ul.pa = c.pa AND ul.pb = c.pb AND ul.i = c.i - 1 AND ul.j = c.j - 1"""
            if d > 3
            else ""
        )
        ul_val = f"coalesce(ul.dp, {big})" if d > 3 else big
        parts.append(f""",
    d{d} AS MATERIALIZED (
      SELECT c.pa, c.pb, c.i, c.j,
             c.c + least(coalesce(u.dp, {big}),
                         coalesce(l.dp, {big}),
                         {ul_val}) AS dp
      FROM cost c
      LEFT JOIN d{d - 1} u
        ON u.pa = c.pa AND u.pb = c.pb AND u.i = c.i - 1 AND u.j = c.j
      LEFT JOIN d{d - 1} l
        ON l.pa = c.pa AND l.pb = c.pb AND l.i = c.i AND l.j = c.j - 1{ul_join}
      WHERE c.i + c.j = {d})""")
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM d{d}" for d in range(2, 2 * max_len + 1)
    )
    parts.append(f""",
    all_dp AS (
      {union})
    SELECT x.pa AS prio_a, x.pb AS prio_b,
           la.n AS n_a, lb.n AS n_b,
           x.dp::BIGINT AS dtw_cents,
           ((1000 * x.dp) // (la.n + lb.n))::BIGINT AS dtw_per_step_milli
    FROM all_dp x
    JOIN len la ON la.p = x.pa
    JOIN len lb ON lb.p = x.pb
    WHERE x.i = la.n AND x.j = lb.n
    ORDER BY prio_a, prio_b""")
    return "".join(parts)


@register("q_ts_dtw", oracle=_dtw_oracle(), category="timeseries")
def q_ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the quarterly-revenue
    series of every order-priority pair — the elastic similarity
    measure (Sakoe-Chiba DTW, unconstrained band) that clusters
    time-series by SHAPE when phases shift; Spark has no native DTW,
    so this is the custom-operator lane: series fold to bounded
    arrays, the O(n*m) DP runs in one Arrow-batched pandas UDF per
    pair. Pure integer |a-b| costs keep the distance hash-exact.

    The oracle unrolls the DP over anti-diagonals (dp cells on
    diagonal i+j depend only on the two previous diagonals), turning
    the sequential recurrence into ~60 chained relational CTEs — the
    same unrolled-iteration idiom as the kmeans/BFS/logreg oracles.

    Scale posture: the fact scan collapses to the (priority, quarter)
    grid in one aggregate; each series is a quarter-count-bounded
    array (the pairs table is k^2 for k series, each pair's DP state
    one bounded numpy matrix executor-side — for thousands of series
    this shape shards pairs across the cluster, never the driver)."""
    from pyspark.sql.functions import pandas_udf

    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.expr("year(o_orderdate) * 4 + (month(o_orderdate) - 1) DIV 3").alias(
            "qi"
        ),
    ).agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("v"))
    series = q.groupBy("p").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("qi", "v"))), lambda s: s["v"]
        ).alias("s")
    )
    a = series.select(
        F.col("p").alias("prio_a"), F.col("s").alias("sa")
    )
    b = series.select(F.col("p").alias("prio_b"), F.col("s").alias("sb"))
    pairs = a.join(F.broadcast(b), F.col("prio_a") < F.col("prio_b"))

    @pandas_udf("long")
    def dtw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for xs, ys in zip(sa, sb):
            x = np.asarray(xs, dtype=np.int64)
            y = np.asarray(ys, dtype=np.int64)
            n, m = len(x), len(y)
            big = np.int64(10**18)
            dp = np.full((n + 1, m + 1), big, dtype=np.int64)
            dp[0, 0] = 0
            cost = np.abs(x[:, None] - y[None, :])
            for i in range(1, n + 1):
                prev = dp[i - 1]
                cur = dp[i]
                ci = cost[i - 1]
                for j in range(1, m + 1):
                    cur[j] = ci[j - 1] + min(
                        prev[j], cur[j - 1], prev[j - 1]
                    )
            out.append(int(dp[n, m]))
        return pd.Series(out, dtype="int64")

    return (
        pairs.select(
            "prio_a",
            "prio_b",
            F.size("sa").cast("long").alias("n_a"),
            F.size("sb").cast("long").alias("n_b"),
            dtw(F.col("sa"), F.col("sb")).alias("dtw_cents"),
        )
        .selectExpr(
            "prio_a",
            "prio_b",
            "n_a",
            "n_b",
            "dtw_cents",
            "(1000 * dtw_cents) DIV (n_a + n_b) AS dtw_per_step_milli",
        )
        .orderBy("prio_a", "prio_b")
    )
