"""TPC-H completion through the pure-SQL front end.

Earlier rounds landed eleven TPC-H shapes (Q1, Q3, Q4, Q5, Q6, Q8,
Q10, Q14, Q15, Q18, Q21) as `q_sql_*` queries; this module adds the
remaining eleven (Q2, Q7, Q9, Q11, Q12, Q13, Q16, Q17, Q19, Q20,
Q22) so the full 22-query suite runs through `spark.sql` over the
registered catalog views, each with a DuckDB oracle of the same
statement in DuckDB's dialect.

The fixture schema (TESTDATA.md) is TPC-H-ish but trimmed: no
`partsupp` table, no `l_shipmode`/`l_commitdate`/`l_receiptdate`, no
`c_phone`, no comments. Queries whose reference text touches those
columns are ADAPTED — the docstring of each states exactly what was
substituted and why the plan shape (the thing that matters at 100 TB)
is preserved. All money flows through the exact integer lanes
(cents = round(x*100), revenue in 1e-4-dollar units) so builder and
oracle agree bit-for-bit regardless of summation order.

Reference parity: the reference engine (xzchaoo/batchprocessor) has
no SQL surface at all — this whole lane is extension surface beyond
`SURVEY.md §2.2`, kept to the same oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


# Shared dialect fragments: exact integer money lanes.
#   cents(x)     — round(x*100) as BIGINT
#   rev_u        — extendedprice cents × (100 − discount cents): 1e-4 $
_SPARK_CENTS = "CAST(round({c} * 100) AS BIGINT)"
_DUCK_CENTS = "round({c} * 100)::BIGINT"


def _rev_u(cents: str) -> str:
    return (
        f"{cents.format(c='l.l_extendedprice')} * "
        f"(100 - {cents.format(c='l.l_discount')})"
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-balance supplier (adapted: no partsupp)
# ---------------------------------------------------------------------------

_Q2_BODY = """
    SELECT DISTINCT {bal} AS s_acctbal_c, s.s_name, n.n_name,
                    p.p_partkey, p.p_name
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND {bal} = (
        SELECT min({bal2})
        FROM supplier s2
        JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal_c DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""


@register(
    "q_sql_min_balance_supplier",
    oracle=_Q2_BODY.format(
        bal=_DUCK_CENTS.format(c="s.s_acctbal"),
        bal2=_DUCK_CENTS.format(c="s2.s_acctbal"),
    ),
    category="sql",
)
def q_sql_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier) through the pure-SQL
    front end, adapted to the fixture schema: there is no `partsupp`
    table, so "supplier who offers the part" becomes "supplier who
    shipped the part" (via lineitem) and the minimized measure is the
    supplier account balance (cents lane) instead of `ps_supplycost`.
    The structural content is intact: a multi-join dimension lookup
    filtered by a CORRELATED scalar MIN subquery that itself runs the
    same multi-join, then a tie-broken ORDER BY ... LIMIT.

    Scale posture: Spark decorrelates the MIN subquery into an
    aggregate + join (no per-row re-execution); supplier/nation/
    region broadcast; DISTINCT collapses the many-lineitems-per-
    (part,supplier) fan-out before the final TakeOrderedAndProject.
    Reference: xzchaoo/batchprocessor has no query language — SQL
    front-end lane is extension surface (SURVEY §3.4)."""
    return _sql(
        spark,
        sf_dir,
        _Q2_BODY.format(
            bal=_SPARK_CENTS.format(c="s.s_acctbal"),
            bal2=_SPARK_CENTS.format(c="s2.s_acctbal"),
        ),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping (faithful)
# ---------------------------------------------------------------------------

_Q7_BODY = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_u) AS BIGINT) AS revenue_u
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             {rev} AS volume_u
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q_sql_volume_shipping",
    oracle=_Q7_BODY.format(rev=_rev_u(_DUCK_CENTS)),
    category="sql",
)
def q_sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) through the pure-SQL front end —
    faithful to the reference text on this schema: the two-role
    nation join (n1 = supplier nation, n2 = customer nation), the
    symmetric nation-pair disjunction, the two-year ship-date window,
    and the (supp_nation, cust_nation, year) rollup of revenue in the
    exact 1e-4-dollar lane.

    Scale posture: both nation copies and supplier/customer broadcast
    (dimension-sized); lineitem ⋈ orders is the only big join; the
    ship-date range reaches the lineitem scan as PushedFilters; the
    nation-pair disjunction is a residual filter on broadcast-joined
    rows, never a fan-out."""
    return _sql(spark, sf_dir, _Q7_BODY.format(rev=_rev_u(_SPARK_CENTS)))


# ---------------------------------------------------------------------------
# Q9 — product type profit (adapted: cost proxy, no partsupp)
# ---------------------------------------------------------------------------

_Q9_BODY = """
    SELECT nation, o_year, CAST(sum(amount_u) AS BIGINT) AS profit_u
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             {rev}
             - CAST(round(l.l_quantity) AS BIGINT)
               * {retail} * 60 AS amount_u
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@register(
    "q_sql_product_type_profit",
    oracle=_Q9_BODY.format(
        rev=_rev_u(_DUCK_CENTS), retail=_DUCK_CENTS.format(c="p.p_retailprice")
    ).replace("CAST(round(l.l_quantity) AS BIGINT)", "round(l.l_quantity)::BIGINT"),
    category="sql",
)
def q_sql_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit) through the pure-SQL
    front end, adapted: the fixture has no `partsupp`, so unit cost
    `ps_supplycost` is proxied by 60% of `p_retailprice` — profit =
    revenue − qty × 0.6·retail, all in the exact 1e-4-dollar integer
    lane (qty is integral in the fixture, pinned by the oracle's
    round()). The `p_name LIKE '%green%'` reference filter becomes
    `'%gear%'` on the fixture's part vocabulary. Shape intact: the
    widest fact join tree in the suite (lineitem ⋈ part ⋈ supplier ⋈
    orders ⋈ nation) rolled up by (nation, order-year).

    Scale posture: part/supplier/nation broadcast; lineitem ⋈ orders
    is the one shuffle join; the LIKE filter prunes part BEFORE its
    broadcast (filter-below-join); year() is a scan-side projection.
    """
    return _sql(
        spark,
        sf_dir,
        _Q9_BODY.format(
            rev=_rev_u(_SPARK_CENTS),
            retail=_SPARK_CENTS.format(c="p.p_retailprice"),
        ),
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (adapted: shipped value, no partsupp)
# ---------------------------------------------------------------------------

_Q11_BODY = """
    WITH val AS (
      SELECT l.l_partkey, CAST(sum({rev}) AS BIGINT) AS value_u
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT l_partkey, value_u
    FROM val
    WHERE value_u * 1000 > (SELECT CAST(sum(value_u) AS BIGINT) FROM val)
    ORDER BY value_u DESC, l_partkey
"""


@register(
    "q_sql_important_parts",
    oracle=_Q11_BODY.format(rev=_rev_u(_DUCK_CENTS)),
    category="sql",
)
def q_sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification) through the
    pure-SQL front end, adapted: no `partsupp`, so "stock value held
    by a nation's suppliers" becomes "revenue shipped by a nation's
    suppliers per part", and the `> fraction × total` HAVING becomes
    the integer cross-multiplication `value_u * 1000 > total_u`
    (exactly value > 0.1% of total, no float division anywhere).
    Shape intact: group-by over a filtered join, thresholded by a
    SCALAR SUBQUERY over the same grouped result.

    Scale posture: Spark evaluates the scalar-subquery branch and the
    main branch as two independent linear passes over the same
    aggregate (no exchange reuse across a subquery boundary — both
    passes are partkey-sized shuffles, so the cost is 2× linear, not
    quadratic); supplier/nation broadcast into both."""
    return _sql(spark, sf_dir, _Q11_BODY.format(rev=_rev_u(_SPARK_CENTS)))


# ---------------------------------------------------------------------------
# Q12 — shipping delay buckets (adapted: no l_shipmode/commit/receipt)
# ---------------------------------------------------------------------------

_Q12_BODY = """
    SELECT CASE WHEN {micros_ship} - {micros_order}
                     <= 2592000000000 THEN 'FAST'
                ELSE 'SLOW' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket
    ORDER BY ship_bucket
"""


@register(
    "q_sql_shipping_delay_buckets",
    oracle=_Q12_BODY.format(
        micros_ship="epoch_us(l.l_shipdate)", micros_order="epoch_us(o.o_orderdate)"
    ),
    category="sql",
)
def q_sql_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority) through
    the pure-SQL front end, adapted: the fixture has no
    `l_shipmode`/`l_commitdate`/`l_receiptdate`, so the mode
    partition becomes a ship-latency bucket (≤30 days from order to
    ship = FAST, else SLOW) computed on exact integer MICROSECONDS
    (unix_micros/epoch_us — never unix_timestamp(a)−unix_timestamp(b),
    whose per-operand floor diverges from interval arithmetic; never
    engine datediff, whose day semantics differ across dialects).
    Shape intact: the two-way CASE-sum pivot of high/low priority
    line counts per bucket over a one-year window.

    Scale posture: one fact-fact join (orders ⋈ lineitem) with the
    date range pushed to the lineitem scan; two-row output from a
    partial+final hash aggregate."""
    return _sql(
        spark,
        sf_dir,
        _Q12_BODY.format(
            micros_ship="unix_micros(CAST(l.l_shipdate AS TIMESTAMP))",
            micros_order="unix_micros(CAST(o.o_orderdate AS TIMESTAMP))",
        ),
    )


# ---------------------------------------------------------------------------
# Q13 — customer distribution (faithful modulo the comment filter)
# ---------------------------------------------------------------------------

_Q13_BODY = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register("q_sql_customer_distribution", oracle=_Q13_BODY, category="sql")
def q_sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution) through the pure-SQL front
    end — faithful except the reference's `o_comment NOT LIKE
    '%special%requests%'` join filter (no comment column in the
    fixture) becomes an order-priority exclusion, preserving the
    defining feature: a filter ON THE JOIN CONDITION of a LEFT OUTER
    join (filtering in WHERE would drop zero-order customers, the
    rows Q13 exists to count). Double aggregation: orders-per-
    customer, then customers-per-order-count.

    Scale posture: one shuffle each for the join and the first
    group-by (both on c_custkey — AQE coalesces them into the same
    exchange when beneficial); the second aggregate runs on the
    customer-count-sized intermediate. The identical statement runs
    in both engines — no dialect split."""
    return _sql(spark, sf_dir, _Q13_BODY)


# ---------------------------------------------------------------------------
# Q16 — supplier-part relationship counts (adapted: via lineitem)
# ---------------------------------------------------------------------------

_Q16_BODY = """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("q_sql_supplier_part_counts", oracle=_Q16_BODY, category="sql")
def q_sql_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship) through the
    pure-SQL front end, adapted: no `partsupp`, so "suppliers who can
    supply the part" becomes "suppliers who shipped the part"; the
    reference's `%Customer%Complaints%` supplier exclusion (no
    comment column) becomes a negative-balance exclusion, preserving
    the NOT IN subquery. Shape intact: COUNT(DISTINCT) per
    (brand, type, size) bucket with an anti-join exclusion and an
    IN-list size filter.

    Scale posture: the NOT IN subquery is supplier-sized and plans as
    a broadcast null-aware anti join (s_suppkey is non-null, so no
    null-semantics cliff); part broadcast after its pushed filters;
    the distinct-count expands to a two-phase aggregate (distinct on
    (grp, suppkey) partial, then count) — no row explosion. The
    identical statement runs in both engines."""
    return _sql(spark, sf_dir, _Q16_BODY)


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (adapted: brand family + size)
# ---------------------------------------------------------------------------

_Q17_BODY = """
    WITH perpart AS (
      SELECT l_partkey,
             CAST(sum({qty}) AS BIGINT) AS qty_sum,
             count(*) AS qty_cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(sum({ext}) AS BIGINT) {div} 7 AS BIGINT)
             AS avg_yearly_c
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN perpart a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand LIKE 'Brand#1%' AND p.p_size <= 25
      AND {qty_l} * 5 * a.qty_cnt < a.qty_sum
"""


@register(
    "q_sql_small_qty_revenue",
    oracle=_Q17_BODY.format(
        qty="round(l_quantity)::BIGINT",
        qty_l="round(l.l_quantity)::BIGINT",
        ext=_DUCK_CENTS.format(c="l.l_extendedprice"),
        div="//",
    ),
    category="sql",
)
def q_sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) through the pure-SQL
    front end, adapted: the reference's Brand#23 + container filter
    becomes a brand-family LIKE + size filter (no p_container in the
    fixture), and the correlated `l_quantity < 0.2 * avg(l_quantity)`
    subquery is written in its decorrelated form (per-part sum/count
    CTE joined back — exactly what Spark's DecorrelateInnerQuery
    rewrite produces from the reference text) with the float avg
    replaced by the integer cross-multiplication
    `5·qty·cnt < sum` (same predicate, zero float division). The
    `sum(price)/7.0` output stays in cents with floor division —
    operands non-negative, so DuckDB `//` and Spark integer `DIV`
    agree.

    Scale posture: the per-part aggregate shuffles on l_partkey, the
    same key as the fact join — one exchange is reused for both;
    part's filters prune before its broadcast; output is one row."""
    return _sql(
        spark,
        sf_dir,
        _Q17_BODY.format(
            qty="CAST(round(l_quantity) AS BIGINT)",
            qty_l="CAST(round(l.l_quantity) AS BIGINT)",
            ext=_SPARK_CENTS.format(c="l.l_extendedprice"),
            div="DIV",
        ),
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue over a disjunction (adapted: size for container)
# ---------------------------------------------------------------------------

_Q19_BODY = """
    SELECT CAST(sum({rev}) AS BIGINT) AS revenue_u
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register(
    "q_sql_discounted_revenue",
    oracle=_Q19_BODY.format(rev=_rev_u(_DUCK_CENTS)),
    category="sql",
)
def q_sql_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue) through the pure-SQL front end,
    adapted only in vocabulary: the container IN-lists become size
    bands (no p_container in the fixture). The defining feature is
    intact — a three-branch DISJUNCTION where each branch constrains
    BOTH join sides (part attributes AND lineitem quantity), which
    exercises the planner's ability to keep the join an equi-join on
    partkey and evaluate the OR as a residual post-join filter
    instead of falling back to a nested-loop.

    Scale posture: part broadcasts; the common `p_size >= 1 AND
    p_size <= 15` / quantity hull of the disjunction is derivable by
    constraint propagation, but correctness never depends on it; one
    row out of a partial+final aggregate in the 1e-4-dollar lane."""
    return _sql(spark, sf_dir, _Q19_BODY.format(rev=_rev_u(_SPARK_CENTS)))


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: shipped-quantity threshold)
# ---------------------------------------------------------------------------

_Q20_BODY = """
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'small%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING sum({qty}) > 100)
    ORDER BY s.s_name
"""


@register(
    "q_sql_promotion_suppliers",
    oracle=_Q20_BODY.format(qty="round(l.l_quantity)::BIGINT"),
    category="sql",
)
def q_sql_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) through the
    pure-SQL front end, adapted: no `partsupp.ps_availqty`, so "has
    more than half the available stock" becomes "shipped more than
    100 units of small-prefix parts in 1996" — preserving the
    defining NESTED subquery chain (supplier IN (aggregated lineitem
    IN (filtered part))) with a HAVING threshold, the deepest
    subquery nesting in the suite.

    Scale posture: the part-name subquery broadcasts as a semi-join
    into the lineitem scan (with its date filter pushed); the
    grouped HAVING result is supplier-sized and broadcasts into the
    outer semi-join; nation is an IN-list residual. No correlated
    re-execution anywhere."""
    return _sql(
        spark,
        sf_dir,
        _Q20_BODY.format(qty="CAST(round(l.l_quantity) AS BIGINT)"),
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: nation code, dormant customers)
# ---------------------------------------------------------------------------

_Q22_BODY = """
    WITH sel AS (
      SELECT c.c_custkey, c.c_nationkey AS cntrycode,
             {bal} AS bal_c
      FROM customer c
      WHERE c.c_nationkey IN (0, 1, 2, 3, 4, 5, 6)),
    avgbal AS (
      SELECT CAST(sum(bal_c) AS BIGINT) AS bal_sum, count(*) AS bal_cnt
      FROM sel WHERE bal_c > 0)
    SELECT sel.cntrycode, count(*) AS numcust,
           CAST(sum(sel.bal_c) AS BIGINT) AS totacctbal_c
    FROM sel CROSS JOIN avgbal
    WHERE sel.bal_c * avgbal.bal_cnt > avgbal.bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = sel.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY sel.cntrycode
    ORDER BY sel.cntrycode
"""


@register(
    "q_sql_global_sales_opportunity",
    oracle=_Q22_BODY.format(bal=_DUCK_CENTS.format(c="c.c_acctbal")),
    category="sql",
)
def q_sql_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity) through the
    pure-SQL front end, adapted: the phone-prefix country code (no
    c_phone in the fixture) becomes the nation key, and "customers
    who have no orders" (every fixture customer has orders) becomes
    "no orders since 2000-01-01" — dormant accounts. Shape intact:
    an above-average-balance filter via a SCALAR aggregate subquery
    plus a NOT EXISTS anti-join, rolled up per country code. The
    float `> avg(...)` is the integer cross-multiplication
    `bal·cnt > sum` over cents (exact; positivity of the average
    makes the predicate imply bal_c > 0).

    Scale posture: avgbal is one row broadcast over the customer
    scan; NOT EXISTS plans as a broadcast/shuffle ANTI join on
    o_custkey with the date filter pushed INTO the orders scan (the
    anti side shrinks before the join, not after); output is
    country-code-sized."""
    return _sql(spark, sf_dir, _Q22_BODY.format(bal=_SPARK_CENTS.format(c="c.c_acctbal")))
