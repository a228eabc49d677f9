"""Subquery operators (SURVEY.md §4.2 — Catalyst's subquery handling):
scalar subqueries, correlated scalar subqueries, and IN-subqueries.

Expressed through ``spark.sql`` so Catalyst's decorrelation rewrites
(RewriteCorrelatedScalarSubquery → left outer join + aggregate) do the
planning — the same query at 100 TB becomes a broadcast or SMJ join,
never a per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


_SCALAR_SQL = """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


@register("q_subq_scalar", oracle=_SCALAR_SQL, category="subquery")
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global
    average balance (planned as one tiny aggregate broadcast into the
    filter)."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


_CORRELATED_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
"""


@register("q_subq_correlated", oracle=_CORRELATED_SQL, category="subquery")
def q_subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders exceeding 2× their
    customer's average. Catalyst decorrelates into aggregate + join —
    NOT a per-row subquery execution (plan asserted in tests)."""
    return _sql(spark, sf_dir, _CORRELATED_SQL)


_IN_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey IN (0, 1))
"""


@register("q_subq_in", oracle=_IN_SQL, category="subquery")
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as a left-semi join on the subquery)."""
    return _sql(spark, sf_dir, _IN_SQL)


@register(
    "q_subq_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2) t
    WHERE c.c_nationkey = 7
    """,
    category="subquery",
)
def q_subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery: each nation-7 customer's two
    most expensive orders (ties broken by key — a total order, or the
    driver hash could legitimately differ). Spark decorrelates the
    lateral into a join + per-key window group-limit — the per-row
    "run a subquery" phrasing plans to the SAME rank-filter shape as
    q_topk_per_group, NOT an O(rows × subquery) nested loop
    (WindowGroupLimit gated in tests/test_plans.py)."""
    from batchprocessor_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2) t
        WHERE c.c_nationkey = 7
        """
    )


@register(
    "q_subq_exists_flag",
    oracle="""
    WITH flagged AS (
      SELECT c.c_nationkey,
             CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT')
             THEN 1 ELSE 0 END AS has_urgent
      FROM customer c)
    SELECT c_nationkey, count(*)::BIGINT AS n_customers,
           sum(has_urgent)::BIGINT AS n_with_urgent
    FROM flagged
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    category="subquery",
)
def q_subq_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a PROJECTED boolean (a "mark join"): every customer
    keeps a has-urgent-order flag instead of being filtered — the
    shape that semi/anti joins cannot express because BOTH outcomes
    survive to the aggregate. Spark plans it as an ExistenceJoin
    (hash join emitting the match bit; gated in tests/test_plans.py),
    NOT a per-row subquery execution — the decorrelation that makes
    flag-enrichment linear at 100 TB. The priority filter prunes the
    orders side before the join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH flagged AS (
          SELECT c.c_nationkey,
                 CASE WHEN EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT')
                 THEN 1 ELSE 0 END AS has_urgent
          FROM customer c)
        SELECT c_nationkey, count(*) AS n_customers,
               CAST(sum(has_urgent) AS BIGINT) AS n_with_urgent
        FROM flagged
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


_NOT_IN_SQL = """
    WITH keys AS (
      SELECT CASE WHEN n_nationkey % 7 = 3 THEN NULL
                  ELSE n_nationkey END AS k
      FROM nation),
    naive AS (
      SELECT count(*) AS n FROM customer
      WHERE c_nationkey NOT IN (SELECT k FROM keys)),
    filtered AS (
      SELECT count(*) AS n FROM customer
      WHERE c_nationkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)),
    hit AS (
      SELECT count(*) AS n FROM customer
      WHERE c_nationkey IN (SELECT k FROM keys))
    SELECT CAST((SELECT n FROM naive) AS BIGINT) AS naive_not_in,
           CAST((SELECT n FROM filtered) AS BIGINT) AS filtered_not_in,
           CAST((SELECT n FROM hit) AS BIGINT) AS in_matches,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS total
"""


@register("q_subq_not_in_nullaware", oracle=_NOT_IN_SQL, category="subquery")
def q_subq_not_in_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a NULL-bearing subquery — SQL's tri-valued-logic
    footgun, exercised deliberately: with any NULL in the subquery,
    `x NOT IN (...)` can never be TRUE (x <> NULL is UNKNOWN), so the
    naive lane returns 0 rows while the null-filtered lane returns the
    real complement; the one-row audit emits both counts plus the IN
    side and the total, so the invariant filtered = total − in_matches
    (and naive = 0 whenever a NULL exists) is hash-checked against
    DuckDB's implementation of the same standard semantics.

    Scale posture: Spark plans the naive lane as a NULL-aware anti
    join (broadcast here — the subquery is tiny; at scale it stays a
    broadcast because NOT-IN subqueries that need null-awareness must
    fit the build side) and the filtered lane as an ordinary
    broadcast anti join."""
    return _sql(spark, sf_dir, _NOT_IN_SQL)


_QUANTIFIED_SPARK_SQL = """
    WITH sup AS (
      SELECT s_nationkey, max(s_acctbal) AS mx, count(*) AS n_sup
      FROM supplier GROUP BY s_nationkey)
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN sup.n_sup IS NULL THEN TRUE
                ELSE c_acctbal > sup.mx END AS beats_all,
           CASE WHEN sup.n_sup IS NULL THEN FALSE
                ELSE c_acctbal < sup.mx END AS below_any,
           coalesce(sup.n_sup, CAST(0 AS BIGINT)) AS n_sup
    FROM customer LEFT JOIN sup ON sup.s_nationkey = c_nationkey
"""

_QUANTIFIED_ORACLE = """
    SELECT c_custkey, c_nationkey, c_acctbal,
           c_acctbal > ALL (SELECT s_acctbal FROM supplier s
                            WHERE s.s_nationkey = c.c_nationkey)
             AS beats_all,
           c_acctbal < ANY (SELECT s_acctbal FROM supplier s
                            WHERE s.s_nationkey = c.c_nationkey)
             AS below_any,
           (SELECT count(*) FROM supplier s
            WHERE s.s_nationkey = c.c_nationkey)::BIGINT AS n_sup
    FROM customer c
"""


@register("q_subq_quantified", oracle=_QUANTIFIED_ORACLE, category="subquery")
def q_subq_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries — `> ALL` / `< ANY` against a
    correlated set (does this customer out-bank EVERY supplier in its
    nation? is it below AT LEAST ONE?). Spark SQL has no ALL/ANY
    quantifiers, so the engine runs the canonical aggregate rewrite —
    > ALL(S) ≡ > max(S), < ANY(S) ≡ < max(S) — as ONE grouped
    aggregate LEFT-joined back; the DuckDB oracle runs the LITERAL
    quantified subqueries, so the rewrite's semantics (including the
    vacuous-truth footgun: ALL over an EMPTY set is TRUE, ANY is
    FALSE — the n_sup column exposes which rows that rule decided)
    are verified against a native implementation, the same
    cross-engine discipline as q_subq_not_in_nullaware's tri-valued
    NOT IN.

    Cross-engine exactness: both engines compare the same parquet
    doubles against the same per-nation max; flags are booleans,
    n_sup an exact count.

    Scale posture: the correlated quantifier decorrelates to one
    nation-keyed aggregate (25 rows) broadcast onto the customer
    scan — per-row subquery re-execution (the naive plan) never
    happens; at 100 TB this is the difference between one shuffle
    and |customer| subquery probes."""
    return _sql(spark, sf_dir, _QUANTIFIED_SPARK_SQL)
