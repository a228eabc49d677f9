"""Spark-SQL twins for the SURVEY §2.2 contract queries (VERDICT r4 #8).

Every registered query carries a DuckDB oracle; most of that SQL is
plain ANSI and runs unchanged through ``engine.sql()`` over the
catalog views.  A handful use DuckDB dialect (``//`` integer division,
``strftime``, ``list_aggregate``, named-window frame extension,
``json_extract``, ``quantile_cont``) — this module provides the
Spark-dialect equivalent so the declared ``engine.sql(str)`` lifecycle
(SURVEY §3.4) is proven end-to-end for the whole contract set:
``tests/test_sql_twins.py`` runs each twin through a real
``spark.sql()`` and asserts the result is value-identical to the
DataFrame builder's.

Twin-writing rules (learned the exact-hash way):
- numeric literals that the builder creates with ``F.lit(100.0)``
  must be DOUBLE literals (``100.0D``) — a bare ``100.0`` parses as
  DECIMAL(4,1) and turns double division into decimal division;
- integer division on the decimal(38,0) exact-cents accumulators is
  ``DIV`` (DuckDB spells it ``//``);
- fold order matters for float sums: ``aggregate(v, 0.0D, (a,x)->a+x)``
  reproduces the builder's ``F.aggregate`` left fold exactly.
"""

from __future__ import annotations

import re

from batchprocessor_spark.plans.registry import load_all

# Queries whose oracle text is NOT valid/equivalent Spark SQL and need
# a hand-written Spark-dialect twin (beyond the mechanical // -> DIV).
SPARK_SQL_TWINS: dict[str, str] = {
    "q_agg_approx": """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           TRUE AS approx_ok,
           round(percentile(l_extendedprice, 0.5), 2) AS p50_price,
           round(percentile(l_extendedprice, 0.95), 2) AS p95_price,
           TRUE AS pct_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    "q_win_analytic": """
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS first_val,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_win_frame": """
    WITH c AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT o_orderkey, o_custkey,
           (sum(cents) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 100.0D
             AS run_sum,
           (sum(cents) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) / 100.0D
             / (count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg3,
           (sum(cents) OVER (PARTITION BY o_orderstatus
                 ORDER BY o_orderkey
                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)) / 100.0D
             AS range_sum
    FROM c
    """,
    "q_fn_string": """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substr(p_name, 1, 8) AS name_prefix,
           trim(p_name) AS name_trim,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat_ws(':', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           size(split(p_type, ' ')) AS type_words,
           (p_type LIKE '%BRASS%') AS is_brass,
           startswith(p_name, 'a') AS starts_a
    FROM part
    """,
    "q_fn_date": """
    SELECT o_orderkey,
           date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS order_month,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_mon,
           dayofweek(o_orderdate) - 1 AS order_dow,
           date_format(add_months(o_orderdate, 3), 'yyyy-MM-dd') AS plus_3m,
           datediff(DATE'2002-01-01', o_orderdate) AS days_to_2002,
           date_format(o_orderdate, 'yyyy-MM-dd') AS order_day_str,
           date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end
    FROM orders
    """,
    "q_fn_array": """
    WITH e AS (
      SELECT vec_id, embedding,
             transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
    SELECT vec_id,
           size(embedding) AS dim,
           round(element_at(v, 1), 6) AS first_elem,
           round(aggregate(v, 0.0D, (a, x) -> a + x), 4) AS vec_sum,
           round(array_max(v), 6) AS vec_max,
           round(array_min(v), 6) AS vec_min,
           round(aggregate(transform(v, x -> x * x), 0.0D, (a, x) -> a + x), 4)
             AS vec_sq_sum,
           size(filter(v, x -> x > 0)) AS n_positive,
           round(aggregate(slice(v, 1, 8), 0.0D, (a, x) -> a + x), 4) AS head_sum
    FROM e
    """,
    "q_fn_json": """
    SELECT event_id,
           CAST(j.k AS INT) AS k_value,
           CAST(j.k AS INT) % 10 AS k_bucket,
           (j.missing IS NULL) AS missing_is_null
    FROM events
    LATERAL VIEW json_tuple(props, 'k', 'missing') j AS k, missing
    """,
}

# The queries whose Spark-SQL lane is VERIFIED value-identical to the
# DataFrame builder (tests/test_sql_twins.py) — the SURVEY §2.2
# contract set. spark_sql_for refuses names outside it: most other
# registered oracles use DuckDB-only functions (epoch_us, list_filter,
# quantile_cont, ...) that would fail at runtime, and the mechanical
# // -> DIV transform is only safe where the operands are known
# non-negative (DuckDB // floors, Spark DIV truncates — they disagree
# on negative quotients), which is audited per-twin, not globally.
VERIFIED_TWINS: frozenset[str] = frozenset(
    {
        "q_scan_project", "q_filter_pred",
        "q_join_inner_broadcast", "q_join_inner_sortmerge", "q_join_left",
        "q_join_full", "q_join_semi", "q_join_anti", "q_join_cross",
        "q_join_theta_range", "q_join_asof",
        "q_agg_basic", "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
        "q_agg_cube", "q_agg_gsets",
        "q_win_rank", "q_win_analytic", "q_win_frame",
        "q_sort_limit", "q_topk_per_group",
        "q_set_union_all", "q_set_union", "q_set_intersect", "q_set_except",
        "q_fn_string", "q_fn_date", "q_fn_math", "q_fn_array", "q_fn_json",
        "q_dedup_exact",
    }
)

# DuckDB's integer-division spelling; Spark's is DIV. The verified
# oracles only ever use // between parenthesized/identifier operands
# that are non-negative by construction (exact-cents sums), never
# inside string literals, so the token replace is exact FOR THIS SET.
_DIV_RE = re.compile(r"\s*//\s*")


def spark_sql_for(name: str) -> str:
    """The Spark-SQL text for a VERIFIED query: the hand-written twin
    when one exists, else the oracle text with DuckDB's ``//`` mapped
    to Spark's ``DIV``. Raises KeyError for queries outside the
    verified contract set — returning unvalidated dialect text would
    be a runtime trap (review r5)."""
    if name in SPARK_SQL_TWINS:
        return SPARK_SQL_TWINS[name]
    if name not in VERIFIED_TWINS:
        raise KeyError(
            f"{name} has no verified Spark-SQL twin; use Engine.query() "
            "(the DataFrame builder) — twins exist for the SURVEY §2.2 "
            "contract set only"
        )
    oracle = load_all()[name].oracle
    if oracle is None:
        raise KeyError(f"{name} has no oracle and no hand-written twin")
    return _DIV_RE.sub(" DIV ", oracle)
