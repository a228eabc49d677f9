"""Warehouse / product-analytics operators beyond the SURVEY §2.2
contract: SCD2 dimension builds, funnel + cohort analysis over the
events stream, lossless-pruned fuzzy joins, and one-pass column
profiling. None exist in the reference (its pipeline is T-agnostic,
`batchprocessor-core/src/main/java/.../v2/BatchProcessor.java:24`);
these are the analytics a user of the engine's relational surface
reaches for next, each with a full DuckDB value oracle.

Determinism discipline (driver hash compare): timestamps are emitted
as epoch seconds / ISO strings, booleans as ints, and every window
that feeds row_number gets a total order (see operators/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batchprocessor_spark.functions.exactmath import to_units
from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table
from batchprocessor_spark.session import materialize


@register(
    "q_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id,
           event_type AS state,
           row_number() OVER w AS version,
           (epoch_us(ts) // 1000000)::BIGINT AS valid_from_s,
           coalesce((epoch_us(lead(ts) OVER w) // 1000000)::BIGINT,
                    -1) AS valid_to_s,
           (CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="analytics",
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change stream:
    each user's event_type plays the tracked attribute; consecutive
    duplicates collapse (lag-compare), surviving change rows get
    [valid_from, valid_to) validity from lead(), and the open row is
    flagged current. This is the standard event-sourced dimension
    materialization a warehouse runs on every load.

    Scale posture: ONE shuffle on user_id; both windows and the
    change filter share the same partitioning + sort, so Catalyst
    plans a single Exchange with two Window operators back-to-back.
    No join, no second pass over the input.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    lead_ts = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.row_number().over(w).alias("version"),
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.coalesce(F.unix_timestamp(lead_ts), F.lit(-1)).alias("valid_to_s"),
        F.when(lead_ts.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v)::BIGINT AS view_users,
           (SELECT count(*) FROM c)::BIGINT AS click_users,
           (SELECT count(*) FROM p)::BIGINT AS purchase_users
    """,
    category="analytics",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts a stage only with an event AT OR AFTER their entry into
    the previous stage (first view, then first qualifying click, then
    first qualifying purchase). Emits the per-stage user counts.

    Scale posture: implemented as three nested per-user window
    aggregates over ONE hash partitioning on user_id (no self-joins):
    v_ts = min(view ts) over the user, c_ts = min(click ts >= v_ts),
    p_ts = min(purchase ts >= c_ts), then a per-user dedup and a
    3-counter global fold. One Exchange total; the oracle spells the
    same semantics as chained joins.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    v_ts = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e = e.withColumn("v_ts", v_ts)
    c_ts = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("v_ts")),
            F.col("ts"),
        )
    ).over(w)
    e = e.withColumn("c_ts", c_ts)
    p_ts = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c_ts")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        e.withColumn("p_ts", p_ts)
        .groupBy("user_id")
        .agg(
            F.max("v_ts").alias("v_ts"),
            F.max("c_ts").alias("c_ts"),
            F.max("p_ts").alias("p_ts"),
        )
    )
    return per_user.agg(
        F.count("v_ts").alias("view_users"),
        F.count("c_ts").alias("click_users"),
        F.count("p_ts").alias("purchase_users"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    activity AS (
      SELECT strftime(date_trunc('day', f.first_ts),
                      '%Y-%m-%d') AS cohort_day,
             date_diff('day', date_trunc('day', f.first_ts),
                       date_trunc('day', e.ts))::INT AS day_offset,
             e.user_id
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_day, day_offset,
           count(DISTINCT user_id)::BIGINT AS users
    FROM activity GROUP BY cohort_day, day_offset
    """,
    category="analytics",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by their first-ever
    activity day; each (cohort_day, day_offset) cell counts the
    distinct users of that cohort active offset days later — the
    table every retention curve is drawn from.

    Scale posture: the per-user first day is a window min over the
    SAME user_id partitioning the distinct-count then groups by, so
    the expensive half (per-user state) is one shuffle; the final
    aggregate reduces to (days × offsets) cells, tiny at any scale.
    Cohort day is emitted as an ISO string (driver-stable; raw
    dates stringify differently across engines).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    withc = e.withColumn("first_ts", F.min("ts").over(w))
    return (
        withc.select(
            F.date_format(F.date_trunc("day", "first_ts"), "yyyy-MM-dd").alias(
                "cohort_day"
            ),
            F.datediff(
                F.date_trunc("day", "ts"), F.date_trunc("day", "first_ts")
            ).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("users"))
    )


_FUZZY_MAX_DIST = 2  # Levenshtein threshold for the fuzzy name join


@register(
    "q_join_fuzzy_editdist",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name)::INT AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
    """,
    category="join",
)
def q_join_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: all distinct part-name pairs within
    Levenshtein distance {2}. The oracle states the ALL-PAIRS
    semantics; the implementation reaches the identical result
    through a LOSSLESS equi-join prune — edit distance >= length
    difference, so each left name fans out to the 2T+1 length
    buckets it could match and joins right names on exact length.
    Candidates then pass the exact levenshtein verify.

    Scale posture: the plan is exchange(hash on length bucket) +
    sort-merge join — NO cartesian, NO broadcast nested loop (gated
    in tests/test_plans.py). Candidate count is bounded by the
    length-histogram products, a tiny fraction of n² on real string
    distributions; tighter pruning (first-token blocking, q-gram
    prefix filters) composes the same way but is recall-lossy, so
    the engine ships the lossless band as the default.
    """
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    left = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.sequence(
                F.length("p_name") - _FUZZY_MAX_DIST,
                F.length("p_name") + _FUZZY_MAX_DIST,
            )
        ).alias("len_bucket"),
    )
    right = names.select(
        F.col("p_name").alias("name_b"), F.length("p_name").alias("len_bucket")
    )
    return (
        left.join(right, "len_bucket")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= _FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
    )


# Profiled columns: (name, null-safe min/max expression builder kind)
_PROFILE_COLS = (
    ("o_orderkey", "long"),
    ("o_custkey", "long"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "epoch"),
    ("o_orderpriority", "str"),
)


def _minmax_as_string(col: str, kind: str, agg) -> F.Column:
    """Engine-stable stringification of a min/max: numerics via exact
    integer forms (doubles as cents), timestamps as epoch seconds —
    never raw float/date rendering, which differs across engines."""
    c = F.col(col)
    if kind == "long":
        return agg(c).cast("string")
    if kind == "cents":
        return F.round(agg(c) * 100).cast("long").cast("string")
    if kind == "epoch":
        return agg(F.unix_timestamp(c)).cast("string")
    return agg(c)


@register(
    "q_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS nulls,
           count(DISTINCT o_orderkey)::BIGINT AS ndv,
           min(o_orderkey)::VARCHAR AS min_s, max(o_orderkey)::VARCHAR AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey)::BIGINT,
           min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus)::BIGINT,
           min(o_orderstatus), max(o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice)::BIGINT,
           round(min(o_totalprice) * 100)::BIGINT::VARCHAR,
           round(max(o_totalprice) * 100)::BIGINT::VARCHAR FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate)::BIGINT,
           (epoch_us(min(o_orderdate)) // 1000000)::BIGINT::VARCHAR,
           (epoch_us(max(o_orderdate)) // 1000000)::BIGINT::VARCHAR FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority)::BIGINT,
           min(o_orderpriority), max(o_orderpriority) FROM orders
    """,
    category="analytics",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over `orders`: per column null count,
    exact distinct count, and engine-stable min/max strings — the
    data-quality snapshot a pipeline records per ingest batch.

    Scale posture: ONE scan producing every aggregate at once (the
    long output is a driver-side-free unpivot of a single 1-row
    aggregate). Exact multi-column count_distinct costs one Expand
    (k× the rows map-side, combined before the shuffle); at 100 TB
    swap count_distinct for approx_count_distinct and the Expand
    disappears — the profile shape is unchanged.

    r13, evaluated and REJECTED (measured, VERDICT r12 #8): splitting
    the profile into per-column groupBy(value) partial aggregates
    unioned at the end removes the Expand but measured SLOWER at
    sf0.1 — 2.42 s vs 1.97 s median, losing all 5 interleaved reps
    (plan: 0 Expand but 6 scans + 6 two-level aggregates, 24 vs 4
    Exchange mentions). The Expand's 7× row copies feed straight
    into the partial hash aggregate and are cheaper than five extra
    scan+aggregate pipelines; the verdict's condition ("if the plan
    confirms the Expand is the cost") does not hold.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for col, kind in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__ndv"),
            _minmax_as_string(col, kind, F.min).alias(f"{col}__min"),
            _minmax_as_string(col, kind, F.max).alias(f"{col}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__ndv, {col}__min, {col}__max"
        for col, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, nulls, ndv, min_s, max_s)"
        )
    )


_IQR_K = 1.5  # Tukey fence multiplier


@register(
    "q_anomaly_iqr",
    oracle=f"""
    WITH u AS (
      SELECT event_type, round(value * 100)::BIGINT AS cents FROM events),
    b AS (
      SELECT event_type,
             quantile_cont(cents, 0.25) AS q1,
             quantile_cont(cents, 0.75) AS q3
      FROM u GROUP BY event_type)
    SELECT u.event_type,
           count(*)::BIGINT AS n,
           sum(CASE WHEN u.cents < b.q1 - {_IQR_K} * (b.q3 - b.q1)
                      OR u.cents > b.q3 + {_IQR_K} * (b.q3 - b.q1)
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           b.q1 - {_IQR_K} * (b.q3 - b.q1) AS lo_cents,
           b.q3 + {_IQR_K} * (b.q3 - b.q1) AS hi_cents
    FROM u JOIN b USING (event_type)
    GROUP BY u.event_type, b.q1, b.q3
    """,
    category="analytics",
)
def q_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group IQR (Tukey-fence) outlier detection over event
    values: each event_type gets [q1 - 1.5·IQR, q3 + 1.5·IQR] fences
    from exact interpolated quartiles, and events outside them are
    counted — the robust anomaly screen that, unlike z-scores, is not
    itself dragged by the outliers it hunts.

    Scale posture: quartiles reduce to a per-type aggregate (types are
    low-cardinality, the exact percentile sort is per-group); the
    fence table is broadcast back onto the events scan, so the big
    side never shuffles for the join and flagging is a narrow
    projection. Quartiles are computed over exact integer cents, whose
    interpolation (±quarter fractions) is exact in doubles — both
    engines emit bit-identical fences.
    """
    u = load_table(spark, sf_dir, "events").select(
        "event_type", to_units(F.col("value"), 100).alias("cents")
    )
    # r12: one percentile buffer for both quartiles (value-identical;
    # the q_agg_approx consolidation, guide §1.2).
    b = (
        u.groupBy("event_type")
        .agg(
            F.percentile(
                "cents", F.array(F.lit(0.25), F.lit(0.75))
            ).alias("_q")
        )
        .select(
            "event_type",
            F.element_at("_q", 1).alias("q1"),
            F.element_at("_q", 2).alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(_IQR_K) * iqr
    hi = F.col("q3") + F.lit(_IQR_K) * iqr
    flagged = u.join(F.broadcast(b), "event_type")
    return (
        flagged.groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("cents") < lo) | (F.col("cents") > hi), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            lo.alias("lo_cents"),
            hi.alias("hi_cents"),
        )
    )


# Token-anchored pattern (ADVICE r2): tokens are joined with a DOUBLE
# separator ",," and the whole sequence wrapped in single commas, so
# every token is comma-delimited on both sides — "preview" can never
# match "view". A match consumes only the LEFT comma of each ",,"
# boundary pair, leaving the right comma as the anchor for the next
# match, so back-to-back runs (v,c,p,v,c,p) still count as 2 without
# regex lookahead (DuckDB's RE2 has none).
_SEQ_PATTERN = ",view,,click,,purchase,"


@register(
    "q_seq_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             count(*)::BIGINT AS n_events,
             ',' || string_agg(event_type, ',,' ORDER BY ts, event_id) || ','
               AS seq
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           len(regexp_extract_all(seq, '{_SEQ_PATTERN}'))::INT AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) > 0
    """,
    category="analytics",
)
def q_seq_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining (the MATCH_RECOGNIZE shape): users
    whose event timeline contains an IMMEDIATELY-consecutive
    view→click→purchase run, with the count of such runs. Stricter
    than q_funnel_conversion (which allows gaps): this is the
    "clean conversion" pattern session-replay products report.

    Scale posture: ONE shuffle on user_id; the per-user timeline is
    assembled with sort_array(collect_list(struct(ts, event_id,
    type))) — deterministic total order, no window pass needed — and
    pattern counting is a regexp over the joined sequence, all
    JVM-side. Per-user timelines are bounded (largest fixture user ≈
    hundreds of events); a pathological million-event user would call
    for sessionized splitting first (q_win_session's shape).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = F.concat(
        F.lit(","),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ",,",
        ),
        F.lit(","),
    )
    seqs = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("seq")
    )
    n_matches = F.regexp_count(F.col("seq"), F.lit(_SEQ_PATTERN))
    return (
        seqs.select("user_id", "n_events", n_matches.alias("n_matches"))
        .where(F.col("n_matches") > 0)
    )


@register(
    "q_streaks_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    grouped AS (
      SELECT user_id, day,
             date_diff('day', DATE '2024-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM days),
    islands AS (
      SELECT user_id, grp,
             count(*)::BIGINT AS streak_days,
             (epoch_us(min(day)) // 1000000)::BIGINT AS start_s
      FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           max(streak_days)::BIGINT AS longest_streak,
           count(*)::BIGINT AS n_streaks,
           min(start_s) FILTER (
             WHERE streak_days = (SELECT max(i2.streak_days) FROM islands i2
                                  WHERE i2.user_id = islands.user_id)
           )::BIGINT AS best_start_s
    FROM islands GROUP BY user_id
    """,
    category="analytics",
)
def q_streaks_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE
    active days, how many distinct runs there are, and when the best
    run began (earliest, if several tie) — the engagement-streak
    metric. The classic trick: day_number − row_number is constant
    within a consecutive run, so one subtraction turns runs into
    group keys.

    Scale posture: two aggregates and one window, ALL partitioned by
    user_id — a single hash exchange carries the whole query
    (distinct days, the row_number, the island aggregate, and the
    per-user fold reuse the same partitioning; Catalyst plans exactly
    one Exchange). No joins, no self-comparison of dates.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    # Partition on user_id BEFORE the distinct: hashpartitioning on a
    # prefix of the group keys satisfies the (user_id, day) aggregate
    # AND every later per-user step, collapsing the plan to one
    # Exchange (gated in tests/test_plans.py).
    days = e.repartition("user_id").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w),
    )
    islands = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.unix_timestamp(F.min("day")).alias("start_s"),
    )
    wbest = Window.partitionBy("user_id")
    return (
        islands.withColumn("best", F.max("streak_days").over(wbest))
        .groupBy("user_id")
        .agg(
            F.max("streak_days").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.min(
                F.when(F.col("streak_days") == F.col("best"), F.col("start_s"))
            ).alias("best_start_s"),
        )
    )


@register(
    "q_dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS rule,
           (count(*) - count(DISTINCT o_orderkey))::BIGINT AS violations,
           count(*)::BIGINT AS checked
    FROM orders
    UNION ALL
    SELECT 'orders_status_accepted',
           sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                    THEN 1 ELSE 0 END)::BIGINT,
           count(*)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive',
           sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                    THEN 1 ELSE 0 END)::BIGINT,
           count(*)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'orders_date_not_null',
           (count(*) - count(o_orderdate))::BIGINT, count(*)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           count(*)::BIGINT, (SELECT count(*) FROM lineitem)::BIGINT
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_qty_range',
           sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END)::BIGINT,
           count(*)::BIGINT
    FROM lineitem
    """,
    category="analytics",
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations report (the Deequ / dbt-
    test shape): primary-key uniqueness, accepted value sets, range
    and not-null constraints, and cross-table referential integrity —
    one (rule, violations, checked) row each, the gate a warehouse
    load runs before publishing a partition.

    Scale posture: the four orders rules compute in ONE scan/aggregate
    (conditional sums share the pass); the uniqueness rule is a
    count-distinct (Expand, map-side combined); the FK orphan check is
    an anti-join on the key — at 100 TB the orders side reduces to a
    distinct-key index, never full rows. Nothing collects beyond the
    six report rows.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n_orders = F.count(F.lit(1))
    orders_wide = o.agg(
        (n_orders - F.count_distinct(F.col("o_orderkey"))).alias("pk"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("status"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        ).alias("price"),
        (n_orders - F.count("o_orderdate")).alias("datenull"),
        n_orders.alias("checked"),
    )
    orders_rules = orders_wide.select(
        F.expr(
            "stack(4, 'orders_pk_unique', pk, 'orders_status_accepted', status, "
            "'orders_price_positive', price, 'orders_date_not_null', datenull) "
            "AS (rule, violations)"
        ),
        F.col("checked"),
    )
    n_lines = l.agg(F.count(F.lit(1)).alias("checked"))
    orphans = (
        l.select("l_orderkey")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("lineitem_fk_orders").alias("rule"), "violations")
        # 1-row × 1-row crossJoin keeps the report fully lazy — no
        # eager driver-side count scan at plan-build time
        .crossJoin(F.broadcast(n_lines))
    )
    qty = l.agg(
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("violations"),
        F.count(F.lit(1)).alias("checked"),
    ).select(F.lit("lineitem_qty_range").alias("rule"), "violations", "checked")
    return orders_rules.unionByName(orphans).unionByName(qty)


@register(
    "q_ml_ols_regression",
    oracle="""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity)::BIGINT AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="analytics",
)
def q_ml_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed simple OLS per group: price-on-quantity slope,
    intercept, R² and mean fits via the regr_* aggregate family — one
    partial-aggregate pass over the fact table (each regr_* reduces to
    mergeable moment sums n/Σx/Σy/Σxy/Σx², so the plan is the same
    partial+final HashAggregate as any sum: model fitting at 100 TB
    without a single collect). Float discipline: moments are summed as
    doubles on both engines, so outputs are rounded (same convention
    as q_agg_stats' corr/covar lane)."""
    l = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 2).alias("avg_y"),
    )


@register(
    "q_ml_naive_bayes",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS ws
      FROM documents),
    train AS (SELECT * FROM d WHERE doc_id % 2 = 0),
    test AS (SELECT * FROM d WHERE doc_id % 2 = 1),
    tr_tok AS (SELECT lang, unnest(ws) AS w FROM train),
    clw AS (SELECT lang, w, count(*)::BIGINT AS c FROM tr_tok GROUP BY 1, 2),
    cl AS (SELECT lang, count(*)::BIGINT AS n FROM tr_tok GROUP BY 1),
    v AS (SELECT count(DISTINCT w)::BIGINT AS v FROM tr_tok),
    prior AS (
      SELECT lang, log2(count(*)::DOUBLE
                        / (SELECT count(*) FROM train)) AS lp
      FROM train GROUP BY 1),
    te_tok AS (SELECT doc_id, lang AS lang_actual, unnest(ws) AS w FROM test),
    scored AS (
      SELECT t.doc_id, t.lang_actual, p.lang,
             any_value(p.lp)
               + sum(log2((coalesce(clw.c, 0) + 1)::DOUBLE
                          / (cl.n + (SELECT v FROM v)))) AS score
      FROM te_tok t
      CROSS JOIN prior p
      JOIN cl ON cl.lang = p.lang
      LEFT JOIN clw ON clw.lang = p.lang AND clw.w = t.w
      GROUP BY t.doc_id, t.lang_actual, p.lang),
    ranked AS (
      SELECT doc_id, lang_actual, lang, round(score, 6) AS score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(score, 6) DESC, lang ASC) AS rn
      FROM scored)
    SELECT doc_id, lang_actual, lang AS lang_pred, score
    FROM ranked WHERE rn = 1
    """,
    category="analytics",
)
def q_ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multinomial Naive Bayes: train on even doc_ids
    (per-language add-one-smoothed token log-likelihoods + log priors,
    all computed as aggregates — the model IS three small tables),
    score odd doc_ids against every language, emit the argmax. The
    from-first-principles "ML training as a groupBy" companion to
    k-means/OLS/PageRank.

    Shape: model tables are vocabulary-sized, so scoring is test
    tokens × |langs| (a broadcast 5-row expansion) with a BROADCAST
    left join onto the (lang, token) count table — the corpus-scale
    side never shuffles for the lookup; one aggregate to per-(doc,
    lang) scores; argmax over a 5-row-per-doc window. Determinism:
    per-doc score sums vary in order between engines, so scores round
    to 6 dp BEFORE the argmax and ties break on language name — both
    engines then walk the identical ranking."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
        ).alias("ws"),
    )
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    tr_tok = train.select("lang", F.explode("ws").alias("w"))
    clw = tr_tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    cl = tr_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    v = tr_tok.agg(F.countDistinct("w").alias("v"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_docs"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(n_train))
        .select("lang", F.log2(F.col("nd").cast("double") / F.col("n_docs")).alias("lp"))
    )
    te_tok = test.select(
        "doc_id", F.col("lang").alias("lang_actual"), F.explode("ws").alias("w")
    )
    scored = (
        te_tok.crossJoin(F.broadcast(prior))
        .join(F.broadcast(cl), "lang")
        .join(F.broadcast(clw), ["lang", "w"], "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id", "lang_actual", "lang")
        .agg(
            (
                F.first("lp")
                + F.sum(
                    F.log2(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                        / (F.col("n") + F.col("v"))
                    )
                )
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round("score", 6).desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang_actual",
            F.col("lang").alias("lang_pred"),
            F.round("score", 6).alias("score"),
        )
    )


@register(
    "q_dq_drift_psi",
    oracle="""
    WITH halves AS (
      SELECT lang, doc_id % 2 = 0 AS is_even FROM documents
      WHERE lang IS NOT NULL),
    counts AS (
      SELECT lang,
             sum(CASE WHEN is_even THEN 1 ELSE 0 END)::BIGINT AS n_even,
             sum(CASE WHEN is_even THEN 0 ELSE 1 END)::BIGINT AS n_odd
      FROM halves GROUP BY lang),
    tot AS (
      SELECT sum(n_even)::BIGINT AS te, sum(n_odd)::BIGINT AS to_,
             count(*)::BIGINT AS nl
      FROM counts)
    SELECT lang, n_even, n_odd,
           round(((n_even + 1)::DOUBLE / (te + nl)
                  - (n_odd + 1)::DOUBLE / (to_ + nl))
                 * ln(((n_even + 1)::DOUBLE / (te + nl))
                      / ((n_odd + 1)::DOUBLE / (to_ + nl))), 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
    category="analytics",
)
def q_dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two corpus
    snapshots (stand-in: even vs odd doc_ids) over the language
    distribution — the composition-drift alarm a data-quality layer
    fires between ingestion batches. Per language: counts in both
    halves and the PSI contribution (p_a − p_b)·ln(p_a/p_b) with
    add-one (Laplace) smoothing so a language absent from one half
    contributes a finite, correctly-signed term instead of ±∞. Total
    PSI is the sum of terms; >0.25 is the conventional "major shift"
    alarm.

    Exactness: both halves' counts and totals are exact integers from
    ONE aggregate; each term is the identical IEEE expression on both
    engines, rounded at 6. Shape: one map-side-combined shuffle on
    lang, a 1-row totals broadcast — the 100 TB plan unchanged."""
    d = load_table(spark, sf_dir, "documents").where(F.col("lang").isNotNull())
    counts = d.groupBy("lang").agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even"),
        F.sum(F.when(F.col("doc_id") % 2 == 0, 0).otherwise(1))
        .cast("long")
        .alias("n_odd"),
    )
    tot = counts.agg(
        F.sum("n_even").cast("long").alias("te"),
        F.sum("n_odd").cast("long").alias("to_"),
        F.count(F.lit(1)).cast("long").alias("nl"),
    )
    pa = (F.col("n_even") + 1).cast("double") / (F.col("te") + F.col("nl"))
    pb = (F.col("n_odd") + 1).cast("double") / (F.col("to_") + F.col("nl"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_even",
        "n_odd",
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


# Benford expected first-digit shares in basis points:
# round(10000 * log10(1 + 1/d)) — precomputed constants so neither
# engine evaluates a float log (the table IS the declared contract).
_BENFORD_CASE = (
    "CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249"
    " WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580"
    " WHEN 8 THEN 512 WHEN 9 THEN 458 END"
)


@register(
    "q_dq_benford",
    oracle=f"""
    WITH c AS (
      SELECT round(o_totalprice * 100)::BIGINT AS cents
      FROM orders WHERE o_totalprice > 0),
    d AS (SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit FROM c),
    g AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1)
    SELECT digit, n,
           ((10000 * n) // sum(n) OVER ())::BIGINT AS obs_bp,
           ({_BENFORD_CASE})::BIGINT AS exp_bp,
           abs((10000 * n) // sum(n) OVER () - ({_BENFORD_CASE}))::BIGINT
             AS dev_bp
    FROM g
    """,
    category="dq",
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals —
    the fraud/synthetic-data screen in the DQ family beside PSI drift
    and the expectations report: natural multi-magnitude amounts
    follow P(d) = log10(1 + 1/d); a generator that draws uniformly (as
    this fixture does) or a fabricated ledger shows near-flat digit
    shares, and dev_bp quantifies the gap per digit.

    Exactness: the first digit is taken from the DECIMAL STRING of
    integer cents (never floor(log10(x)) — a float log at exact powers
    of ten can land on either side in the last ulp); shares are
    integer basis points via DIV over a window total; the Benford
    expectations are pinned integer constants, so both engines agree
    bit-for-bit.

    Scale posture: one map-side-combined count to ≤9 rows, then
    digit-table-local window math — the scan dominates; nothing else
    exceeds 9 rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    g = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return g.select(
        "digit",
        "n",
        F.expr("(10000 * n) div sum(n) over ()").cast("long").alias("obs_bp"),
        F.expr(_BENFORD_CASE).cast("long").alias("exp_bp"),
        F.expr(
            f"abs((10000 * n) div sum(n) over () - ({_BENFORD_CASE}))"
        )
        .cast("long")
        .alias("dev_bp"),
    )


# Decision-stump histogram width: n_chars bucketed to 50-char bins —
# the histogram-based split-finding trick (LightGBM/XGBoost hist
# mode): candidate thresholds are bin edges, so split statistics come
# from ONE bounded histogram, never a docs × thresholds blow-up.
_STUMP_BIN = 50


@register(
    "q_ml_decision_stump",
    oracle=f"""
    WITH h AS (
      SELECT (n_chars // {_STUMP_BIN})::BIGINT AS b, lang,
             count(*)::BIGINT AS cnt
      FROM documents GROUP BY 1, 2),
    cum AS (
      SELECT b, lang,
             sum(cnt) OVER (PARTITION BY lang ORDER BY b)::BIGINT AS lcnt
      FROM h),
    tot AS (SELECT lang, sum(cnt)::BIGINT AS n_l FROM h GROUP BY lang),
    n AS (SELECT sum(n_l)::BIGINT AS n FROM tot),
    thr AS (SELECT DISTINCT b FROM h),
    -- per (threshold, lang): left count via the cumulative histogram
    tl AS (
      SELECT thr.b, tot.lang,
             coalesce((SELECT max(lcnt) FROM cum
                       WHERE cum.lang = tot.lang AND cum.b <= thr.b), 0)
               AS lcnt,
             tot.n_l
      FROM thr CROSS JOIN tot),
    agg AS (
      SELECT b,
             sum(lcnt)::BIGINT AS n_left,
             sum(n_l - lcnt)::BIGINT AS n_right,
             sum(lcnt * lcnt)::BIGINT AS sq_l,
             sum((n_l - lcnt) * (n_l - lcnt))::BIGINT AS sq_r
      FROM tl GROUP BY b),
    scored AS (
      SELECT b, n_left, n_right,
             (n_left * n_left - sq_l)::DOUBLE
               / ((SELECT n FROM n) * n_left)
             + (n_right * n_right - sq_r)::DOUBLE
               / ((SELECT n FROM n) * n_right) AS gini_w
      FROM agg WHERE n_left > 0 AND n_right > 0),
    best AS (
      SELECT b, n_left, n_right, gini_w,
             row_number() OVER (ORDER BY gini_w, b) AS rn
      FROM scored),
    win AS (SELECT * FROM best WHERE rn = 1),
    lc AS (
      SELECT tl.lang,
             row_number() OVER (ORDER BY tl.lcnt DESC, tl.lang) AS r
      FROM tl JOIN win ON tl.b = win.b),
    rc AS (
      SELECT tl.lang,
             row_number() OVER (ORDER BY tl.n_l - tl.lcnt DESC, tl.lang) AS r
      FROM tl JOIN win ON tl.b = win.b)
    SELECT (win.b * {_STUMP_BIN} + {_STUMP_BIN} - 1)::BIGINT AS threshold_chars,
           win.n_left, win.n_right,
           round(win.gini_w, 6) AS gini_w,
           (SELECT lang FROM lc WHERE r = 1) AS left_class,
           (SELECT lang FROM rc WHERE r = 1) AS right_class
    FROM win
    """,
    category="ml",
)
def q_ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump induction — the split-finding
    kernel of every distributed GBDT (LightGBM/XGBoost hist mode):
    find the n_chars threshold that best separates languages by
    weighted Gini impurity. The load-bearing scale idea: split
    statistics for EVERY candidate threshold come from one bounded
    (bin × class) histogram plus a per-class cumulative sum — one
    map-side-combined aggregate over the corpus, then bin-table-local
    math; the naive rows × thresholds cross join never happens.

    Exactness: all counts are integers; the weighted impurity
    decomposes as (n_l² − Σc_l²)/(n·n_l) + (n_r² − Σc_r²)/(n·n_r) —
    each side is ONE integer-exact numerator (< 2^53) divided once,
    then one add, the identical IEEE op sequence in both engines, so
    the argmin and the per-side majority classes (deterministic
    count-desc, lang-asc tie-break) agree bit-for-bit. Empty sides
    are excluded (no 0/0), and the reported threshold is the bin's
    inclusive upper edge in characters.

    Scale posture: histogram shuffle is (bins × classes) rows;
    everything after is window math on that table. Deeper trees
    iterate the same kernel per node on filtered partitions — the
    stump is the distributed primitive."""
    d = load_table(spark, sf_dir, "documents")
    h = (
        d.select(
            F.expr(f"n_chars div {_STUMP_BIN}").alias("b"), "lang"
        )
        .groupBy("b", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(materialize)
    )
    cum = h.select(
        "b",
        "lang",
        F.sum("cnt").over(Window.partitionBy("lang").orderBy("b")).alias("lcnt"),
    )
    tot = h.groupBy("lang").agg(F.sum("cnt").alias("n_l"))
    n = int(tot.agg(F.sum("n_l")).collect()[0][0])  # one scalar (model-sized)
    thr = h.select("b").distinct()
    # left count per (threshold, lang): the cumulative histogram value
    # at the largest bin <= threshold (0 when the class has no mass
    # yet) — an as-of join of the threshold grid against cum.
    tl = (
        thr.crossJoin(tot)
        .join(cum.withColumnRenamed("b", "cb"), "lang", "left")
        .groupBy("b", "lang", "n_l")
        # The <= predicate must live INSIDE the aggregate: filtering
        # the join first would DELETE (threshold, lang) groups whose
        # class has no mass yet, when the correct left count is 0.
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cb") <= F.col("b"), F.col("lcnt"))), F.lit(0)
            ).alias("lcnt")
        )
    )
    agg = tl.groupBy("b").agg(
        F.sum("lcnt").alias("n_left"),
        F.sum(F.col("n_l") - F.col("lcnt")).alias("n_right"),
        F.sum(F.col("lcnt") * F.col("lcnt")).alias("sq_l"),
        F.sum((F.col("n_l") - F.col("lcnt")) * (F.col("n_l") - F.col("lcnt"))).alias(
            "sq_r"
        ),
    )
    scored = agg.filter((F.col("n_left") > 0) & (F.col("n_right") > 0)).select(
        "b",
        "n_left",
        "n_right",
        (
            (F.col("n_left") * F.col("n_left") - F.col("sq_l")).cast("double")
            / (F.lit(n) * F.col("n_left"))
            + (F.col("n_right") * F.col("n_right") - F.col("sq_r")).cast("double")
            / (F.lit(n) * F.col("n_right"))
        ).alias("gini_w"),
    )
    win = (
        scored.withColumn(
            "rn", F.row_number().over(Window.orderBy("gini_w", "b"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .transform(materialize)
    )
    sides = tl.join(win.select("b"), "b")
    left_class = (
        sides.withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.col("lcnt").desc(), F.col("lang"))),
        )
        .filter(F.col("r") == 1)
        .select(F.col("lang").alias("left_class"))
    )
    right_class = (
        sides.withColumn(
            "r",
            F.row_number().over(
                Window.orderBy((F.col("n_l") - F.col("lcnt")).desc(), F.col("lang"))
            ),
        )
        .filter(F.col("r") == 1)
        .select(F.col("lang").alias("right_class"))
    )
    return (
        win.select(
            (F.col("b") * _STUMP_BIN + _STUMP_BIN - 1).alias("threshold_chars"),
            "n_left",
            "n_right",
            F.round("gini_w", 6).alias("gini_w"),
        )
        .crossJoin(left_class)
        .crossJoin(right_class)
    )


@register(
    "q_events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    t AS (
      SELECT prev AS from_type, event_type AS to_type,
             count(*)::BIGINT AS transitions
      FROM ordered WHERE prev IS NOT NULL
      GROUP BY prev, event_type),
    r AS (SELECT from_type, sum(transitions) AS row_total FROM t GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.transitions,
           ((t.transitions * 10000) // r.row_total)::BIGINT AS share_bp
    FROM t JOIN r ON r.from_type = t.from_type
    """,
    category="analytics",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: count
    each (from_type → to_type) step along every user's event timeline
    (total order via (ts, event_id)), with the row-conditional
    probability in integer basis points — the sequence model behind
    next-action prediction and funnel-drop diagnostics.

    Scale posture: ONE fact scan, ONE shuffle on user_id for the lag
    window, then an aggregate that collapses to (types × types) cells.
    Row totals come from a window over THAT tiny aggregate — never a
    join back that would re-scan the fact table (gated in
    tests/test_plans.py: one parquet scan, ≤3 exchanges). The share
    uses integer DIV so both engines truncate identically (float
    division would make 1/3-style shares engine-rounding-dependent
    in the last bit).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.select("event_type", F.lag("event_type").over(w).alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    w_row = Window.partitionBy("from_type")
    return t.withColumn("row_total", F.sum("transitions").over(w_row)).select(
        "from_type",
        "to_type",
        "transitions",
        F.expr("(transitions * 10000) DIV row_total").alias("share_bp"),
    )


@register(
    "q_dq_referential_integrity",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem_orphan_orderkey' AS check_name,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS violations,
             (SELECT count(*) FROM lineitem) AS total
      UNION ALL
      SELECT 'orders_orphan_custkey',
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM orders)
      UNION ALL
      SELECT 'orders_duplicate_pk',
             (SELECT count(*) FROM
               (SELECT o_orderkey FROM orders
                GROUP BY o_orderkey HAVING count(*) > 1)),
             (SELECT count(*) FROM orders)
      UNION ALL
      SELECT 'customer_null_custkey',
             (SELECT count(*) FROM customer WHERE c_custkey IS NULL),
             (SELECT count(*) FROM customer))
    SELECT check_name, violations::BIGINT AS violations,
           total::BIGINT AS total, (violations = 0)::INT AS ok
    FROM checks
    """,
    category="dq",
)
def q_dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the DQ gate a warehouse runs
    before publishing a snapshot: orphan foreign keys (lineitem →
    orders, orders → customer) via LEFT ANTI joins, primary-key
    duplication, and NOT NULL violation counts, one row per check
    with an ok flag.

    Scale posture: each orphan check is a shuffle (or broadcast,
    AQE's choice) ANTI join — the join that stops at first match and
    never amplifies rows; the PK check is a groupBy count filtered to
    >1. No subquery runs per row; each check is one distributed pass
    and the result is 4 rows regardless of input size.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def row(name: str, violations, total) -> DataFrame:
        return violations.crossJoin(total).select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long"),
            F.col("total").cast("long"),
            (F.col("violations") == 0).cast("int").alias("ok"),
        )

    cnt = F.count(F.lit(1))
    orphan_l = l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(
        cnt.alias("violations")
    )
    orphan_o = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        cnt.alias("violations")
    )
    dup_pk = (
        o.groupBy("o_orderkey")
        .agg(cnt.alias("n"))
        .where(F.col("n") > 1)
        .agg(cnt.alias("violations"))
    )
    null_ck = c.where(F.col("c_custkey").isNull()).agg(cnt.alias("violations"))
    l_total = l.agg(cnt.alias("total"))
    o_total = o.agg(cnt.alias("total"))
    c_total = c.agg(cnt.alias("total"))
    return (
        row("lineitem_orphan_orderkey", orphan_l, l_total)
        .unionAll(row("orders_orphan_custkey", orphan_o, o_total))
        .unionAll(row("orders_duplicate_pk", dup_pk, o_total))
        .unionAll(row("customer_null_custkey", null_ck, c_total))
    )


@register(
    "q_ab_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT count(*) FILTER (event_type = 'click')::BIGINT AS n1,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sx1,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sxx1,
             count(*) FILTER (event_type = 'purchase')::BIGINT AS n2,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sx2,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sxx2
      FROM events
      WHERE event_type IN ('click', 'purchase')),
    m AS (
      SELECT n1, n2,
             sx1::DOUBLE / n1 AS m1,
             sx2::DOUBLE / n2 AS m2,
             (sxx1::DOUBLE - (sx1::DOUBLE * sx1::DOUBLE) / n1) / (n1 - 1) AS v1,
             (sxx2::DOUBLE - (sx2::DOUBLE * sx2::DOUBLE) / n2) / (n2 - 1) AS v2
      FROM s)
    SELECT n1 AS n_click, n2 AS n_purchase,
           round(m1 / 100, 6) AS mean_click,
           round(m2 / 100, 6) AS mean_purchase,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat
    FROM m
    """,
    category="analytics",
)
def q_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic between click and purchase event
    values — the A/B significance arithmetic every experimentation
    pipeline runs, built on EXACT integer aggregates: n, Σcents and
    Σcents² per arm are exact BIGINTs, and the float stage (means,
    unbiased variances, the t ratio) applies the SAME sequence of
    correctly-rounded IEEE ops (/ − * sqrt) to those identical
    integers on both engines, so even unrounded the doubles agree
    bit-for-bit; 6-dp rounds are a belt on top.

    Scale posture: ONE fact scan, one conditional (FILTER-clause)
    aggregate to a single row — no per-arm branch that would re-scan
    the fact table, no join at all (gated: one parquet scan, zero
    joins). At 100 TB the same shape computes per-experiment-arm
    stats with a groupBy(experiment_id) over arm-conditional
    aggregates.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    s = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", cents.alias("c"))
        .agg(
            F.count(F.when(is1, 1)).alias("n1"),
            F.sum(F.when(is1, F.col("c"))).alias("sx1"),
            F.sum(F.when(is1, F.col("c") * F.col("c"))).alias("sxx1"),
            F.count(F.when(is2, 1)).alias("n2"),
            F.sum(F.when(is2, F.col("c"))).alias("sx2"),
            F.sum(F.when(is2, F.col("c") * F.col("c"))).alias("sxx2"),
        )
    )
    m = s.select(
        "n1",
        "n2",
        (F.col("sx1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("sx2").cast("double") / F.col("n2")).alias("m2"),
        (
            (
                F.col("sxx1").cast("double")
                - (F.col("sx1").cast("double") * F.col("sx1").cast("double"))
                / F.col("n1")
            )
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (
                F.col("sxx2").cast("double")
                - (F.col("sx2").cast("double") * F.col("sx2").cast("double"))
                / F.col("n2")
            )
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    return m.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        F.round(F.col("m1") / 100, 6).alias("mean_click"),
        F.round(F.col("m2") / 100, 6).alias("mean_purchase"),
        F.round(
            (F.col("m1") - F.col("m2"))
            / F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")),
            6,
        ).alias("t_stat"),
    )


@register(
    "q_ml_auc",
    oracle="""
    WITH u AS (
      SELECT (n_chars // 100)::BIGINT AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents),
    s AS (
      SELECT score,
             sum(label)::BIGINT AS npos_s,
             (count(*) - sum(label))::BIGINT AS nneg_s
      FROM u GROUP BY score),
    c AS (
      SELECT npos_s, nneg_s,
             coalesce(sum(nneg_s) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS below
      FROM s)
    SELECT sum(npos_s)::BIGINT AS n_pos,
           sum(nneg_s)::BIGINT AS n_neg,
           sum(npos_s * (2 * below + nneg_s))::BIGINT AS u2,
           round(sum(npos_s * (2 * below + nneg_s))::DOUBLE
                 / (2.0 * sum(npos_s) * sum(nneg_s)), 6) AS auc
    FROM c
    """,
    category="ml",
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of 'document length-bucket predicts lang=en' via the
    Mann-Whitney rank-sum identity — the standard offline-eval metric
    for any ranking/propensity score. AUC = P(score+ > score-) +
    ½P(=), computed WITHOUT ranking rows: collapse the corpus to the
    distinct-score histogram (npos, nneg per score), then each score
    level contributes npos·(2·nneg_below + nneg_ties) to the doubled
    U statistic — ties get exactly the midrank ½ credit, and the whole
    statistic stays in BIGINT until ONE final division (bit-identical
    cross-engine; 6-dp round as belt).

    Scale posture: one aggregate to the BOUNDED score histogram
    (length DIV 100 buckets — dozens of values at any SF), and the
    cumulative window runs over that MATERIALIZED value histogram,
    never the document table (the q_agg_median_distributed
    discipline: windows on value tables, not fact tables). No global
    rank of rows anywhere, so there is no single-partition window at
    100 TB; a continuous score would first discretize to fixed-width
    bins exactly like this (the binned-AUC estimator)."""
    d = load_table(spark, sf_dir, "documents").select(
        F.expr("n_chars DIV 100").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    s = d.groupBy("score").agg(
        F.sum("label").cast("long").alias("npos_s"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("nneg_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = s.select(
        "npos_s",
        "nneg_s",
        F.coalesce(F.sum("nneg_s").over(w), F.lit(0)).cast("long").alias("below"),
    )
    u2 = F.sum(F.col("npos_s") * (2 * F.col("below") + F.col("nneg_s")))
    return c.agg(
        F.sum("npos_s").cast("long").alias("n_pos"),
        F.sum("nneg_s").cast("long").alias("n_neg"),
        u2.cast("long").alias("u2"),
        F.round(
            u2.cast("double")
            / (2.0 * F.sum("npos_s") * F.sum("nneg_s")),
            6,
        ).alias("auc"),
    )


@register(
    "q_ab_cuped",
    oracle="""
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5('cuped:' || user_id::VARCHAR), 1, 8))
               ::BIGINT % 2 AS arm,
             coalesce(sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'view'), 0) AS x,
             coalesce(sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase'), 0) AS y
      FROM events GROUP BY user_id),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
             sum(x * x)::DOUBLE AS sxx, sum(y * y)::DOUBLE AS syy,
             sum(x * y)::DOUBLE AS sxy,
             count(*) FILTER (arm = 0)::BIGINT AS n0,
             count(*) FILTER (arm = 1)::BIGINT AS n1,
             coalesce(sum(x) FILTER (arm = 0), 0)::DOUBLE AS sx0,
             coalesce(sum(x) FILTER (arm = 1), 0)::DOUBLE AS sx1,
             coalesce(sum(y) FILTER (arm = 0), 0)::DOUBLE AS sy0,
             coalesce(sum(y) FILTER (arm = 1), 0)::DOUBLE AS sy1
      FROM u),
    t AS (
      SELECT n, n0, n1, sy0, sy1,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
             (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rho2,
             sx0 / n0 AS mx0, sx1 / n1 AS mx1,
             sy0 / n0 AS my0, sy1 / n1 AS my1
      FROM s)
    SELECT n0 AS n_control, n1 AS n_treatment,
           round(my0 / 100, 6) AS mean_y_control,
           round(my1 / 100, 6) AS mean_y_treatment,
           round(theta, 6) AS theta,
           round(((my1 - my0) - theta * (mx1 - mx0)) / 100, 6)
             AS adj_diff,
           round(rho2, 6) AS var_reduction
    FROM t
    """,
    category="analytics",
)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data)
    variance reduction for an A/B readout: per-user covariate x =
    view-value cents, metric y = purchase-value cents, arms split by
    the engine's seeded-md5 hash; theta = cov(x,y)/var(x) from the
    POOLED population, and the adjusted treatment effect is
    (ybar_t - ybar_c) - theta*(xbar_t - xbar_c). var_reduction = rho^2
    is the fraction of metric variance the covariate removes — the
    number an experimentation platform quotes as "days of runtime
    saved". Exactness: every sum (Sx, Sy, Sxx, Syy, Sxy, per-arm
    splits) is an exact integer (cents / cents^2); the float stage
    applies the identical correctly-rounded op sequence on both
    engines, with 6-dp rounds as belt.

    Scale posture: ONE fact scan -> one user_id aggregate -> one
    12-column global fold to a single row. No join, no second scan
    (plan-gated); per-experiment at 100 TB the same shape groups the
    fold by experiment_id."""
    from batchprocessor_spark.operators.sampling import hash_bucket

    cents = F.round(F.col("value") * 100).cast("long")
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    u = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", cents)), F.lit(0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        ).alias("y"),
    )
    u = u.withColumn("arm", hash_bucket(F.col("user_id"), "cuped:", 2))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("x"))), F.lit(0)
        ).cast("double").alias("sx0"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("x"))), F.lit(0)
        ).cast("double").alias("sx1"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("y"))), F.lit(0)
        ).cast("double").alias("sy0"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("y"))), F.lit(0)
        ).cast("double").alias("sy1"),
    )
    n = F.col("n")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    t = s.select(
        "n0",
        "n1",
        "sy0",
        "sy1",
        (cov_n / varx_n).alias("theta"),
        (cov_n * cov_n / (varx_n * vary_n)).alias("rho2"),
        (F.col("sx0") / F.col("n0")).alias("mx0"),
        (F.col("sx1") / F.col("n1")).alias("mx1"),
        (F.col("sy0") / F.col("n0")).alias("my0"),
        (F.col("sy1") / F.col("n1")).alias("my1"),
    )
    return t.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round(F.col("my0") / 100, 6).alias("mean_y_control"),
        F.round(F.col("my1") / 100, 6).alias("mean_y_treatment"),
        F.round(F.col("theta"), 6).alias("theta"),
        F.round(
            ((F.col("my1") - F.col("my0"))
             - F.col("theta") * (F.col("mx1") - F.col("mx0"))) / 100,
            6,
        ).alias("adj_diff"),
        F.round(F.col("rho2"), 6).alias("var_reduction"),
    )


@register(
    "q_events_attribution",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             round(value * 100)::BIGINT AS cents,
             CASE WHEN event_type IN ('view', 'click')
                  THEN event_type END AS touch
      FROM events),
    p AS (
      SELECT cents,
             coalesce(first_value(touch IGNORE NULLS) OVER w, '(direct)')
               AS first_touch,
             coalesce(last_value(touch IGNORE NULLS) OVER w, '(direct)')
               AS last_touch,
             event_type
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    credited AS (
      SELECT m.model,
             CASE m.model WHEN 'first_touch' THEN p.first_touch
                          ELSE p.last_touch END AS channel,
             p.cents
      FROM p CROSS JOIN (VALUES ('first_touch'), ('last_touch')) m(model)
      WHERE p.event_type = 'purchase')
    SELECT model, channel,
           count(*)::BIGINT AS n_purchases,
           sum(cents)::BIGINT AS attributed_cents
    FROM credited GROUP BY model, channel
    """,
    category="analytics",
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch marketing attribution: every
    purchase's revenue (exact cents) is credited to the user's first
    and most recent preceding marketing touch (view/click), '(direct)'
    when none precedes it. The two models come from the SAME window
    pass (first/last IGNORE NULLS over rows strictly before the
    purchase), unpivoted with stack() — the standard channel-ROI
    rollup of a product-analytics warehouse.

    Scale posture: ONE user_id exchange shared by both window
    functions (same partitioning + ordering), then a (model, channel)
    aggregate over a 2x-row stack — never a purchases-to-touches
    self-join (which would be a skewed interval join at 100 TB). Plan
    gate: single parquet scan, no Join operator."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.coalesce(
            F.first(touch, ignorenulls=True).over(w), F.lit("(direct)")
        ).alias("first_touch"),
        F.coalesce(
            F.last(touch, ignorenulls=True).over(w), F.lit("(direct)")
        ).alias("last_touch"),
        "event_type",
    ).where(F.col("event_type") == "purchase")
    credited = p.select(
        F.expr(
            "stack(2, 'first_touch', first_touch, 'last_touch', last_touch)"
        ).alias("model", "channel"),
        "cents",
    )
    return credited.groupBy("model", "channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").cast("long").alias("attributed_cents"),
    )


@register(
    "q_ml_calibration",
    oracle="""
    WITH train AS (
      SELECT n_chars // 100 AS bucket,
             ((10000 * count(*) FILTER (lang = 'en')) // count(*))::BIGINT
               AS pred_bp
      FROM documents WHERE doc_id % 2 = 0 GROUP BY bucket),
    prior AS (
      SELECT ((10000 * count(*) FILTER (lang = 'en')) // count(*))::BIGINT
               AS prior_bp
      FROM documents WHERE doc_id % 2 = 0),
    test AS (
      SELECT least(coalesce(t.pred_bp, p.prior_bp) // 2000, 4) AS bin,
             coalesce(t.pred_bp, p.prior_bp) AS pred_bp,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents d
      LEFT JOIN train t ON d.n_chars // 100 = t.bucket
      CROSS JOIN prior p
      WHERE d.doc_id % 2 = 1),
    bins AS (
      SELECT bin, count(*)::BIGINT AS n,
             (sum(pred_bp) // count(*))::BIGINT AS avg_pred_bp,
             ((10000 * sum(is_en)) // count(*))::BIGINT AS obs_bp
      FROM test GROUP BY bin)
    SELECT bin, n, avg_pred_bp, obs_bp,
           (avg_pred_bp - obs_bp)::BIGINT AS gap_bp,
           ((sum(n * abs(avg_pred_bp - obs_bp)) OVER ())
              // (sum(n) OVER ()))::BIGINT AS ece_bp
    FROM bins
    """,
    category="ml",
)
def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit (reliability diagram + expected calibration
    error) of the histogram classifier 'length bucket → P(lang=en)':
    train the per-bucket rate on even doc_ids, score odd doc_ids
    (unseen buckets fall back to the train prior), group predictions
    into 5 probability bins, and compare mean predicted vs observed
    rate per bin. ECE = Σ n_b·|gap_b| / N — the number a model card
    quotes. Every quantity is integer basis points via DIV on
    non-negative operands (probabilities, counts), so no float ever
    forms and the cross-engine hash cannot drift.

    Scale posture: the trained model IS an aggregate (bucket table,
    dozens of rows) broadcast onto the test scan; the prior is a
    1-row broadcast; bins aggregate to ≤5 rows and the ECE window
    runs over that value table. Train/test never co-shuffle — the
    same even/odd split discipline as q_ml_naive_bayes and
    q_dq_drift_psi."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr("n_chars DIV 100").alias("bucket")
    )
    is_en = F.when(F.col("lang") == "en", 1).otherwise(0)
    train = (
        d.where(F.col("doc_id") % 2 == 0)
        .groupBy("bucket")
        .agg(
            F.expr("(10000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))"
                   " DIV count(1)").cast("long").alias("pred_bp")
        )
    )
    prior = (
        d.where(F.col("doc_id") % 2 == 0)
        .agg(
            F.expr("(10000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))"
                   " DIV count(1)").cast("long").alias("prior_bp")
        )
    )
    test = (
        d.where(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(train), "bucket", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.coalesce(F.col("pred_bp"), F.col("prior_bp")).alias("pred_bp"),
            is_en.alias("is_en"),
        )
        .withColumn(
            "bin", F.least(F.expr("pred_bp DIV 2000"), F.lit(4)).cast("long")
        )
    )
    bins = test.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(pred_bp) DIV count(1)").cast("long").alias("avg_pred_bp"),
        F.expr("(10000 * sum(is_en)) DIV count(1)").cast("long").alias("obs_bp"),
    )
    w = Window.partitionBy()
    gap = F.col("avg_pred_bp") - F.col("obs_bp")
    return bins.select(
        "bin",
        "n",
        "avg_pred_bp",
        "obs_bp",
        gap.cast("long").alias("gap_bp"),
        F.sum(F.col("n") * F.abs(gap)).over(w).alias("_num"),
        F.sum("n").over(w).alias("_den"),
    ).select(
        "bin",
        "n",
        "avg_pred_bp",
        "obs_bp",
        "gap_bp",
        F.expr("_num DIV _den").cast("long").alias("ece_bp"),
    )


# q_ml_linreg_normal_eq: the 3x3 Cramer's-rule solve is written ONCE
# as SQL text and interpolated into BOTH the Spark selectExpr and the
# DuckDB oracle, so the two engines execute the identical
# correctly-rounded double op sequence over identical exact moments.
_LR_DETA = (
    "(n * (s_x11 * s_x22 - s_x12 * s_x12)"
    " - s_x1 * (s_x1 * s_x22 - s_x12 * s_x2)"
    " + s_x2 * (s_x1 * s_x12 - s_x11 * s_x2))"
)
_LR_DET0 = (
    "(s_y * (s_x11 * s_x22 - s_x12 * s_x12)"
    " - s_x1 * (s_x1y * s_x22 - s_x12 * s_x2y)"
    " + s_x2 * (s_x1y * s_x12 - s_x11 * s_x2y))"
)
_LR_DET1 = (
    "(n * (s_x1y * s_x22 - s_x12 * s_x2y)"
    " - s_y * (s_x1 * s_x22 - s_x12 * s_x2)"
    " + s_x2 * (s_x1 * s_x2y - s_x1y * s_x2))"
)
_LR_DET2 = (
    "(n * (s_x11 * s_x2y - s_x1y * s_x12)"
    " - s_x1 * (s_x1 * s_x2y - s_x1y * s_x2)"
    " + s_y * (s_x1 * s_x12 - s_x11 * s_x2))"
)
_LR_SSE = (
    f"(s_yy - ({_LR_DET0} / {_LR_DETA}) * s_y"
    f" - ({_LR_DET1} / {_LR_DETA}) * s_x1y"
    f" - ({_LR_DET2} / {_LR_DETA}) * s_x2y)"
)
_LR_SST = "(s_yy - s_y * s_y / n)"
_LR_OUT = f"""
    SELECT n,
           round({_LR_DET0} / {_LR_DETA}, 6) AS beta0_cents,
           round({_LR_DET1} / {_LR_DETA}, 6) AS beta1_cents_per_qty,
           round({_LR_DET2} / {_LR_DETA}, 6) AS beta2_cents_per_bp,
           round(1 - {_LR_SSE} / {_LR_SST}, 6) AS r2
    FROM s
"""


@register(
    "q_ml_linreg_normal_eq",
    oracle=f"""
    WITH u AS (
      SELECT round(l_quantity)::BIGINT AS x1,
             round(l_discount * 10000)::BIGINT AS x2,
             round(l_extendedprice * 100)::BIGINT AS y
      FROM lineitem),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(x1)::DOUBLE AS s_x1, sum(x2)::DOUBLE AS s_x2,
             sum(y)::DOUBLE AS s_y,
             sum(x1 * x1)::DOUBLE AS s_x11, sum(x2 * x2)::DOUBLE AS s_x22,
             sum(x1 * x2)::DOUBLE AS s_x12,
             sum(x1 * y)::DOUBLE AS s_x1y, sum(x2 * y)::DOUBLE AS s_x2y,
             sum(y * y)::DOUBLE AS s_yy
      FROM u)
    {_LR_OUT}
    """,
    category="ml",
)
def q_ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression (price ~ quantity +
    discount) by the normal equations — the distributed-ML kernel
    behind every "fit a linear model in one pass" primitive
    (Spark MLlib's WeightedLeastSquares does exactly this): ONE
    scan folds the 10 moment sums (all exact integers in decimal(38)
    / HUGEINT), the driver-side 3x3 solve is Cramer's rule written
    as a SINGLE SQL expression shared VERBATIM with the oracle, so
    both engines run the identical correctly-rounded double sequence
    (6-dp rounds as belt). Emits betas (cents, cents/qty-unit,
    cents/discount-bp) and R².

    Scale posture: the model never sees the data twice — one
    partial+final aggregate to a 10-column row, then pure scalar
    math. At 100 TB with k features the same shape folds k(k+3)/2
    sums; the solve stays O(k^3) driver-side scalar work. No join,
    no collect of anything row-sized (plan-gated)."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = l.select(
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).cast("double").alias("s_x1"),
        F.sum(dec(F.col("x2"))).cast("double").alias("s_x2"),
        F.sum(dec(F.col("y"))).cast("double").alias("s_y"),
        F.sum(dec(F.col("x1") * F.col("x1"))).cast("double").alias("s_x11"),
        F.sum(dec(F.col("x2") * F.col("x2"))).cast("double").alias("s_x22"),
        F.sum(dec(F.col("x1") * F.col("x2"))).cast("double").alias("s_x12"),
        F.sum(dec(F.col("x1") * F.col("y"))).cast("double").alias("s_x1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).cast("double").alias("s_x2y"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("s_yy"),
    )
    return s.selectExpr(
        "n",
        f"round({_LR_DET0} / {_LR_DETA}, 6) AS beta0_cents",
        f"round({_LR_DET1} / {_LR_DETA}, 6) AS beta1_cents_per_qty",
        f"round({_LR_DET2} / {_LR_DETA}, 6) AS beta2_cents_per_bp",
        f"round(1 - {_LR_SSE} / {_LR_SST}, 6) AS r2",
    )


# q_dq_mahalanobis: the quadratic-form expression is one SQL text
# shared verbatim by builder and oracle (the q_ml_linreg_normal_eq
# discipline) — identical correctly-rounded double sequence over
# identical exact moments on both engines.
_MAH_CXX = "(s_xx / n - (s_x / n) * (s_x / n))"
_MAH_CYY = "(s_yy / n - (s_y / n) * (s_y / n))"
_MAH_CXY = "(s_xy / n - (s_x / n) * (s_y / n))"
_MAH_D2 = (
    f"(({_MAH_CYY} * (x - s_x / n) * (x - s_x / n)"
    f" - 2 * {_MAH_CXY} * (x - s_x / n) * (y - s_y / n)"
    f" + {_MAH_CXX} * (y - s_y / n) * (y - s_y / n))"
    f" / ({_MAH_CXX} * {_MAH_CYY} - {_MAH_CXY} * {_MAH_CXY}))"
)


@register(
    "q_dq_mahalanobis",
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag AS grp,
             round(l_quantity)::BIGINT AS x,
             round(l_extendedprice * 100)::BIGINT AS y
      FROM lineitem),
    m AS (
      SELECT grp, count(*)::BIGINT AS n,
             sum(x)::DOUBLE AS s_x, sum(y)::DOUBLE AS s_y,
             sum(x * x)::DOUBLE AS s_xx, sum(y * y)::DOUBLE AS s_yy,
             sum(x * y)::DOUBLE AS s_xy
      FROM u GROUP BY grp),
    d AS (
      SELECT u.grp, {_MAH_D2} AS d2
      FROM u JOIN m ON u.grp = m.grp)
    SELECT grp,
           count(*)::BIGINT AS n,
           sum(CASE WHEN d2 > 13.816 THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers,
           round(max(d2), 6) AS max_d2
    FROM d GROUP BY grp
    """,
    category="dq",
)
def q_dq_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate (Mahalanobis-distance) outlier audit per group —
    the DQ check that catches rows whose quantity/price COMBINATION
    is anomalous even when each marginal is in-range (a univariate
    IQR/z-score fence, q_anomaly_iqr / q_ts_zscore_anomaly, cannot):
    d² = Δᵀ Σ⁻¹ Δ against the χ²(2, 0.999) = 13.816 fence. The 2x2
    covariance inverse is closed-form from exact integer moments; the
    per-row quadratic form is ONE SQL expression shared verbatim with
    the oracle, so the fence comparison and max cannot drift
    cross-engine (no sum of floats is ever taken — only comparisons
    and max, both order-independent).

    Scale posture: per-group moments are one aggregate (3 groups)
    BROADCAST back onto a second fact scan — the two-pass
    moment-then-score shape every streaming-incompatible robust
    statistic uses; rows never shuffle (gated: 1 BroadcastHashJoin,
    no group window over the fact table)."""
    u = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("s_x"),
        F.sum(dec(F.col("y"))).cast("double").alias("s_y"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("s_xx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("s_yy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("s_xy"),
    )
    d = u.join(F.broadcast(m), "grp").selectExpr("grp", f"{_MAH_D2} AS d2")
    return d.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("d2") > 13.816, 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        F.round(F.max("d2"), 6).alias("max_d2"),
    )


@register(
    "q_ml_kfold_cv",
    oracle="""
    WITH d AS (
      SELECT n_chars // 100 AS bucket,
             ('0x' || substring(md5('cv:' || doc_id::VARCHAR), 1, 8))
               ::BIGINT % 5 AS fold,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents),
    cells AS (
      SELECT bucket, fold, count(*)::BIGINT AS n,
             sum(is_en)::BIGINT AS n_en
      FROM d GROUP BY bucket, fold),
    loo AS (
      SELECT bucket, fold, n, n_en,
             sum(n) OVER (PARTITION BY bucket) - n AS train_n,
             sum(n_en) OVER (PARTITION BY bucket) - n_en AS train_en
      FROM cells),
    scored AS (
      SELECT fold, n, n_en,
             CASE WHEN 2 * train_en > train_n THEN 1 ELSE 0 END AS pred_en
      FROM loo),
    pf AS (
      SELECT fold, sum(n)::BIGINT AS n_test,
             sum(CASE WHEN pred_en = 1 THEN n_en ELSE n - n_en END)
               ::BIGINT AS n_correct
      FROM scored GROUP BY fold)
    SELECT fold, n_test,
           ((10000 * n_correct) // n_test)::BIGINT AS acc_bp,
           (sum((10000 * n_correct) // n_test) OVER () // 5)::BIGINT
             AS mean_acc_bp
    FROM pf
    """,
    category="ml",
)
def q_ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the length-bucket majority
    classifier WITHOUT 5 training passes — the leave-one-fold-out
    sufficient-statistics trick: one aggregate builds per
    (bucket, fold) counts, and fold f's training statistics are the
    bucket totals MINUS fold f's own cell (a window over the tiny
    cell table), so all 5 train/test splits evaluate from a single
    scan. This is how CV must be run at 100 TB for any
    sufficient-statistic model (counts, moments, NB likelihoods —
    q_ml_naive_bayes's stats fold the same way); per-fold accuracy
    and the CV mean are exact integer basis points via DIV.

    Scale posture: one fact scan, one (bucket, fold) aggregate
    (≤ buckets x 5 rows), windows only over that value table, ≤5-row
    output. No join at all (plan-gated)."""
    from batchprocessor_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select(
        F.expr("n_chars DIV 100").alias("bucket"),
        hash_bucket(F.col("doc_id"), "cv:", 5).alias("fold"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    cells = d.groupBy("bucket", "fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_en").cast("long").alias("n_en"),
    )
    wb = Window.partitionBy("bucket")
    loo = cells.select(
        "fold",
        "n",
        "n_en",
        (F.sum("n").over(wb) - F.col("n")).alias("train_n"),
        (F.sum("n_en").over(wb) - F.col("n_en")).alias("train_en"),
    )
    scored = loo.select(
        "fold",
        "n",
        "n_en",
        F.when(2 * F.col("train_en") > F.col("train_n"), 1)
        .otherwise(0)
        .alias("pred_en"),
    )
    pf = scored.groupBy("fold").agg(
        F.sum("n").cast("long").alias("n_test"),
        F.sum(
            F.when(F.col("pred_en") == 1, F.col("n_en")).otherwise(
                F.col("n") - F.col("n_en")
            )
        )
        .cast("long")
        .alias("n_correct"),
    )
    wall = Window.partitionBy()
    acc = F.expr("(10000 * n_correct) DIV n_test")
    return pf.select(
        "fold",
        "n_test",
        acc.cast("long").alias("acc_bp"),
        F.sum(acc).over(wall).alias("_pre"),
    ).selectExpr("fold", "n_test", "acc_bp", "CAST(_pre DIV 5 AS BIGINT) AS mean_acc_bp")


@register(
    "q_events_rfm_segmentation",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, round(value * 100)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase'),
    gmax AS (SELECT max(epoch_us(ts))::BIGINT AS gus FROM p),
    u AS (
      SELECT user_id,
             ((SELECT gus FROM gmax) - max(epoch_us(ts))::BIGINT)
               // 86400000000 AS r_days,
             count(*)::BIGINT AS freq,
             (sum(cents) // 100)::BIGINT AS dollars
      FROM p GROUP BY user_id),
    hr AS (
      SELECT r_days AS v, count(*) AS c,
             sum(count(*)) OVER (ORDER BY r_days) AS cum,
             sum(count(*)) OVER () AS total
      FROM u GROUP BY r_days),
    tr AS (
      SELECT min(CASE WHEN cum >= (total + 2) // 3 THEN v END) AS t1,
             min(CASE WHEN cum >= (2 * total + 2) // 3 THEN v END) AS t2
      FROM hr),
    hf AS (
      SELECT freq AS v, count(*) AS c,
             sum(count(*)) OVER (ORDER BY freq) AS cum,
             sum(count(*)) OVER () AS total
      FROM u GROUP BY freq),
    tf AS (
      SELECT min(CASE WHEN cum >= (total + 2) // 3 THEN v END) AS t1,
             min(CASE WHEN cum >= (2 * total + 2) // 3 THEN v END) AS t2
      FROM hf),
    hm AS (
      SELECT dollars AS v, count(*) AS c,
             sum(count(*)) OVER (ORDER BY dollars) AS cum,
             sum(count(*)) OVER () AS total
      FROM u GROUP BY dollars),
    tm AS (
      SELECT min(CASE WHEN cum >= (total + 2) // 3 THEN v END) AS t1,
             min(CASE WHEN cum >= (2 * total + 2) // 3 THEN v END) AS t2
      FROM hm),
    scored AS (
      SELECT (3 - ((u.r_days > tr.t1)::INT + (u.r_days > tr.t2)::INT))
               || '' AS r_s,
             (1 + (u.freq > tf.t1)::INT + (u.freq > tf.t2)::INT) || '' AS f_s,
             (1 + (u.dollars > tm.t1)::INT + (u.dollars > tm.t2)::INT)
               || '' AS m_s,
             u.dollars
      FROM u, tr, tf, tm)
    SELECT r_s || f_s || m_s AS segment,
           count(*)::BIGINT AS n_users,
           sum(dollars)::BIGINT AS dollars_sum
    FROM scored GROUP BY segment
    """,
    category="analytics",
)
def q_events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM rollup: per purchaser, days since last purchase,
    purchase count, and dollar total; each metric scored 1-3 against
    EXACT tercile thresholds (3 = best; recency inverted), users
    grouped into the 27 'RFM cells'. Thresholds come from the
    metric's VALUE HISTOGRAM (bounded: days, counts, whole dollars) —
    cum counts over the tiny histogram table pick min(v) with
    cum >= ceil(N/3) — never a global ntile over users, which would
    be the single-partition window this formulation exists to avoid
    (the q_agg_median_distributed discipline applied three times).
    All arithmetic integer (floor day division on non-negative
    micros, cents DIV 100 dollars), so scores cannot drift.

    Scale posture: the purchaser table is materialize-
    materialized ONCE (one fact scan), the three histograms and the
    scoring pass all read that materialization (plan-gated: zero
    parquet scans in the final plan), and the three threshold rows
    broadcast."""
    p = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    us = F.expr("unix_micros(cast(ts as timestamp))")
    per_user = p.groupBy("user_id").agg(
        F.max(us).alias("umax"),
        F.count(F.lit(1)).alias("freq"),
        F.expr(
            "sum(cast(round(value * 100) as bigint)) DIV 100"
        ).alias("dollars"),
    )
    gmax = p.agg(F.max(us).alias("gus"))
    u = (
        per_user.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.expr("(gus - umax) DIV 86400000000").alias("r_days"),
            "freq",
            "dollars",
        )
        .transform(materialize)  # one fact scan feeds all branches
    )

    def terciles(col: str) -> DataFrame:
        wcum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wall = Window.partitionBy()
        h = (
            u.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                F.col(col).alias("v"),
                F.sum("c").over(wcum).alias("cum"),
                F.sum("c").over(wall).alias("total"),
            )
        )
        return h.agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(total + 2) DIV 3"), F.col("v"))
            ).alias("t1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(2 * total + 2) DIV 3"), F.col("v")
                )
            ).alias("t2"),
        )

    tr = terciles("r_days").select(
        F.col("t1").alias("r_t1"), F.col("t2").alias("r_t2")
    )
    tf = terciles("freq").select(
        F.col("t1").alias("f_t1"), F.col("t2").alias("f_t2")
    )
    tm = terciles("dollars").select(
        F.col("t1").alias("m_t1"), F.col("t2").alias("m_t2")
    )
    scored = (
        u.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tf))
        .crossJoin(F.broadcast(tm))
        .select(
            F.concat(
                (
                    3
                    - (
                        (F.col("r_days") > F.col("r_t1")).cast("int")
                        + (F.col("r_days") > F.col("r_t2")).cast("int")
                    )
                ).cast("string"),
                (
                    1
                    + (F.col("freq") > F.col("f_t1")).cast("int")
                    + (F.col("freq") > F.col("f_t2")).cast("int")
                ).cast("string"),
                (
                    1
                    + (F.col("dollars") > F.col("m_t1")).cast("int")
                    + (F.col("dollars") > F.col("m_t2")).cast("int")
                ).cast("string"),
            ).alias("segment"),
            "dollars",
        )
    )
    return scored.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("dollars").cast("long").alias("dollars_sum"),
    )


@register(
    "q_events_path_analysis",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
    counted AS (
      SELECT path, count(*)::BIGINT AS cnt FROM paths GROUP BY path),
    ranked AS (
      SELECT path, cnt,
             row_number() OVER (ORDER BY cnt DESC, path) AS rnk
      FROM counted)
    SELECT path, cnt, rnk FROM ranked WHERE rnk <= 10
    """,
    category="analytics",
)
def q_events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-travelled 3-step behavior paths (the Sankey/flow
    diagram feed every product-analytics tool renders): consecutive
    event triples per user via two lead() calls over ONE user_id
    window, path strings counted, top-k taken. Extends
    q_events_markov_transitions (1-step matrix) to path grain.

    Scale posture: one user_id exchange shared by both leads, a
    (path)-keyed aggregate with map-side combine (path cardinality ≤
    |event_types|^3 = 125 — bounded state), and the top-10 is
    TakeOrderedAndProject over that bounded table, never a global
    sort (plan-gated). Deterministic tie-break on the path string."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counted = (
        o.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counted.orderBy(F.col("cnt").desc(), F.col("path")).limit(10)
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("path"))
    return top.select("path", "cnt", F.row_number().over(w_rank).alias("rnk"))


# q_ab_delta_method: ratio-metric inference formulas shared verbatim
# between builder and oracle (the q_ml_linreg_normal_eq discipline).
# Per arm a: R = Sy/Sx (cents per view), and the delta-method
# variance of the ratio-of-means over n users:
#   var(R) = (vy - 2 R cxy + R^2 vx) / (n * mx^2)
# with mx = Sx/n, vy/vx/cxy the (biased) per-user moments.
def _dm_expr(a: str) -> dict[str, str]:
    r = f"(s_y{a} / s_x{a})"
    mx = f"(s_x{a} / n{a})"
    vx = f"(s_xx{a} / n{a} - {mx} * {mx})"
    vy = f"(s_yy{a} / n{a} - (s_y{a} / n{a}) * (s_y{a} / n{a}))"
    cxy = f"(s_xy{a} / n{a} - {mx} * (s_y{a} / n{a}))"
    var = f"(({vy} - 2 * {r} * {cxy} + {r} * {r} * {vx}) / (n{a} * {mx} * {mx}))"
    return {"r": r, "var": var}


_DM0 = _dm_expr("0")
_DM1 = _dm_expr("1")
_DM_OUT = f"""
    SELECT n0, n1,
           round({_DM0['r']}, 6) AS ratio_control,
           round({_DM1['r']}, 6) AS ratio_treatment,
           round({_DM1['r']} - {_DM0['r']}, 6) AS ratio_diff,
           round(({_DM1['r']} - {_DM0['r']})
                 / sqrt({_DM0['var']} + {_DM1['var']}), 6) AS z_stat
    FROM s
"""


@register(
    "q_ab_delta_method",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             ('0x' || substring(md5('cuped:' || user_id::VARCHAR), 1, 8))
               ::BIGINT % 2 AS arm,
             count(*) FILTER (event_type = 'view')::BIGINT AS x,
             coalesce(sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase'), 0) AS y
      FROM events GROUP BY user_id),
    s AS (
      SELECT count(*) FILTER (arm = 0)::BIGINT AS n0,
             count(*) FILTER (arm = 1)::BIGINT AS n1,
             sum(x) FILTER (arm = 0)::DOUBLE AS s_x0,
             sum(x) FILTER (arm = 1)::DOUBLE AS s_x1,
             sum(y) FILTER (arm = 0)::DOUBLE AS s_y0,
             sum(y) FILTER (arm = 1)::DOUBLE AS s_y1,
             sum(x * x) FILTER (arm = 0)::DOUBLE AS s_xx0,
             sum(x * x) FILTER (arm = 1)::DOUBLE AS s_xx1,
             sum(y * y) FILTER (arm = 0)::DOUBLE AS s_yy0,
             sum(y * y) FILTER (arm = 1)::DOUBLE AS s_yy1,
             sum(x * y) FILTER (arm = 0)::DOUBLE AS s_xy0,
             sum(x * y) FILTER (arm = 1)::DOUBLE AS s_xy1
      FROM u)
    {_DM_OUT}
    """,
    category="analytics",
)
def q_ab_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for a RATIO metric (revenue per view) —
    the experimentation-platform arithmetic naive per-user t-tests
    get WRONG for ratio-of-means metrics (the denominator is random
    too): per arm, R = ΣY/ΣX and var(R) = (vy − 2R·cxy + R²·vx) /
    (n·x̄²), the first-order Taylor expansion; z = ΔR / √(var₀+var₁).
    Complements q_ab_welch_ttest (per-user mean metric) and
    q_ab_cuped (variance reduction). Every sum is an exact integer
    (views, cents, their squares/products); the float stage is ONE
    formula text shared verbatim with the oracle; 6-dp belts.

    Scale posture: one fact scan → one user fold → one 12-column
    conditional global fold to a single row; no join, no second scan
    (plan-gated). Same arm split as q_ab_cuped so the two readouts
    describe the same experiment."""
    from batchprocessor_spark.operators.sampling import hash_bucket

    cents = F.round(F.col("value") * 100).cast("long")
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    u = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        ).alias("y"),
    )
    u = u.withColumn("arm", hash_bucket(F.col("user_id"), "cuped:", 2))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def arm_aggs(a: int):
        cond = F.col("arm") == a
        return [
            F.count(F.when(cond, 1)).alias(f"n{a}"),
            F.sum(F.when(cond, dec(F.col("x")))).cast("double").alias(f"s_x{a}"),
            F.sum(F.when(cond, dec(F.col("y")))).cast("double").alias(f"s_y{a}"),
            F.sum(F.when(cond, dec(F.col("x") * F.col("x"))))
            .cast("double")
            .alias(f"s_xx{a}"),
            F.sum(F.when(cond, dec(F.col("y") * F.col("y"))))
            .cast("double")
            .alias(f"s_yy{a}"),
            F.sum(F.when(cond, dec(F.col("x") * F.col("y"))))
            .cast("double")
            .alias(f"s_xy{a}"),
        ]

    s = u.agg(*(arm_aggs(0) + arm_aggs(1)))
    return s.selectExpr(
        "n0",
        "n1",
        f"round({_DM0['r']}, 6) AS ratio_control",
        f"round({_DM1['r']}, 6) AS ratio_treatment",
        f"round({_DM1['r']} - {_DM0['r']}, 6) AS ratio_diff",
        f"round(({_DM1['r']} - {_DM0['r']})"
        f" / sqrt({_DM0['var']} + {_DM1['var']}), 6) AS z_stat",
    )


@register(
    "q_events_stickiness",
    oracle="""
    WITH t AS (
      SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
             strftime(ts, '%Y-%m-%d') AS day,
             user_id
      FROM events)
    SELECT month,
           count(*)::BIGINT AS dau_sum,
           count(DISTINCT day)::BIGINT AS n_days,
           count(DISTINCT user_id)::BIGINT AS mau,
           ((10000 * count(*))
              // (count(DISTINCT day) * count(DISTINCT user_id)))::BIGINT
             AS stickiness_bp
    FROM t GROUP BY month
    """,
    category="analytics",
)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement ratio every
    product dashboard headlines: mean daily-active over monthly-active
    users, exactly avg(DAU)/MAU = Σ_d DAU_d / (n_days · MAU) in
    integer basis points. The trick that makes it ONE pass: after
    deduplicating (month, day, user) triples, count(*) per month IS
    Σ_d DAU_d (each row is one user-day), count(DISTINCT day) is the
    day denominator and count(DISTINCT user) is MAU — no per-day
    subaggregate, no self-join of two granularities.

    Scale posture: one scan → one distinct on the (month, day, user)
    triple (the only big shuffle; cardinality ≤ users x days, far
    below raw events) → one multi-distinct month aggregate (Catalyst
    expand). Integer DIV on non-negative operands keeps the ratio
    hash-exact."""
    t = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .distinct()
    )
    return t.groupBy("month").agg(
        F.count(F.lit(1)).alias("dau_sum"),
        F.count_distinct("day").alias("n_days"),
        F.count_distinct("user_id").alias("mau"),
        F.expr(
            "(10000 * count(1)) DIV (count(DISTINCT day)"
            " * count(DISTINCT user_id))"
        )
        .cast("long")
        .alias("stickiness_bp"),
    )


def _boost_oracle() -> str:
    """Two unrolled boosting rounds: stump search over the cumulative
    weighted histogram, then x3 reweighting of misclassified cells."""

    def search(cells: str, rnd: int) -> str:
        return f"""
    cum{rnd} AS (
      SELECT bucket,
             sum(w1) OVER (ORDER BY bucket) AS c1,
             sum(w0) OVER (ORDER BY bucket) AS c0,
             sum(w1) OVER () AS t1,
             sum(w0) OVER () AS t0
      FROM {cells}),
    cand{rnd} AS (
      SELECT bucket AS thr, 'le' AS pol, (c0 + (t1 - c1))::BIGINT AS werr,
             (t0 + t1)::BIGINT AS wtot
      FROM cum{rnd}
      UNION ALL
      SELECT bucket, 'gt', (c1 + (t0 - c0))::BIGINT, (t0 + t1)::BIGINT
      FROM cum{rnd}),
    best{rnd} AS (
      SELECT thr, pol, werr, wtot FROM cand{rnd}
      ORDER BY werr, thr, pol LIMIT 1)"""

    return f"""
    WITH cells AS (
      SELECT n_chars // 100 AS bucket,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS w1,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS w0
      FROM documents GROUP BY bucket),
    {search('cells', 1)},
    cells2 AS (
      SELECT c.bucket,
             c.w1 * (CASE WHEN (CASE WHEN b.pol = 'le'
                                     THEN c.bucket <= b.thr
                                     ELSE c.bucket > b.thr END)
                          THEN 1 ELSE 3 END) AS w1,
             c.w0 * (CASE WHEN (CASE WHEN b.pol = 'le'
                                     THEN c.bucket <= b.thr
                                     ELSE c.bucket > b.thr END)
                          THEN 3 ELSE 1 END) AS w0
      FROM cells c CROSS JOIN best1 b),
    {search('cells2', 2)}
    SELECT 1::BIGINT AS round, thr::BIGINT AS thr, pol, werr, wtot,
           ((10000 * werr) // wtot)::BIGINT AS werr_bp
    FROM best1
    UNION ALL
    SELECT 2::BIGINT, thr::BIGINT, pol, werr, wtot,
           ((10000 * werr) // wtot)::BIGINT
    FROM best2
    """


@register("q_ml_boosted_stumps", oracle=_boost_oracle(), category="ml")
def q_ml_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two boosting rounds of decision stumps (the AdaBoost kernel,
    integer-weight variant) on 'length bucket predicts lang=en':
    round 1 searches every (threshold, polarity) stump over the
    cumulative weighted class histogram; round 2 TRIPLES the weight
    of misclassified mass and searches again — forcing the second
    stump to attend to what the first got wrong. The key scale
    observation: because the stump's prediction depends only on the
    bucket, reweighting is a per-CELL multiply on the histogram — no
    row ever gets re-read or re-scored between rounds (the same
    sufficient-statistic discipline as q_ml_kfold_cv). Integer
    weights (x3, not the float exp(alpha) — the classic discrete
    variant) keep every error count and the werr_bp ratio hash-exact.

    Scale posture: one scan builds the (bucket, class) histogram;
    each round is a window + argmin over that bounded table; the
    round-1 decision reaches round 2 as a 1-row broadcast. Search
    cost is O(buckets), never O(rows x thresholds) — the same
    histogram kernel as q_ml_decision_stump, iterated."""
    cells = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.expr("n_chars DIV 100").alias("bucket"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_en").cast("long").alias("w1"),
            F.sum(1 - F.col("is_en")).cast("long").alias("w0"),
        )
    )

    def search(c: DataFrame):
        wc = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wall = Window.partitionBy()
        cum = c.select(
            "bucket",
            F.sum("w1").over(wc).alias("c1"),
            F.sum("w0").over(wc).alias("c0"),
            F.sum("w1").over(wall).alias("t1"),
            F.sum("w0").over(wall).alias("t0"),
        )
        le = cum.select(
            F.col("bucket").alias("thr"),
            F.lit("le").alias("pol"),
            (F.col("c0") + (F.col("t1") - F.col("c1"))).cast("long").alias("werr"),
            (F.col("t0") + F.col("t1")).cast("long").alias("wtot"),
        )
        gt = cum.select(
            F.col("bucket").alias("thr"),
            F.lit("gt").alias("pol"),
            (F.col("c1") + (F.col("t0") - F.col("c0"))).cast("long").alias("werr"),
            (F.col("t0") + F.col("t1")).cast("long").alias("wtot"),
        )
        return (
            le.unionAll(gt)
            .orderBy("werr", "thr", "pol")
            .limit(1)
            .collect()[0]  # model-sized: ONE stump decision per round
        )

    b1 = search(cells)
    pred_en = (
        (F.col("bucket") <= F.lit(b1["thr"]))
        if b1["pol"] == "le"
        else (F.col("bucket") > F.lit(b1["thr"]))
    )
    cells2 = cells.select(
        "bucket",
        (F.col("w1") * F.when(pred_en, 1).otherwise(3)).alias("w1"),
        (F.col("w0") * F.when(pred_en, 3).otherwise(1)).alias("w0"),
    )
    b2 = search(cells2)
    rows = [
        (r, int(b["thr"]), b["pol"], int(b["werr"]), int(b["wtot"]),
         (10000 * int(b["werr"])) // int(b["wtot"]))
        for r, b in ((1, b1), (2, b2))
    ]
    return spark.createDataFrame(
        rows,
        "round BIGINT, thr BIGINT, pol STRING, werr BIGINT, wtot BIGINT, "
        "werr_bp BIGINT",
    )


@register(
    "q_ts_control_chart",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS x
      FROM events WHERE event_type = 'purchase' GROUP BY day),
    mr AS (
      SELECT day, x,
             abs(x - lag(x) OVER (ORDER BY day)) AS m
      FROM daily),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(x)::HUGEINT AS sx,
             sum(m)::HUGEINT AS smr
      FROM mr),
    flags AS (
      SELECT mr.x, s.n, s.sx, s.smr,
             (100::HUGEINT * s.n * (s.n - 1) * mr.x
                > 100::HUGEINT * (s.n - 1) * s.sx
                  + 266::HUGEINT * s.n * s.smr) AS hi,
             (100::HUGEINT * s.n * (s.n - 1) * mr.x
                < 100::HUGEINT * (s.n - 1) * s.sx
                  - 266::HUGEINT * s.n * s.smr) AS lo
      FROM mr, s)
    SELECT max(n)::BIGINT AS n_days,
           max(sx)::BIGINT AS sum_x,
           max(smr)::BIGINT AS sum_mr,
           sum(CASE WHEN hi THEN 1 ELSE 0 END)::BIGINT AS n_above_ucl,
           sum(CASE WHEN lo THEN 1 ELSE 0 END)::BIGINT AS n_below_lcl
    FROM flags
    """,
    category="timeseries",
)
def q_ts_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals / moving-range) control chart over daily
    purchase revenue — the SPC monitor a pipeline puts on any daily
    metric: center line x-bar, control limits x-bar ± 2.66·mR-bar
    (the Shewhart constant for n=2 moving ranges), days outside the
    limits flagged. The exactness move: the limit comparison
    x > Sx/n + 2.66·SmR/(n−1) CROSS-MULTIPLIES to
    100·n·(n−1)·x > 100·(n−1)·Sx + 266·n·SmR — every term an exact
    integer (decimal(38)/HUGEINT), so the violation flags can never
    disagree at the boundary the way a float limit would.

    Scale posture: one fact scan → daily aggregate (value-table
    sized); the lag window and the flag pass run over that daily
    table; the 3-term stats row broadcasts back as a 1-row cross
    join. Same moment-then-score shape as q_dq_mahalanobis, one
    level up (day grain)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    w = Window.orderBy("day")
    mr = daily.select(
        "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("m")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = mr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("m"))).alias("smr"),
    )
    flags = mr.crossJoin(F.broadcast(s)).select(
        "n",
        "sx",
        "smr",
        (
            dec(F.lit(100)) * F.col("n") * (F.col("n") - 1) * F.col("x")
            > dec(F.lit(100)) * (F.col("n") - 1) * F.col("sx")
            + dec(F.lit(266)) * F.col("n") * F.col("smr")
        ).alias("hi"),
        (
            dec(F.lit(100)) * F.col("n") * (F.col("n") - 1) * F.col("x")
            < dec(F.lit(100)) * (F.col("n") - 1) * F.col("sx")
            - dec(F.lit(266)) * F.col("n") * F.col("smr")
        ).alias("lo"),
    )
    return flags.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("sx").cast("long").alias("sum_x"),
        F.max("smr").cast("long").alias("sum_mr"),
        F.sum(F.when(F.col("hi"), 1).otherwise(0)).cast("long").alias("n_above_ucl"),
        F.sum(F.when(F.col("lo"), 1).otherwise(0)).cast("long").alias("n_below_lcl"),
    )


@register(
    "q_ts_forecast_error",
    oracle="""
    WITH monthly AS (
      SELECT strftime(ts, '%Y-%m') AS month,
             sum(round(value * 100)::BIGINT)::BIGINT AS a
      FROM events WHERE event_type = 'purchase' GROUP BY month),
    paired AS (
      SELECT month, a, lag(a) OVER (ORDER BY month) AS f
      FROM monthly),
    e AS (
      SELECT a, f, abs(a - f) AS err,
             ((20000 * abs(a - f)) // (a + f))::BIGINT AS smape_term_bp
      FROM paired WHERE f IS NOT NULL)
    SELECT count(*)::BIGINT AS n_months,
           sum(err)::BIGINT AS abs_err_cents,
           sum(a)::BIGINT AS actual_cents,
           ((10000 * sum(err)) // sum(a))::BIGINT AS wape_bp,
           (sum(smape_term_bp) // count(*))::BIGINT AS smape_bp
    FROM e
    """,
    category="timeseries",
)
def q_ts_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy metrics for the naive seasonal-1 baseline
    (forecast = last month's revenue) — WAPE and sMAPE, the two
    numbers every demand-forecasting evaluation quotes (and the
    baseline any learned forecaster must beat): WAPE = Σ|e|/Σa and
    sMAPE = mean(2|e|/(a+f)), both emitted as integer basis points.
    The per-term sMAPE ratio uses the integer-floor DIV convention
    (declared: each term floors to bp before averaging), so no float
    division exists anywhere and the metrics hash-match exactly.

    Scale posture: one scan → monthly aggregate (value-table sized);
    the lag window and error fold run over that tiny table — the
    q_ts_period_over_period shape with an evaluation head. A learned
    forecast would enter as a second small table joined on month."""
    monthly = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("a")
        )
    )
    w = Window.orderBy("month")
    paired = monthly.select("a", F.lag("a").over(w).alias("f")).where(
        F.col("f").isNotNull()
    )
    e = paired.select(
        "a",
        F.abs(F.col("a") - F.col("f")).alias("err"),
        F.expr("(20000 * abs(a - f)) DIV (a + f)")
        .cast("long")
        .alias("smape_term_bp"),
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("err").cast("long").alias("abs_err_cents"),
        F.sum("a").cast("long").alias("actual_cents"),
        F.expr("(10000 * sum(err)) DIV sum(a)").cast("long").alias("wape_bp"),
        F.expr("sum(smape_term_bp) DIV count(1)").cast("long").alias("smape_bp"),
    )


@register(
    "q_ab_srm",
    oracle="""
    WITH assigned AS (
      SELECT ('0x' || substring(md5('srm:' || user_id::VARCHAR), 1, 8))::BIGINT
               % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM events) u),
    counts AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
      FROM assigned)
    SELECT n_a, n_b,
           round((n_a - n_b)::DOUBLE * (n_a - n_b) / n, 6) AS chi2,
           CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * n
                THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
    category="experimentation",
)
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) check — the guardrail every A/B
    platform runs before reading any metric: assign users to variants
    by deterministic hash (the q_sample_hash_split idiom), then test
    the observed split against the designed 50/50 with the 1-df
    chi-square, which for two equal-expectation cells collapses to
    (n_a−n_b)²/n. The statistic stays in BIGINT until one final
    division; the p<0.05 flag (critical value 3.841) is decided by
    the INTEGER cross-multiplication (n_a−n_b)²·1000 > 3841·n — no
    float comparison can flip it cross-engine.

    Scale posture: distinct user_ids (one shuffle with map-side
    combine), then a single global fold to one row; the md5 bucket is
    a narrow projection. No windows, no collects."""
    from batchprocessor_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    assigned = (
        e.select("user_id")
        .distinct()
        .select(hash_bucket(F.col("user_id"), "srm:", 2).alias("variant"))
    )
    counts = assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    return counts.select(
        "n_a",
        "n_b",
        F.round(d.cast("double") * d / F.col("n"), 6).alias("chi2"),
        F.when(d * d * 1000 > 3841 * F.col("n"), 1).otherwise(0).alias("srm_flag"),
    )


@register(
    "q_ml_ks_statistic",
    oracle="""
    WITH u AS (
      SELECT (n_chars // 100)::BIGINT AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents),
    s AS (
      SELECT score,
             sum(label)::BIGINT AS npos_s,
             (count(*) - sum(label))::BIGINT AS nneg_s
      FROM u GROUP BY score),
    c AS (
      SELECT sum(npos_s) OVER (ORDER BY score)::BIGINT AS cpos,
             sum(nneg_s) OVER (ORDER BY score)::BIGINT AS cneg,
             (SELECT sum(npos_s) FROM s)::BIGINT AS n_pos,
             (SELECT sum(nneg_s) FROM s)::BIGINT AS n_neg
      FROM s)
    SELECT max(n_pos) AS n_pos, max(n_neg) AS n_neg,
           max(abs(cpos * n_neg - cneg * n_pos))::BIGINT AS ks_num,
           round(max(abs(cpos * n_neg - cneg * n_pos))::DOUBLE
                 / (max(n_pos) * max(n_neg)), 6) AS ks
    FROM c
    """,
    category="ml",
)
def q_ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the score
    distributions of the positive and negative class (same
    length-bucket-predicts-English framing as q_ml_auc) — the
    standard separation metric for a propensity/fraud score, and the
    drift test between two score snapshots. KS = max |F⁺(s) − F⁻(s)|
    evaluated WITHOUT ranking rows: cumulative class counts over the
    bounded distinct-score histogram, with the max taken over the
    INTEGER numerator |cpos·n_neg − cneg·n_pos| (the two CDFs put on
    the common denominator n_pos·n_neg) — one final division, 6-dp
    round as belt.

    Scale posture: one aggregate to the bounded score histogram, the
    cumulative window runs over that materialized value table (the
    q_ml_auc discipline — never a global rank of the fact table), and
    the class totals ride along as 1-row broadcast subqueries."""
    d = load_table(spark, sf_dir, "documents").select(
        F.expr("n_chars DIV 100").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    s = d.groupBy("score").agg(
        F.sum("label").cast("long").alias("npos_s"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("nneg_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    totals = s.agg(
        F.sum("npos_s").cast("long").alias("n_pos"),
        F.sum("nneg_s").cast("long").alias("n_neg"),
    )
    c = s.select(
        F.sum("npos_s").over(w).cast("long").alias("cpos"),
        F.sum("nneg_s").over(w).cast("long").alias("cneg"),
    ).crossJoin(F.broadcast(totals))
    num = F.abs(F.col("cpos") * F.col("n_neg") - F.col("cneg") * F.col("n_pos"))
    return c.agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.max(num).cast("long").alias("ks_num"),
        F.round(
            F.max(num).cast("double") / (F.max("n_pos") * F.max("n_neg")), 6
        ).alias("ks"),
    )


@register(
    "q_ml_lift_gains",
    oracle="""
    WITH u AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents),
    s AS (
      SELECT score, count(*)::BIGINT AS n_s, sum(label)::BIGINT AS pos_s
      FROM u GROUP BY score),
    c AS (
      SELECT score, n_s, pos_s,
             coalesce(sum(n_s) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS n_before,
             (SELECT sum(n_s) FROM s)::BIGINT AS n_tot,
             (SELECT sum(pos_s) FROM s)::BIGINT AS pos_tot
      FROM s),
    binned AS (
      SELECT (n_before * 10 // n_tot)::BIGINT AS decile,
             n_s, pos_s, n_tot, pos_tot
      FROM c)
    SELECT decile,
           sum(n_s)::BIGINT AS n,
           sum(pos_s)::BIGINT AS n_pos,
           ((sum(sum(n_s)) OVER w * 10000) // max(n_tot))::BIGINT
             AS cum_depth_bp,
           ((sum(sum(pos_s)) OVER w * 10000) // max(pos_tot))::BIGINT
             AS cum_gain_bp,
           ((sum(sum(pos_s)) OVER w * max(n_tot) * 1000000)
              // (sum(sum(n_s)) OVER w * max(pos_tot)))::BIGINT
             AS cum_lift_ppm
    FROM binned
    GROUP BY decile
    WINDOW w AS (ORDER BY decile)
    ORDER BY decile
    """,
    category="ml",
)
def q_ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for a ranking score (the
    campaign-targeting readout: "the top 20% of the ranked list
    captures X% of positives, lift L") — deciles over score =
    n_chars, positives = lang='en'. Deciles are assigned at the
    VALUE grain: the distinct-score histogram is cumulated
    score-descending and each score level lands in decile
    ⌊10·n_before/n⌋, so assignment never ranks raw rows (ties share
    a level by construction — same semantics as ntile on a
    deterministic total order, without the global row window).
    Depth/gain/lift are integer basis points / ppm via floor
    division on non-negative operands — bit-identical cross-engine.

    Scale posture: one aggregate to the bounded score histogram; both
    windows (the cumulative depth and the per-decile rollup) run over
    value tables (|distinct scores|, then ≤10 rows); totals ride as
    1-row broadcasts. The fact table is touched exactly once."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    s = d.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("label").cast("long").alias("pos_s"),
    )
    totals = s.agg(
        F.sum("n_s").cast("long").alias("n_tot"),
        F.sum("pos_s").cast("long").alias("pos_tot"),
    )
    w_cum = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = s.select(
        "score",
        "n_s",
        "pos_s",
        F.coalesce(F.sum("n_s").over(w_cum), F.lit(0)).cast("long").alias("n_before"),
    ).crossJoin(F.broadcast(totals))
    binned = c.select(
        F.expr("(n_before * 10) DIV n_tot").cast("long").alias("decile"),
        "n_s",
        "pos_s",
        "n_tot",
        "pos_tot",
    )
    w_dec = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    g = binned.groupBy("decile").agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.max("n_tot").alias("n_tot"),
        F.max("pos_tot").alias("pos_tot"),
    )
    cum_n = F.sum("n").over(w_dec)
    cum_pos = F.sum("n_pos").over(w_dec)
    return g.select(
        "decile",
        "n",
        "n_pos",
        F.expr(
            "(sum(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * 10000) DIV n_tot"
        )
        .cast("long")
        .alias("cum_depth_bp"),
        F.expr(
            "(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * 10000) DIV pos_tot"
        )
        .cast("long")
        .alias("cum_gain_bp"),
        F.expr(
            "(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * n_tot * 1000000) DIV"
            " (sum(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * pos_tot)"
        )
        .cast("long")
        .alias("cum_lift_ppm"),
    ).orderBy("decile")


@register(
    "q_events_interarrival",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             epoch_us(ts)::BIGINT - lag(epoch_us(ts)::BIGINT) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    gaps AS (
      SELECT CASE WHEN gap_us <= 0 THEN 0
                  ELSE floor(log2((gap_us // 1000000) + 1))::BIGINT
             END AS bucket_log2_s,
             gap_us
      FROM seq WHERE gap_us IS NOT NULL)
    SELECT bucket_log2_s,
           count(*)::BIGINT AS n_gaps,
           min(gap_us)::BIGINT AS min_gap_us,
           max(gap_us)::BIGINT AS max_gap_us,
           sum(gap_us)::BIGINT AS sum_gap_us
    FROM gaps
    GROUP BY bucket_log2_s
    ORDER BY bucket_log2_s
    """,
    category="events",
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution of the event stream — the
    session-timeout calibration readout (pick the session gap where
    the histogram's bimodal valley sits) and the burst/bot detector's
    base rate. Per-user consecutive gaps from ONE lag window over
    (user_id, ts, event_id), bucketed into log2(seconds+1) bins —
    log2 of an EXACT non-negative integer, floored, so the bucket id
    is bit-identical cross-engine (the q_llm_token_entropy integer-log
    discipline); min/max/sum stay in exact integer microseconds.

    Scale posture: one user_id exchange for the lag window (gaps are
    computed inside each user partition), then an aggregate to the
    ~40-row bucket histogram. No global windows, no collects."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    seq = e.select(
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    bucket = (
        F.when(F.col("gap_us") <= 0, F.lit(0))
        .otherwise(
            F.floor(F.log2(F.expr("(gap_us DIV 1000000) + 1").cast("double")))
        )
        .cast("long")
    )
    return (
        seq.select(bucket.alias("bucket_log2_s"), "gap_us")
        .groupBy("bucket_log2_s")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
        )
        .orderBy("bucket_log2_s")
    )


@register(
    "q_dq_freshness",
    oracle="""
    WITH per_type AS (
      SELECT event_type,
             max(epoch_us(ts))::BIGINT AS max_ts_us,
             count(*)::BIGINT AS n_events
      FROM events GROUP BY event_type),
    global_max AS (SELECT max(max_ts_us)::BIGINT AS g FROM per_type)
    SELECT event_type, n_events,
           (max_ts_us // 1000000)::BIGINT AS latest_s,
           ((g - max_ts_us) // 1000000)::BIGINT AS staleness_s,
           CASE WHEN g - max_ts_us > 86400000000 THEN 1 ELSE 0 END AS stale_flag
    FROM per_type CROSS JOIN global_max
    ORDER BY event_type
    """,
    category="dq",
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness audit — the first page of every pipeline
    health dashboard: latest watermark per event type, its staleness
    against the most recent event anywhere, and a >24 h SLA breach
    flag. A feed that silently stops arriving shows up here before
    any volume anomaly fires. All arithmetic is exact integer
    microseconds; the flag is an integer comparison.

    Scale posture: one aggregate with map-side combine to the
    |event_type|-sized table (max and count are both partial-
    aggregable), the global watermark is a 1-row broadcast over that
    tiny table. The fact scan reads two columns."""
    e = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    per_type = e.groupBy("event_type").agg(
        F.max(us).cast("long").alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per_type.agg(F.max("max_ts_us").alias("g"))
    return (
        per_type.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            F.expr("max_ts_us DIV 1000000").cast("long").alias("latest_s"),
            F.expr("(g - max_ts_us) DIV 1000000").cast("long").alias("staleness_s"),
            F.when(F.col("g") - F.col("max_ts_us") > 86400000000, 1)
            .otherwise(0)
            .alias("stale_flag"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ml_pr_auc",
    oracle="""
    WITH u AS (
      SELECT (n_chars // 100)::BIGINT AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents),
    s AS (
      SELECT score,
             sum(label)::BIGINT AS pos_s,
             (count(*) - sum(label))::BIGINT AS neg_s
      FROM u GROUP BY score),
    c AS (
      SELECT pos_s,
             sum(pos_s) OVER w::BIGINT AS cpos,
             sum(pos_s + neg_s) OVER w::BIGINT AS cn,
             (SELECT sum(pos_s) FROM s)::BIGINT AS npos
      FROM s
      WINDOW w AS (ORDER BY score DESC))
    SELECT max(npos) AS n_pos,
           round(sum(pos_s::DOUBLE * cpos / cn) / max(npos), 6) AS ap
    FROM c
    WHERE pos_s > 0
    """,
    category="ml",
)
def q_ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, the
    step-interpolated AP of the standard eval libraries): AP =
    Σ Δrecall·precision over descending score cuts — the metric that
    replaces ROC AUC when positives are rare (exactly the
    quality-filter regime where 1% of a crawl is kept). Same bounded
    distinct-score histogram lane as q_ml_auc / q_ml_ks_statistic:
    Δrecall at a cut is pos_s/npos, precision is cpos/cn, each
    per-row term is a pair of IEEE ops on exact integers
    (bit-identical), the final sum is rounded to 6 dp.

    Scale posture: one aggregate to the score histogram, one
    cumulative window over that value table, one global fold.
    The fact table is scanned once; nothing ranks raw rows."""
    d = load_table(spark, sf_dir, "documents").select(
        F.expr("n_chars DIV 100").cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    s = d.groupBy("score").agg(
        F.sum("label").cast("long").alias("pos_s"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("neg_s"),
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    npos = s.agg(F.sum("pos_s").cast("long").alias("npos"))
    c = s.select(
        "pos_s",
        F.sum("pos_s").over(w).cast("long").alias("cpos"),
        F.sum(F.col("pos_s") + F.col("neg_s")).over(w).cast("long").alias("cn"),
    ).crossJoin(F.broadcast(npos))
    return (
        c.where(F.col("pos_s") > 0)
        .agg(
            F.max("npos").alias("n_pos"),
            F.round(
                F.sum(
                    F.col("pos_s").cast("double") * F.col("cpos") / F.col("cn")
                )
                / F.max("npos"),
                6,
            ).alias("ap"),
        )
    )


@register(
    "q_ts_burstiness",
    oracle="""
    WITH m AS (
      SELECT event_type,
             (epoch_us(ts) // 60000000)::BIGINT AS minute_no
      FROM events),
    cnt AS (
      SELECT event_type, minute_no, count(*)::BIGINT AS c
      FROM m GROUP BY event_type, minute_no),
    mom AS (
      SELECT event_type,
             count(*)::BIGINT AS n_minutes,
             sum(c)::BIGINT AS n_events,
             sum(c * c)::BIGINT AS sum_c2
      FROM cnt GROUP BY event_type)
    SELECT event_type, n_minutes, n_events,
           round((n_minutes::DOUBLE * sum_c2 - n_events::DOUBLE * n_events)
                 / (n_minutes::DOUBLE * n_events), 6) AS fano
    FROM mom
    ORDER BY event_type
    """,
    category="timeseries",
)
def q_ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of per-minute arrival
    counts, over OBSERVED minutes) per event type — the dispersion
    diagnostic that separates Poisson-like organic traffic (F≈1)
    from bursty bot/batch traffic (F≫1) and feeds rate-limiter
    sizing. The factor reduces to (n·Σc² − (Σc)²)/(n·Σc) over exact
    integer moments — population variance over mean with the
    divisions fused into ONE expression evaluated identically from
    exact BIGINTs on both engines, 6-dp round as belt.

    Scale posture: two aggregates with map-side combine — fact →
    (type, minute) counts → per-type moments; both shuffles keyed,
    output |event_type| rows. No windows."""
    e = load_table(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000")
        .cast("long")
        .alias("minute_no"),
    )
    cnt = m.groupBy("event_type", "minute_no").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mom = cnt.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    fano = (
        F.col("n_minutes").cast("double") * F.col("sum_c2")
        - F.col("n_events").cast("double") * F.col("n_events")
    ) / (F.col("n_minutes").cast("double") * F.col("n_events"))
    return mom.select(
        "event_type",
        "n_minutes",
        "n_events",
        F.round(fano, 6).alias("fano"),
    ).orderBy("event_type")


@register(
    "q_events_audience_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, count(*)::BIGINT AS n FROM tu GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS t1, b.event_type AS t2, count(*)::BIGINT AS inter
      FROM tu a JOIN tu b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY t1, t2)
    SELECT i.t1, i.t2, s1.n AS n1, s2.n AS n2, i.inter,
           ((10000 * i.inter) // (s1.n + s2.n - i.inter))::BIGINT
             AS jaccard_bp
    FROM inter i
    JOIN sizes s1 ON s1.event_type = i.t1
    JOIN sizes s2 ON s2.event_type = i.t2
    ORDER BY i.t1, i.t2
    """,
    category="events",
)
def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity between the user
    sets of every event-type pair — the product-analytics readout
    behind "do purchasers also hit errors" and the feature-adoption
    Venn every dashboard draws. Users are deduplicated to
    (type, user) first, so the self-join counts each user once; the
    Jaccard lands in integer basis points via floor division on
    non-negative operands.

    Scale posture: the distinct pass is one keyed aggregate with
    map-side combine; the pair join is an equi-join ON USER_ID (fan-
    out bounded by |types| per user, so output ≤ 10 pairs per user,
    never quadratic in users); sizes broadcast onto the pair table.
    """
    e = load_table(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("t1"), "user_id")
    b = tu.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))),
            "t1",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))),
            "t2",
        )
        .select(
            "t1",
            "t2",
            "n1",
            "n2",
            "inter",
            F.expr("(10000 * inter) DIV (n1 + n2 - inter)")
            .cast("long")
            .alias("jaccard_bp"),
        )
        .orderBy("t1", "t2")
    )


@register(
    "q_merge_cdc_apply",
    oracle="""
    WITH snap AS (
      SELECT c_custkey::BIGINT AS k, c_nationkey,
             round(c_acctbal * 100)::BIGINT AS cents
      FROM customer),
    log AS (
      SELECT CASE WHEN o_orderkey % 10 >= 8 THEN o_custkey + 100000
                  ELSE o_custkey END::BIGINT AS k,
             CASE WHEN o_orderkey % 10 < 5 THEN 'U'
                  WHEN o_orderkey % 10 < 8 THEN 'D'
                  ELSE 'I' END AS op,
             (o_custkey % 25)::INT AS new_nation,
             round(o_totalprice * 100)::BIGINT AS new_cents,
             o_orderdate, o_orderkey
      FROM orders),
    last AS (
      SELECT k, op, new_nation, new_cents
      FROM log
      QUALIFY row_number() OVER (PARTITION BY k
        ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
    merged AS (
      SELECT coalesce(s.k, l.k) AS k,
             CASE WHEN l.k IS NULL THEN 'untouched'
                  WHEN l.op = 'D' THEN 'deleted'
                  WHEN s.k IS NULL THEN 'inserted'
                  ELSE 'updated' END AS outcome,
             CASE WHEN l.k IS NULL THEN s.c_nationkey
                  WHEN s.k IS NULL THEN l.new_nation
                  ELSE s.c_nationkey END AS nation,
             CASE WHEN l.k IS NULL THEN s.cents
                  ELSE l.new_cents END AS cents
      FROM snap s FULL OUTER JOIN last l ON s.k = l.k)
    SELECT outcome,
           count(*)::BIGINT AS n_rows,
           sum(CASE WHEN outcome <> 'deleted' THEN cents ELSE 0 END)::BIGINT
             AS live_cents,
           count(DISTINCT nation)::BIGINT AS n_nations
    FROM merged
    GROUP BY outcome
    ORDER BY outcome
    """,
    category="merge",
)
def q_merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply — the replication kernel under every
    lakehouse MERGE stream: a deterministic insert/update/delete
    changelog (derived from orders: op by key bucket, sequenced by
    (o_orderdate, o_orderkey)) is collapsed LAST-WINS per key, then
    applied to the customer snapshot in one full outer join —
    update-in-place, delete-removes, insert-appends, untouched rows
    pass through. The audit groups rows by outcome with exact live
    cents, so a wrong op order (last-wins broken), a lost delete, or
    a double-applied update each flips a row count or the checksum.
    Extends q_merge_upsert (update/insert only) with the delete lane
    and multi-op-per-key sequencing.

    Scale posture: last-wins is a keyed window over the changelog
    (parallel per key); the apply is ONE full outer join on the key —
    the same copy-on-write shape as MERGE; both shuffles are on the
    same key, so AQE reuses the layout. No driver involvement."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_nationkey",
        to_units(F.col("c_acctbal"), 100).alias("cents"),
    )
    o = load_table(spark, sf_dir, "orders")
    bucket = F.col("o_orderkey") % 10
    log = o.select(
        F.when(bucket >= 8, F.col("o_custkey") + 100000)
        .otherwise(F.col("o_custkey"))
        .cast("long")
        .alias("k"),
        F.when(bucket < 5, "U").when(bucket < 8, "D").otherwise("I").alias("op"),
        (F.col("o_custkey") % 25).cast("int").alias("new_nation"),
        to_units(F.col("o_totalprice"), 100).alias("new_cents"),
        "o_orderdate",
        "o_orderkey",
    )
    wl = Window.partitionBy("k").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    last = (
        log.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") == 1)
        .select("k", "op", "new_nation", "new_cents")
    )
    merged = c.alias("s").join(last.alias("l"), "k", "full_outer").select(
        F.when(F.col("l.op").isNull(), "untouched")
        .when(F.col("l.op") == "D", "deleted")
        .when(F.col("s.cents").isNull(), "inserted")
        .otherwise("updated")
        .alias("outcome"),
        F.when(F.col("l.op").isNull(), F.col("s.c_nationkey"))
        .when(F.col("s.cents").isNull(), F.col("l.new_nation"))
        .otherwise(F.col("s.c_nationkey"))
        .alias("nation"),
        F.when(F.col("l.op").isNull(), F.col("s.cents"))
        .otherwise(F.col("l.new_cents"))
        .alias("cents"),
    )
    return (
        merged.groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("outcome") != "deleted", F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("live_cents"),
            F.count_distinct(F.col("nation")).alias("n_nations"),
        )
        .orderBy("outcome")
    )


@register(
    "q_events_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) FILTER (event_type = 'view') AS v_ts
      FROM events GROUP BY user_id),
    p AS (
      SELECT e.user_id, v.v_ts, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND v.v_ts IS NOT NULL
        AND e.ts >= v.v_ts
      GROUP BY e.user_id, v.v_ts),
    lat AS (
      SELECT strftime(v_ts, '%Y-%m-%d') AS cohort_day,
             ((epoch_us(p_ts) - epoch_us(v_ts)) // 1000000)::BIGINT AS lat_s
      FROM p)
    SELECT cohort_day,
           count(*)::BIGINT AS n_converted,
           quantile_cont(lat_s, 0.5) AS p50_s,
           quantile_cont(lat_s, 0.9) AS p90_s,
           quantile_cont(lat_s, 0.99) AS p99_s,
           (sum(lat_s) // count(*))::BIGINT AS avg_s
    FROM lat GROUP BY cohort_day
    """,
    category="analytics",
)
def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert latency distribution by first-touch cohort day:
    for every user, the lag from their FIRST view to their first
    purchase AT OR AFTER it (the same stage-ordering rule as
    q_funnel_conversion), summarized per cohort day as exact-count
    p50/p90/p99 and integer mean — the latency-SLO readout growth
    teams watch for cohort drift. Latencies are exact integer seconds
    (unix_micros diffs, floor division — the NANOS→micros lane, see
    sources/catalog.load_table), and the percentiles are the
    bit-identical type-7 interpolation lane of q_agg_percentile_exact,
    so no rounding belt anywhere.

    Scale posture: the first-view timestamp is a per-user window MIN
    over ONE user_id hash partitioning (no self-join); qualifying
    purchases filter against it in the same pass, collapse to one row
    per converting user, and the per-cohort percentile is Spark's
    partial-aggregable typed percentile (value-histogram partials
    merged on the reducer) — two shuffles total (user_id, cohort)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v_ts = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    per_user = (
        e.withColumn("v_ts", v_ts)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("v_ts").isNotNull()
            & (F.col("ts") >= F.col("v_ts"))
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = per_user.select(
        F.date_format("v_ts", "yyyy-MM-dd").alias("cohort_day"),
        # ts is TIMESTAMP_NTZ; the cast's UTC interpretation shift is
        # identical on both operands, so it cancels in the difference
        F.expr(
            "(unix_micros(cast(p_ts as timestamp))"
            " - unix_micros(cast(v_ts as timestamp))) DIV 1000000"
        )
        .cast("long")
        .alias("lat_s"),
    )
    # r12: one percentile buffer for the three latency quantiles
    # (value-identical; the q_agg_approx consolidation, guide §1.2).
    return (
        lat.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.percentile(
                "lat_s", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
            ).alias("_q"),
            F.expr("sum(lat_s) DIV count(1)").cast("long").alias("avg_s"),
        )
        .select(
            "cohort_day",
            "n_converted",
            F.element_at("_q", 1).alias("p50_s"),
            F.element_at("_q", 2).alias("p90_s"),
            F.element_at("_q", 3).alias("p99_s"),
            "avg_s",
        )
    )


@register(
    "q_ml_pinball_loss",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY day),
    ranked AS (
      SELECT day, cents,
             row_number() OVER (ORDER BY day) AS rn,
             count(*) OVER () AS n
      FROM daily),
    q AS (SELECT unnest([1, 5, 9]) AS qx10),
    fc AS (
      SELECT q.qx10, r.cents AS f_cents
      FROM q JOIN ranked r
        ON r.rn = ((r.n // 2) * q.qx10 + 9) // 10),
    ev AS (SELECT cents FROM ranked WHERE rn > n // 2),
    losses AS (
      SELECT fc.qx10, fc.f_cents,
             greatest(fc.qx10 * (ev.cents - fc.f_cents),
                      (fc.qx10 - 10) * (ev.cents - fc.f_cents)) AS l_x10
      FROM fc CROSS JOIN ev)
    SELECT qx10, f_cents,
           count(*)::BIGINT AS n_eval_days,
           sum(l_x10)::BIGINT AS pinball_x10_sum,
           (sum(l_x10) // (10 * count(*)))::BIGINT AS avg_pinball_cents
    FROM losses GROUP BY qx10, f_cents
    """,
    category="ml",
)
def q_ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation via pinball (quantile) loss — the
    metric that scores a P10/P50/P90 forecast band the way WAPE scores
    a point forecast (q_ts_forecast_error's sibling for probabilistic
    forecasting). Forecasts are the EXACT order statistics of the
    train half of the daily-revenue series (rank ceil(q·n) — integer
    selection, no interpolation, so the forecast stays integer cents),
    evaluated on the held-out second half. The loss is carried ×10 so
    q enters as the integer decile: L×10 = max(q₁₀·d, (q₁₀−10)·d) with
    d = actual − forecast — every quantity BIGINT end-to-end, so the
    cross-engine hash cannot drift. The asymmetry check a reader
    expects falls out: the P90 forecast under-penalizes overshoot 9:1.

    Scale posture: the fact table collapses to the daily value table
    (one shuffle); rank/count windows and the train/eval split run
    over that tiny table (same declared value-table-window shape as
    q_ts_forecast_error); the 3-row forecast table cross-joins back
    broadcast-style. A learned forecaster would replace `fc` with its
    own (quantile, day, forecast) table joined on day."""
    daily = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w_ord = Window.orderBy("day")  # value-table sized (one row per day)
    w_all = Window.partitionBy()
    ranked = daily.select(
        "day",
        "cents",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    q = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("qx10")
    )
    fc = F.broadcast(q).join(
        ranked,
        F.col("rn") == F.expr("((n DIV 2) * qx10 + 9) DIV 10"),
    ).select("qx10", F.col("cents").alias("f_cents"))
    ev = ranked.where(F.col("rn") > F.expr("n DIV 2")).select("cents")
    d = F.col("cents") - F.col("f_cents")
    losses = ev.crossJoin(F.broadcast(fc)).select(
        "qx10",
        "f_cents",
        F.greatest(F.col("qx10") * d, (F.col("qx10") - 10) * d).alias("l_x10"),
    )
    return losses.groupBy("qx10", "f_cents").agg(
        F.count(F.lit(1)).alias("n_eval_days"),
        F.sum("l_x10").cast("long").alias("pinball_x10_sum"),
        F.expr("sum(l_x10) DIV (10 * count(1))")
        .cast("long")
        .alias("avg_pinball_cents"),
    )


@register(
    "q_merge_snapshot_diff",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
    c AS (
      SELECT mn + (mx - mn) // 3 AS t1,
             mn + ((mx - mn) * 2) // 3 AS t2
      FROM b),
    s1 AS (
      SELECT user_id, event_type AS state FROM events, c
      WHERE epoch_us(ts) <= t1
      QUALIFY row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) = 1),
    s2 AS (
      SELECT user_id, event_type AS state FROM events, c
      WHERE epoch_us(ts) <= t2
      QUALIFY row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) = 1),
    d AS (
      SELECT CASE WHEN s1.user_id IS NULL THEN 'added'
                  WHEN s2.user_id IS NULL THEN 'removed'
                  WHEN s1.state <> s2.state THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             s2.state AS state_now
      FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id)
    SELECT change_type, count(*)::BIGINT AS n_users,
           count(DISTINCT state_now)::BIGINT AS n_states
    FROM d GROUP BY change_type
    """,
    category="merge",
)
def q_merge_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the table-format audit every Delta/Iceberg
    deployment runs between two commits: reconstruct the user-state
    dimension AS OF two cutoff times (t1 at 1/3 and t2 at 2/3 of the
    event span, derived in-query so the diff is scale-free), full-
    outer-join the snapshots on the business key, and classify every
    key as added / removed / changed / unchanged with exact counts.
    Complements q_merge_cdc_apply (which APPLIES a changelog) by
    answering the reverse question: given two states of the table,
    what changed? 'removed' is structurally impossible for this
    append-only feed and correctly never appears.

    Scale posture: each snapshot is one user_id window over a
    time-PRUNED scan (the ts <= cutoff predicate pushes to parquet
    row-group stats; at 100 TB with date-partitioned layout it prunes
    partitions outright); the diff join and both windows share the
    user_id hash partitioning, and the audit output is
    4-rows-not-|users|. Cutoffs come from one tiny min/max aggregate
    broadcast into both branches."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # events.ts may surface as TIMESTAMP_NTZ depending on the session's
    # parquet path; the cast is an identity under the UTC session and
    # makes unix_micros applicable either way.
    em = e.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    cuts = em.agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    ).select(
        (F.col("mn") + F.expr("(mx - mn) div 3")).alias("t1"),
        (F.col("mn") + F.expr("((mx - mn) * 2) div 3")).alias("t2"),
    )

    def snapshot(cutoff_col: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("us").desc(), F.col("event_id").desc()
        )
        return (
            em.crossJoin(F.broadcast(cuts))
            .where(F.col("us") <= F.col(cutoff_col))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )

    s1 = snapshot("t1").withColumnRenamed("state", "state1")
    s2 = snapshot("t2").withColumnRenamed("state", "state2")
    # Classification keys STRICTLY off join-key nullness (the oracle's
    # s1.user_id / s2.user_id rule): a NULL state (NULL event_type in
    # the feed) must read as a present-but-NULL-state key — branching
    # on the state columns would call it added/removed where the
    # oracle says unchanged (ADVICE r7).
    d = s1.join(s2, "user_id", "full").select(
        F.when(s1["user_id"].isNull(), "added")
        .when(s2["user_id"].isNull(), "removed")
        .when(F.col("state1") != F.col("state2"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        F.col("state2").alias("state_now"),
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count_distinct("state_now").cast("long").alias("n_states"),
    )


# windowFunnel chain budget: the whole view->click->purchase chain
# must fit in 6 hours from the view (6h picked where the fixture
# splits users across all depths; production tunes per product).
_FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000


@register(
    "q_funnel_time_window",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
    x AS (
      SELECT user_id, event_type, us, event_id,
             last_value(CASE WHEN event_type = 'view' THEN us END
               IGNORE NULLS) OVER w AS lv
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING)),
    y AS (
      SELECT user_id, event_type, us, lv,
             last_value(CASE WHEN event_type = 'click' THEN lv END
               IGNORE NULLS) OVER w AS c_lv
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING)),
    d AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND c_lv IS NOT NULL
                       AND c_lv >= us - {_FUNNEL_WINDOW_US} THEN 3
                      WHEN event_type = 'click' AND lv IS NOT NULL
                       AND lv >= us - {_FUNNEL_WINDOW_US} THEN 2
                      WHEN event_type = 'view' THEN 1
                      ELSE 0 END) AS depth
      FROM y GROUP BY user_id)
    SELECT depth, count(*)::BIGINT AS n_users FROM d GROUP BY depth
    """,
    category="analytics",
)
def q_funnel_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (the ClickHouse ``windowFunnel``
    shape): per user, the deepest view→click→purchase chain whose
    WHOLE span fits inside a 6-hour window anchored at the view —
    the third funnel variant next to q_funnel_conversion (gaps
    allowed, unbounded) and q_seq_pattern_match (strictly
    consecutive). Emits users per max depth (0–3).

    The naive formulation is an EXISTS over (view, click, purchase)
    triples — a triangular triple self-join that explodes at scale.
    This implementation is two cascaded carry windows over ONE
    user_id partitioning: carry the latest view time onto every row,
    then carry (from the latest click) that click's carried view
    time; a purchase then witnesses depth 3 iff that twice-carried
    view is within the window (greedy latest-view choice is optimal,
    so EXISTS ⇔ the carried witness qualifies — brute-force-checked
    in tests/test_metric_kernels.py). Zero joins, timeline scanned
    once.

    Scale posture: one Exchange on user_id; both windows share the
    partitioning+sort so Catalyst evaluates them in one WindowExec
    chain without a second shuffle; the per-user reduce and the
    4-row depth aggregate are map-side-combined."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    t = e.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = t.withColumn(
        "lv",
        F.last(
            F.when(F.col("event_type") == "view", F.col("us")), ignorenulls=True
        ).over(w),
    )
    y = x.withColumn(
        "c_lv",
        F.last(
            F.when(F.col("event_type") == "click", F.col("lv")), ignorenulls=True
        ).over(w),
    )
    T = F.lit(_FUNNEL_WINDOW_US)
    depth = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("c_lv").isNotNull()
            & (F.col("c_lv") >= F.col("us") - T),
            3,
        )
        .when(
            (F.col("event_type") == "click")
            & F.col("lv").isNotNull()
            & (F.col("lv") >= F.col("us") - T),
            2,
        )
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
    ).alias("depth")
    d = y.groupBy("user_id").agg(depth)
    return d.groupBy("depth").agg(F.count(F.lit(1)).cast("long").alias("n_users"))


@register(
    "q_dq_null_profile",
    oracle="""
    SELECT 'customer' AS tbl, 'c_acctbal' AS col,
           count(*)::BIGINT AS n_rows,
           sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           count(DISTINCT c_acctbal)::BIGINT AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'orders', 'o_orderpriority', count(*)::BIGINT,
           sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderpriority)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_returnflag', count(*)::BIGINT,
           sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT l_returnflag)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'events', 'props', count(*)::BIGINT,
           sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT props)::BIGINT
    FROM events
    """,
    category="dq",
)
def q_dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-TABLE null/cardinality audit — the catalog-wide health
    check a warehouse runs nightly: for one representative column per
    fact table, exact row count, null count, and exact distinct
    cardinality, unioned into a single scorecard. Complements
    q_profile_columns (deep single-table profile) with the wide
    many-table sweep, and q_dq_expectations (assertions) with raw
    measurements.

    Scale posture: each leg is ONE aggregate over a single-column
    pruned scan (ReadSchema carries just the audited column);
    count(DISTINCT) is Spark's standard two-phase expand — at 100 TB
    swap in approx_count_distinct per the q_agg_approx pattern if
    exactness isn't required. The union is plan-free concatenation of
    four 1-row results."""
    legs = [
        ("customer", "c_acctbal"),
        ("orders", "o_orderpriority"),
        ("lineitem", "l_returnflag"),
        ("events", "props"),
    ]
    outs = []
    for tbl, col in legs:
        t = load_table(spark, sf_dir, tbl).select(col)
        outs.append(
            t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.count_distinct(F.col(col)).cast("long").alias("n_distinct"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("col"),
                "n_rows",
                "n_null",
                "n_distinct",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "q_events_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
      FROM events),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
    fan AS (
      SELECT DISTINCT ud.user_id, ud.day + u.x::INT AS d
      FROM ud, unnest(generate_series(0, 6)) AS u(x), b
      WHERE ud.day + u.x::INT BETWEEN b.lo AND b.hi),
    wau AS (SELECT d, count(*)::BIGINT AS wau_7 FROM fan GROUP BY d),
    dau AS (SELECT day AS d, count(*)::BIGINT AS dau FROM ud GROUP BY day)
    SELECT strftime(w.d, '%Y-%m-%d') AS day,
           coalesce(dau.dau, 0)::BIGINT AS dau, w.wau_7,
           ((10000 * coalesce(dau.dau, 0)) // w.wau_7)::BIGINT
             AS dau_wau_bp
    FROM wau w LEFT JOIN dau ON dau.d = w.d
    """,
    category="events",
)
def q_events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per calendar day (DAU + trailing
    WAU + DAU/WAU stickiness in basis points) — the engagement
    time-series behind every growth dashboard. The naive formulation
    is COUNT(DISTINCT user) OVER a 7-day range window, which Spark
    rejects (no DISTINCT in windows) and which would hold per-day user
    SETS in window state anyway. Instead each distinct (user, day)
    fans out to the ≤7 trailing report days it contributes to, a
    second distinct collapses multi-day users once per report day,
    and a plain count finishes — bounded 7× fan-out with map-side
    combine, no window state, no sets (the q_agg_bitmap_distinct
    alternative trades the fan-out for bitmap unions when the window
    is long).

    Scale posture: three hash exchanges — (user,day) distinct,
    (user,d) distinct after the literal-bounded explode, and the d
    aggregate; the day-bounds filter broadcasts. A 100 TB events feed
    with 90-day windows would switch to per-bucket bitmaps; at 7 days
    the fan-out is strictly cheaper."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ud = e.select(
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts").cast("timestamp"))).alias("day"),
    ).distinct()
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    fan = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("d"),
        )
        .crossJoin(F.broadcast(bounds))
        .where(F.col("d").between(F.col("lo"), F.col("hi")))
        .select("user_id", "d")
        .distinct()
    )
    wau = fan.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("wau_7"))
    dau = ud.groupBy(F.col("day").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    return (
        wau.join(dau, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            "wau_7",
            F.expr("(10000 * coalesce(dau, 0)) div wau_7")
            .cast("long")
            .alias("dau_wau_bp"),
        )
    )


# Two-sided alpha=0.05 / power=0.80 normal quantiles, written as
# literals in ONE shared formula text (q_ml_linreg_normal_eq
# discipline) so both engines run the identical double ops.
_POWER_FORMULAS = {
    "delta": "(sx2 / n2 - sx1 / n1)",
    "s2p": (
        "(((sxx1 - (sx1 / n1) * sx1) / (n1 - 1))"
        " + ((sxx2 - (sx2 / n2) * sx2) / (n2 - 1))) / 2"
    ),
}
_POWER_FORMULAS["mde"] = (
    f"(1.959963984540054 + 0.8416212335729143)"
    f" * sqrt(2.0 * ({_POWER_FORMULAS['s2p']}) / least(n1, n2))"
)
# nullif guards the coincident-means case (delta == 0): without it the
# Spark lane casts Infinity to Long.MaxValue while DuckDB raises on
# Infinity::BIGINT — NULL ("no effect observed, no finite n exists")
# is the only answer both engines agree on and the only meaningful one
# (ADVICE r7).
_POWER_FORMULAS["n_required"] = (
    f"ceil(2.0 * (1.959963984540054 + 0.8416212335729143)"
    f" * (1.959963984540054 + 0.8416212335729143)"
    f" * ({_POWER_FORMULAS['s2p']})"
    f" / nullif(({_POWER_FORMULAS['delta']}) * ({_POWER_FORMULAS['delta']}), 0.0))"
)


@register(
    "q_ab_power_mde",
    oracle=f"""
    WITH s AS (
      SELECT count(*) FILTER (event_type = 'click')::BIGINT AS n1_i,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sx1_i,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sxx1_i,
             count(*) FILTER (event_type = 'purchase')::BIGINT AS n2_i,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sx2_i,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sxx2_i
      FROM events WHERE event_type IN ('click', 'purchase')),
    d AS (
      SELECT n1_i AS n1_out, n2_i AS n2_out,
             n1_i::DOUBLE AS n1, sx1_i::DOUBLE AS sx1, sxx1_i::DOUBLE AS sxx1,
             n2_i::DOUBLE AS n2, sx2_i::DOUBLE AS sx2, sxx2_i::DOUBLE AS sxx2
      FROM s)
    SELECT n1_out AS n1, n2_out AS n2,
           round({_POWER_FORMULAS['delta']}, 6) AS delta_cents,
           round({_POWER_FORMULAS['mde']}, 6) AS mde_cents,
           ({_POWER_FORMULAS['n_required']})::BIGINT AS n_required
    FROM d
    """,
    category="experimentation",
)
def q_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis from observed moments: with the click arm as
    control and the purchase arm as treatment (the q_ab_welch_ttest
    fixture convention), compute the observed mean delta, the minimum
    detectable effect at alpha=0.05 two-sided / 80% power given the
    CURRENT per-arm n, and the required per-arm n to detect the
    OBSERVED delta — the pre-experiment sizing / post-experiment
    sensitivity readout every experimentation platform serves next to
    the t-test. Exactness: integer-cents moments (one conditional
    aggregate), then one shared formula text with the normal quantiles
    as literals — identical double ops on both engines; the only
    integer output (n_required) is ceil of an identical double.

    Scale posture: a single map-side-combined aggregate over a pushed
    two-value IN filter; the formula stage is 1-row scalar math.
    Per-experiment versions add the grouping key to the same plan."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = e.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1_i"),
        F.sum(F.when(is1, dec(cents))).cast("long").alias("sx1_i"),
        F.sum(F.when(is1, dec(cents * cents))).cast("long").alias("sxx1_i"),
        F.sum(F.when(is2, 1).otherwise(0)).cast("long").alias("n2_i"),
        F.sum(F.when(is2, dec(cents))).cast("long").alias("sx2_i"),
        F.sum(F.when(is2, dec(cents * cents))).cast("long").alias("sxx2_i"),
    )
    d = s.selectExpr(
        "n1_i AS n1_out",
        "n2_i AS n2_out",
        "CAST(n1_i AS DOUBLE) AS n1",
        "CAST(sx1_i AS DOUBLE) AS sx1",
        "CAST(sxx1_i AS DOUBLE) AS sxx1",
        "CAST(n2_i AS DOUBLE) AS n2",
        "CAST(sx2_i AS DOUBLE) AS sx2",
        "CAST(sxx2_i AS DOUBLE) AS sxx2",
    )
    return d.selectExpr(
        "n1_out AS n1",
        "n2_out AS n2",
        f"round({_POWER_FORMULAS['delta']}, 6) AS delta_cents",
        f"round({_POWER_FORMULAS['mde']}, 6) AS mde_cents",
        f"CAST({_POWER_FORMULAS['n_required']} AS BIGINT) AS n_required",
    )


@register(
    "q_events_cohort_ltv",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(ts) // 604800000000 AS week,
             round(value * 100)::BIGINT AS cents
      FROM events),
    cohorts AS (
      SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
    sizes AS (
      SELECT cohort_week, count(*)::BIGINT AS n_users
      FROM cohorts GROUP BY cohort_week),
    rev AS (
      SELECT c.cohort_week, (e.week - c.cohort_week)::BIGINT AS week_idx,
             sum(e.cents)::BIGINT AS cents
      FROM e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort_week, week_idx, cents,
             sum(cents) OVER (PARTITION BY cohort_week ORDER BY week_idx
               ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
      FROM rev)
    SELECT cum.cohort_week::BIGINT AS cohort_week, cum.week_idx,
           s.n_users, cum.cents, cum.cum_cents,
           (100 * cum.cum_cents // s.n_users)::BIGINT AS cum_cents_per_user_c2
    FROM cum JOIN sizes s ON s.cohort_week = cum.cohort_week
    """,
    category="events",
)
def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — the revenue companion to
    q_retention_cohorts: users are cohorted by their FIRST-activity
    week, purchase revenue is bucketed by weeks-since-cohort-start,
    and a running per-cohort cumulative sum yields the classic
    (cohort × age) LTV matrix with a per-user cumulative value in
    1/100-cent integer units. Weeks are epoch-anchored integer
    day-groups (epoch_us ÷ 604800e6), not calendar weeks — identical
    integer arithmetic on both engines, no locale/week-start
    semantics to disagree on. Every column is an exact integer lane;
    the per-user rate uses DIV on non-negative operands.

    Scale posture: one user_id aggregate for cohorts, a user_id
    equi-join to tag purchases (both sides share the partitioning),
    a (cohort, idx)-keyed aggregate, and ONE small window over the
    per-cohort triangle (|weeks|² rows, not |events|). The cohort
    sizes join broadcasts. At 100 TB the triangle stays tiny —
    window cost is independent of event volume."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 604800000000").alias(
            "week"
        ),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cohorts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rev = (
        e.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_idx"),
        )
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w).cast("long"))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        "week_idx",
        "n_users",
        "cents",
        "cum_cents",
        F.expr("(100 * cum_cents) div n_users").cast("long").alias(
            "cum_cents_per_user_c2"
        ),
    )


# --------------------------------------------------------- Kaplan-Meier

@register(
    "q_ml_kaplan_meier",
    oracle="""
    WITH RECURSIVE v AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view') AS v_ts,
             max(ts) AS t_max
      FROM events GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND v.v_ts IS NOT NULL
        AND e.ts >= v.v_ts
      GROUP BY e.user_id),
    subj AS (
      SELECT v.user_id,
             ((epoch_us(coalesce(p.p_ts, v.t_max)) - epoch_us(v.v_ts))
              // 86400000000)::BIGINT AS dur,
             CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END AS evt
      FROM v LEFT JOIN p ON p.user_id = v.user_id
      WHERE v.v_ts IS NOT NULL),
    km AS (
      SELECT dur, sum(evt)::BIGINT AS e, count(*)::BIGINT AS leave
      FROM subj GROUP BY dur),
    risk AS (
      SELECT dur, e,
             sum(leave) OVER (ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n_risk
      FROM km),
    ev AS (
      SELECT dur, e, n_risk,
             row_number() OVER (ORDER BY dur) AS rn,
             count(*) OVER () AS n
      FROM risk WHERE e > 0),
    f AS (
      SELECT rn, n, dur, e, n_risk,
             ((1000000000000::HUGEINT * (n_risk - e)) // n_risk)::BIGINT
               AS surv
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT ev.rn, ev.n, ev.dur, ev.e, ev.n_risk,
             ((f.surv::HUGEINT * (ev.n_risk - ev.e)) // ev.n_risk)::BIGINT
      FROM f JOIN ev ON ev.rn = f.rn + 1)
    SELECT dur AS duration_days, n_risk, e AS n_events,
           surv AS survival_e12
    FROM f
    """,
    category="ml",
)
def q_ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival curve of view→purchase
    conversion: subjects are users with a first view; the event is
    their first purchase at/after it (the q_events_time_to_convert
    stage rule); users who never purchase are RIGHT-CENSORED at their
    last observed activity — the estimator that makes conversion /
    churn analysis honest about open-ended observation windows, which
    a naive conversion-rate cut ignores. Emits one row per event
    time: duration (whole days), the risk set size, events at that
    time, and S(t) = Π (n_i − d_i)/n_i.

    Cross-engine exactness: durations are integer floor-days of
    microsecond diffs; risk sets are suffix sums over the bounded
    duration histogram; the survival product runs in integer 1e-12
    units with the iterative floor recurrence
    S_k = (S_{k−1} · (n_k − d_k)) DIV n_k — both engines state the
    identical integer recurrence (Spark: one `aggregate` fold whose
    accumulator also APPENDS each step, so the full curve comes out
    of one fold; DuckDB: a recursive CTE), with the S·(n−d) product
    computed through a wide-integer cast (DECIMAL(38,0) / HUGEINT):
    S sits at the 1e12 scale, so the product would pass BIGINT once
    the risk set exceeds ~9.2M subjects — wide staging makes the
    lane exact at ANY population. The curve is hash-exact with zero
    float products.

    Scale posture: one user_id window pass + one per-user collapse
    (the subjects table is user-grain), then everything runs on the
    BOUNDED duration histogram (≤ observation-window days, ~60 rows
    at any SF): suffix-sum window, fold, explode — the value-table
    window discipline. The fold state is O(event times), never
    O(users). Two exchanges total (user_id, then the 1-row series
    collapse).

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's analytics family.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v_ts = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    per_user = (
        e.withColumn("v_ts", v_ts)
        .where(F.col("v_ts").isNotNull())
        .groupBy("user_id", "v_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("v_ts")),
                    F.col("ts"),
                )
            ).alias("p_ts"),
            F.max("ts").alias("t_max"),
        )
    )
    subj = per_user.select(
        F.expr(
            "(unix_micros(cast(coalesce(p_ts, t_max) as timestamp))"
            " - unix_micros(cast(v_ts as timestamp))) DIV 86400000000"
        )
        .cast("long")
        .alias("dur"),
        F.when(F.col("p_ts").isNull(), 0).otherwise(1).alias("evt"),
    )
    km = subj.groupBy("dur").agg(
        F.sum("evt").cast("long").alias("e"),
        F.count(F.lit(1)).cast("long").alias("leave"),
    )
    risk = km.select(
        "dur",
        "e",
        F.sum("leave")
        .over(
            Window.orderBy("dur").rowsBetween(
                Window.currentRow, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    series = (
        risk.where(F.col("e") > 0)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dur", "n_risk", "e"))
            ).alias("xs")
        )
    )
    folded = series.selectExpr(
        """
        aggregate(
          xs,
          struct(CAST(1000000000000 AS BIGINT) AS s,
                 CAST(array() AS
                   ARRAY<STRUCT<dur: BIGINT, n: BIGINT,
                                e: BIGINT, surv: BIGINT>>) AS out),
          (acc, x) -> struct(
            CAST((CAST(acc.s AS DECIMAL(38, 0)) * (x.n_risk - x.e))
                 DIV x.n_risk AS BIGINT) AS s,
            array_append(acc.out,
              struct(x.dur AS dur, x.n_risk AS n, x.e AS e,
                     CAST((CAST(acc.s AS DECIMAL(38, 0)) * (x.n_risk - x.e))
                          DIV x.n_risk AS BIGINT) AS surv))
              AS out)
        ).out AS out
        """
    )
    step = F.explode("out").alias("st")
    return folded.select(step).select(
        F.col("st.dur").alias("duration_days"),
        F.col("st.n").alias("n_risk"),
        F.col("st.e").alias("n_events"),
        F.col("st.surv").alias("survival_e12"),
    )


# ------------------------------------------------------ bootstrap CI

_BCI_R = 40  # bootstrap replicates; nearest-rank 2.5%/97.5% = 1st/39th


def _bci_oracle() -> str:
    from batchprocessor_spark.operators.sampling import _BOOT_T

    h = (
        "('0x' || substring(md5('bci' || rep::VARCHAR || ':' ||"
        " event_id::VARCHAR), 1, 8))::BIGINT"
    )
    ladder = " ".join(f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_T))
    return f"""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1,
             round(value * 100)::BIGINT AS c
      FROM events WHERE event_type IN ('click', 'purchase')),
    reps AS (
      SELECT rep,
             (CASE {ladder} ELSE {len(_BOOT_T)} END)::BIGINT AS k,
             is1, c
      FROM e CROSS JOIN (SELECT unnest(generate_series(0, {_BCI_R - 1}))
                         AS rep)),
    per_rep AS (
      SELECT rep,
             sum(k * is1)::BIGINT AS w1,
             sum(k * is1 * c)::BIGINT AS wc1,
             sum(k * (1 - is1))::BIGINT AS w2,
             sum(k * (1 - is1) * c)::BIGINT AS wc2
      FROM reps GROUP BY rep),
    deltas AS (
      SELECT rep,
             wc1::DOUBLE / greatest(w1, 1) - wc2::DOUBLE / greatest(w2, 1)
               AS delta,
             row_number() OVER (ORDER BY
               wc1::DOUBLE / greatest(w1, 1)
                 - wc2::DOUBLE / greatest(w2, 1), rep) AS rn
      FROM per_rep),
    obs AS (
      SELECT count(*) FILTER (is1 = 1)::BIGINT AS n1,
             count(*) FILTER (is1 = 0)::BIGINT AS n2,
             sum(c) FILTER (is1 = 1)::BIGINT AS s1,
             sum(c) FILTER (is1 = 0)::BIGINT AS s2
      FROM e)
    SELECT obs.n1 AS n_click, obs.n2 AS n_purchase,
           {_BCI_R} AS n_boot,
           round(obs.s1::DOUBLE / nullif(obs.n1, 0)
                 - obs.s2::DOUBLE / nullif(obs.n2, 0), 6) AS delta_obs,
           round((SELECT delta FROM deltas WHERE rn = 1), 6) AS ci_lo,
           round((SELECT delta FROM deltas WHERE rn = {_BCI_R - 1}), 6)
             AS ci_hi
    FROM obs
    """


@register("q_ab_bootstrap_ci", oracle=_bci_oracle(), category="experimentation")
def q_ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap confidence interval for the difference in
    mean event value between two arms (click vs purchase, the
    q_ab_welch_ttest arms) — the distribution-free companion to the
    Welch test: 40 one-pass Poisson(1) bootstrap replicates
    (Oza–Russell, the q_sample_poisson_bootstrap integer threshold
    ladder keyed on ('bci<rep>:' || event_id)), each replicate's
    arm-mean difference computed from exact integer weighted sums,
    and the CI read off the replicate order statistics by the
    declared nearest-rank convention (2.5% → 1st, 97.5% → 39th of
    B = 40).

    Cross-engine exactness: multiplicities are integer ladder
    lookups on identical 32-bit hashes; per-replicate weighted sums
    are exact BIGINTs; each delta is the SAME two IEEE divisions and
    one subtraction of identical integers — bit-identical doubles —
    so the rank selection picks identical replicates (tie-break on
    rep id); 6-dp rounds are a belt.

    Scale posture: replicates explode map-side from ONE filtered
    fact scan (a 40-struct array per row — the count-min shape) and
    combine to 40 rows before any shuffle; the order-statistic
    window runs over the 40-row replicate table only; the observed
    means ride a second conditional aggregate, 1 row, broadcast. B
    replicates cost B columns of integer math, not B passes.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's experimentation family.
    """
    from batchprocessor_spark.operators.sampling import _BOOT_T

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )

    def k_of(rep):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bci"),
                        rep.cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        expr = F.lit(len(_BOOT_T))
        for k in range(len(_BOOT_T) - 1, -1, -1):
            expr = F.when(h < _BOOT_T[k], k).otherwise(expr)
        return expr.cast("long")

    cells = F.transform(
        F.sequence(F.lit(0), F.lit(_BCI_R - 1)),
        lambda r: F.struct(r.cast("int").alias("rep"), k_of(r).alias("k")),
    )
    per_rep = (
        e.select("is1", "c", F.explode(cells).alias("x"))
        .select(F.col("x.rep").alias("rep"), F.col("x.k").alias("k"), "is1", "c")
        .groupBy("rep")
        .agg(
            F.sum(F.col("k") * F.col("is1")).cast("long").alias("w1"),
            F.sum(F.col("k") * F.col("is1") * F.col("c")).cast("long").alias("wc1"),
            F.sum(F.col("k") * (1 - F.col("is1"))).cast("long").alias("w2"),
            F.sum(F.col("k") * (1 - F.col("is1")) * F.col("c"))
            .cast("long")
            .alias("wc2"),
        )
    )
    delta = (
        F.col("wc1").cast("double") / F.greatest(F.col("w1"), F.lit(1))
        - F.col("wc2").cast("double") / F.greatest(F.col("w2"), F.lit(1))
    )
    ranked = per_rep.select(
        delta.alias("delta"),
        F.row_number()
        .over(Window.orderBy(delta, F.col("rep")))
        .alias("rn"),
    )
    ci = ranked.agg(
        F.round(F.max(F.when(F.col("rn") == 1, F.col("delta"))), 6).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("rn") == _BCI_R - 1, F.col("delta"))), 6
        ).alias("ci_hi"),
    )
    obs = e.agg(
        F.count(F.when(F.col("is1") == 1, 1)).cast("long").alias("n_click"),
        F.count(F.when(F.col("is1") == 0, 1)).cast("long").alias("n_purchase"),
        # nullif: an empty arm must read as NULL on BOTH engines
        # (ANSI Spark raises on double/0 while DuckDB emits inf — the
        # q_ab_power_mde divergence class)
        F.round(
            F.expr(
                "CAST(sum(CASE WHEN is1 = 1 THEN c END) AS DOUBLE)"
                " / nullif(count(CASE WHEN is1 = 1 THEN 1 END), 0)"
                " - CAST(sum(CASE WHEN is1 = 0 THEN c END) AS DOUBLE)"
                " / nullif(count(CASE WHEN is1 = 0 THEN 1 END), 0)"
            ),
            6,
        ).alias("delta_obs"),
    )
    return obs.crossJoin(F.broadcast(ci)).select(
        "n_click",
        "n_purchase",
        F.lit(_BCI_R).cast("int").alias("n_boot"),
        "delta_obs",
        "ci_lo",
        "ci_hi",
    )


# ------------------------------------------------- lifecycle accounting

@register(
    "q_events_lifecycle",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) // 86400000000)::BIGINT AS day
      FROM events WHERE event_type = 'purchase'),
    marked AS (
      SELECT user_id, day,
             min(day) OVER (PARTITION BY user_id) AS first_day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_d,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_d
      FROM uw),
    maxd AS (SELECT max(day)::BIGINT AS max_day FROM uw),
    status AS (
      SELECT day,
             CASE WHEN day = first_day THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_d = day - 1 THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN day > first_day
                   AND (prev_d IS NULL OR prev_d < day - 1)
                  THEN 1 ELSE 0 END AS is_resurrected,
             0 AS is_churned
      FROM marked
      UNION ALL
      SELECT m.day + 1, 0, 0, 0, 1
      FROM marked m CROSS JOIN maxd
      WHERE (m.next_d IS NULL OR m.next_d > m.day + 1)
        AND m.day + 1 <= maxd.max_day)
    SELECT day,
           sum(is_new)::BIGINT AS n_new,
           sum(is_retained)::BIGINT AS n_retained,
           sum(is_resurrected)::BIGINT AS n_resurrected,
           sum(is_churned)::BIGINT AS n_churned,
           sum(is_new + is_retained + is_resurrected)::BIGINT AS n_active
    FROM status GROUP BY day
    """,
    category="analytics",
)
def q_events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting user lifecycle states per day — the
    new / retained / resurrected / churned decomposition every growth
    team reconciles active-user movement with (n_active ≡ new +
    retained + resurrected by construction; churn counted the day
    AFTER the last active day, censored at the data horizon).
    Activity = PURCHASE days (the fixture's every-type activity is
    dense enough that coarser grains degenerate to all-retained —
    purchase days exercise all four states); per (user, day) activity
    is classified from that user's own timeline only, so the whole
    operator is one user-keyed pass plus a bounded day aggregate.

    Days are epoch-anchored integers (unix_micros DIV 86400e6); churn
    rows emit at day+1 via the same lead that detects the gap, and
    the day table is bounded by the observation window.

    Cross-engine exactness: integer days, integer flag sums; the
    new/retained/resurrected split is exhaustive and disjoint by the
    CASE order both engines share.

    Scale posture: one distinct over (user, day) — the only
    corpus-sized shuffle — then first/lag/lead windows sharing ONE
    user_id exchange, a 1-row max-day broadcast bounding the churn
    horizon, and a bounded day aggregate. No self-joins (the
    classic formulation joins day d to d−1 per user; the lag form
    does it in one pass).

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's analytics family.
    """
    e = load_table(spark, sf_dir, "events")
    uw = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(
                "CAST(unix_micros(cast(ts as timestamp))"
                " DIV 86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .distinct()
    )
    w_user = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("day")
    marked = uw.select(
        "user_id",
        "day",
        F.min("day").over(w_user).alias("first_day"),
        F.lag("day").over(w_ord).alias("prev_d"),
        F.lead("day").over(w_ord).alias("next_d"),
    )
    maxd = uw.agg(F.max("day").cast("long").alias("max_day"))
    status = marked.select(
        "day",
        F.when(F.col("day") == F.col("first_day"), 1).otherwise(0).alias("is_new"),
        F.when(F.col("prev_d") == F.col("day") - 1, 1).otherwise(0).alias("is_retained"),
        F.when(
            (F.col("day") > F.col("first_day"))
            & (F.col("prev_d").isNull() | (F.col("prev_d") < F.col("day") - 1)),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
        F.lit(0).alias("is_churned"),
    )
    churn = (
        marked.crossJoin(F.broadcast(maxd))
        .where(
            (F.col("next_d").isNull() | (F.col("next_d") > F.col("day") + 1))
            & (F.col("day") + 1 <= F.col("max_day"))
        )
        .select(
            (F.col("day") + 1).alias("day"),
            F.lit(0).alias("is_new"),
            F.lit(0).alias("is_retained"),
            F.lit(0).alias("is_resurrected"),
            F.lit(1).alias("is_churned"),
        )
    )
    return (
        status.unionAll(churn)
        .groupBy("day")
        .agg(
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum("is_retained").cast("long").alias("n_retained"),
            F.sum("is_resurrected").cast("long").alias("n_resurrected"),
            F.sum("is_churned").cast("long").alias("n_churned"),
            F.sum(
                F.col("is_new") + F.col("is_retained") + F.col("is_resurrected")
            )
            .cast("long")
            .alias("n_active"),
        )
    )


# ------------------------------------------------- cross-table rules

@register(
    "q_dq_cross_table_rules",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_shipdate, l.l_discount, o.o_orderdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    lsum AS (
      SELECT l_orderkey,
             sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       * 100)::BIGINT)::BIGINT AS calc_cents
      FROM lineitem GROUP BY l_orderkey),
    ord AS (
      SELECT o.o_orderkey, round(o.o_totalprice * 100)::BIGINT AS total_cents,
             lsum.calc_cents
      FROM orders o LEFT JOIN lsum ON lsum.l_orderkey = o.o_orderkey)
    SELECT 'ship_on_or_after_order' AS rule,
           count(*)::BIGINT AS n_checked,
           sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)::BIGINT
             AS n_violations,
           ((10000 * sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END))
              // count(*))::BIGINT AS violation_bp
    FROM lo
    UNION ALL
    SELECT 'discount_in_domain', count(*)::BIGINT,
           sum(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1
                    THEN 1 ELSE 0 END)::BIGINT,
           ((10000 * sum(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1
                              THEN 1 ELSE 0 END)) // count(*))::BIGINT
    FROM lo
    UNION ALL
    SELECT 'order_has_lineitems', count(*)::BIGINT,
           sum(CASE WHEN calc_cents IS NULL THEN 1 ELSE 0 END)::BIGINT,
           ((10000 * sum(CASE WHEN calc_cents IS NULL THEN 1 ELSE 0 END))
              // count(*))::BIGINT
    FROM ord
    UNION ALL
    SELECT 'totalprice_matches_lines',
           count(*) FILTER (calc_cents IS NOT NULL)::BIGINT,
           sum(CASE WHEN calc_cents IS NOT NULL
                     AND abs(total_cents - calc_cents) > 1
                    THEN 1 ELSE 0 END)::BIGINT,
           ((10000 * sum(CASE WHEN calc_cents IS NOT NULL
                               AND abs(total_cents - calc_cents) > 1
                              THEN 1 ELSE 0 END))
              // nullif(count(*) FILTER (calc_cents IS NOT NULL), 0))::BIGINT
    FROM ord
    """,
    category="dq",
)
def q_dq_cross_table_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE data-quality rules — the relationship-level audit
    the per-table expectation report (q_dq_expectations) and the
    key-existence audit (q_dq_referential_integrity) both stop short
    of: (1) every line must ship ON OR AFTER its order date; (2) the
    order header's total must equal the line-level reconstruction
    Σ round(extprice·(1−disc)·(1+tax)·100) within one cent; (3) every
    order must have at least one line; (4) discounts must stay in
    the declared [0, 0.1] domain. One row per rule with checked /
    violation counts and the violation share in integer basis points
    — this fixture genuinely fails (1)–(3), so the audit reports real
    findings, not vacuous greens.

    Cross-engine exactness: the consistency rule rounds each LINE to
    integer cents BEFORE the sum (per-row double math over identical
    parquet values is IEEE-identical; the integer sum is
    order-independent — a float group-sum would be summation-order
    sensitive and could flip the 1-cent tolerance), dates compare as
    dates, shares are integer DIV with a nullif guard.

    Scale posture: rules (1)+(4) ride ONE line⋈order equi-join
    (AQE-planned) reduced by conditional aggregates; rules (2)+(3)
    ride one per-order line aggregate LEFT-joined to the header —
    each branch is scan → join → 1-row aggregate, unioned into a
    4-row report. No windows, no Python.

    Reference scope: the reference engine has no DQ surface; this
    extends SURVEY.md §2.4's data-quality family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lo = li.select("l_orderkey", "l_shipdate", "l_discount").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    r1 = lo.agg(
        F.lit("ship_on_or_after_order").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        flag(F.col("l_shipdate") < F.col("o_orderdate")).alias("n_violations"),
    )
    r4 = lo.agg(
        F.lit("discount_in_domain").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        flag(~F.col("l_discount").between(0, 0.1)).alias("n_violations"),
    )
    lsum = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
                " * 100) AS BIGINT)"
            )
        ).cast("long").alias("calc_cents")
    )
    ordx = o.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("total_cents"),
    ).join(lsum, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    r3 = ordx.agg(
        F.lit("order_has_lineitems").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        flag(F.col("calc_cents").isNull()).alias("n_violations"),
    )
    r2 = ordx.agg(
        F.lit("totalprice_matches_lines").alias("rule"),
        F.count(F.when(F.col("calc_cents").isNotNull(), 1))
        .cast("long")
        .alias("n_checked"),
        flag(
            F.col("calc_cents").isNotNull()
            & (F.abs(F.col("total_cents") - F.col("calc_cents")) > 1)
        ).alias("n_violations"),
    )
    report = r1.unionAll(r4).unionAll(r3).unionAll(r2)
    return report.select(
        "rule",
        "n_checked",
        "n_violations",
        F.expr(
            "CAST((10000 * n_violations) DIV nullif(n_checked, 0) AS BIGINT)"
        ).alias("violation_bp"),
    )


# Shared "length bucket -> P(lang=en)" histogram classifier (trained on
# even doc_ids) used by BOTH q_ml_brier_score and q_ml_mcc, as one
# helper + one oracle CTE text — the q_llm_lang_confusion no-drift
# rule: evaluators of the same model must share its construction.
_CLF_ORACLE_CTES = """
    train AS (
      SELECT n_chars // 100 AS bucket,
             ((10000 * count(*) FILTER (lang = 'en')) // count(*))::BIGINT
               AS pred_bp
      FROM documents WHERE doc_id % 2 = 0 GROUP BY bucket),
    prior AS (
      SELECT ((10000 * count(*) FILTER (lang = 'en')) // count(*))::BIGINT
               AS prior_bp
      FROM documents WHERE doc_id % 2 = 0)
"""


def _histogram_classifier(d):
    """(train, prior) frames of the shared even-doc_id classifier."""
    train = (
        d.where(F.col("doc_id") % 2 == 0)
        .groupBy(F.expr("n_chars DIV 100").alias("bucket"))
        .agg(
            F.expr(
                "CAST((10000 * count(CASE WHEN lang = 'en' THEN 1 END))"
                " DIV count(1) AS BIGINT)"
            ).alias("pred_bp")
        )
    )
    prior = d.where(F.col("doc_id") % 2 == 0).agg(
        F.expr(
            "CAST((10000 * count(CASE WHEN lang = 'en' THEN 1 END))"
            " DIV count(1) AS BIGINT)"
        ).alias("prior_bp")
    )
    return train, prior


# ----------------------------------------------------------- Brier score

@register(
    "q_ml_brier_score",
    oracle=f"""
    WITH {_CLF_ORACLE_CTES},
    test AS (
      SELECT coalesce(t.pred_bp, p.prior_bp) AS pred_bp, p.prior_bp,
             CASE WHEN d.lang = 'en' THEN 10000 ELSE 0 END AS y_bp
      FROM documents d
      LEFT JOIN train t ON d.n_chars // 100 = t.bucket
      CROSS JOIN prior p
      WHERE d.doc_id % 2 = 1)
    SELECT count(*)::BIGINT AS n_test,
           (sum((pred_bp - y_bp) * (pred_bp - y_bp)) // count(*))::BIGINT
             AS brier_e8,
           (sum((prior_bp - y_bp) * (prior_bp - y_bp)) // count(*))::BIGINT
             AS brier_base_e8,
           ((10000 * (sum((prior_bp - y_bp) * (prior_bp - y_bp)) // count(*)
                      - sum((pred_bp - y_bp) * (pred_bp - y_bp)) // count(*)))
              // nullif(sum((prior_bp - y_bp) * (prior_bp - y_bp))
                        // count(*), 0))::BIGINT AS skill_bp
    FROM test
    """,
    category="ml",
)
def q_ml_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the q_ml_calibration histogram classifier
    (length bucket → P(lang=en), trained on even doc_ids, scored on
    odd), plus the climatology BASELINE (always predict the train
    prior) and the Brier skill score — the proper scoring rule that
    completes the evaluation family beside rank quality (AUC/PR-AUC),
    calibration (ECE), and threshold metrics (precision/recall/F1):
    a model can be well-calibrated yet useless, and skill_bp > 0 is
    the single number that says the model beats climatology.

    Cross-engine exactness: probabilities live in integer basis
    points, so every squared error (p_bp − 10000·y)² is an exact
    BIGINT ≤ 10⁸ and the score is one integer DIV (declared unit
    1e-8); the skill ratio is integer bp with a nullif guard for the
    degenerate always-one-class corpus.

    Scale posture: train is one bucket histogram (bounded), broadcast
    onto the scoring scan with the 1-row prior; the score is ONE
    conditional aggregate — no windows, no Python, the
    q_ml_calibration shape with a different reduction.

    Reference scope: the reference engine has no ML-eval surface;
    this extends SURVEY.md §2.4's evaluation family.
    """
    d = load_table(spark, sf_dir, "documents")
    train, prior = _histogram_classifier(d)
    test = (
        d.where(F.col("doc_id") % 2 == 1)
        .select("lang", F.expr("n_chars DIV 100").alias("bucket"))
        .join(F.broadcast(train), "bucket", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.coalesce(F.col("pred_bp"), F.col("prior_bp")).alias("pred_bp"),
            "prior_bp",
            F.when(F.col("lang") == "en", 10000).otherwise(0).alias("y_bp"),
        )
    )
    return test.selectExpr(
        "pred_bp", "prior_bp", "y_bp"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.expr(
            "CAST(sum((pred_bp - y_bp) * (pred_bp - y_bp)) DIV count(1)"
            " AS BIGINT)"
        ).alias("brier_e8"),
        F.expr(
            "CAST(sum((prior_bp - y_bp) * (prior_bp - y_bp)) DIV count(1)"
            " AS BIGINT)"
        ).alias("brier_base_e8"),
        F.expr(
            "CAST((10000 * (sum((prior_bp - y_bp) * (prior_bp - y_bp))"
            " DIV count(1) - sum((pred_bp - y_bp) * (pred_bp - y_bp))"
            " DIV count(1))) DIV nullif(sum((prior_bp - y_bp)"
            " * (prior_bp - y_bp)) DIV count(1), 0) AS BIGINT)"
        ).alias("skill_bp"),
    )


@register(
    "q_ml_mcc",
    oracle=f"""
    WITH {_CLF_ORACLE_CTES},
    test AS (
      SELECT CASE WHEN coalesce(t.pred_bp, p.prior_bp) >= p.prior_bp
                  THEN 1 ELSE 0 END AS pred,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents d
      LEFT JOIN train t ON d.n_chars // 100 = t.bucket
      CROSS JOIN prior p
      WHERE d.doc_id % 2 = 1),
    c AS (
      SELECT sum(pred * y)::BIGINT AS tp,
             sum(pred * (1 - y))::BIGINT AS fp,
             sum((1 - pred) * y)::BIGINT AS fn,
             sum((1 - pred) * (1 - y))::BIGINT AS tn
      FROM test)
    SELECT tp, fp, fn, tn,
           round((tp::DOUBLE * tn::DOUBLE - fp::DOUBLE * fn::DOUBLE)
                 / nullif(sqrt((tp + fp)::DOUBLE * (tp + fn)::DOUBLE
                        * (tn + fp)::DOUBLE * (tn + fn)::DOUBLE), 0.0), 6)
             AS mcc
    FROM c
    """,
    category="ml",
)
def q_ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the thresholded histogram
    classifier (predict 'en' when the bucket rate reaches the train
    prior) — the single-number confusion summary that stays honest
    under class imbalance where accuracy and F1 both mislead;
    completes the threshold-metric family beside
    precision/recall/F1 (q_ml_eval_metrics) and chance-corrected
    agreement (q_ml_cohens_kappa).

    Cross-engine exactness: the confusion cells are exact integer
    sums; MCC applies the SAME sequence of IEEE ops (four products,
    one sqrt, one division — each double exactly representing an
    integer ≤ 2^53) to identical cells on both engines, so even the
    unrounded double agrees bit-for-bit; the 6-dp round is a belt.

    Scale posture: bucket model + 1-row prior broadcast onto the
    scoring scan, ONE conditional aggregate to a 1-row confusion —
    no windows, no Python.

    Reference scope: the reference engine has no ML-eval surface;
    this extends SURVEY.md §2.4's evaluation family.
    """
    d = load_table(spark, sf_dir, "documents")
    train, prior = _histogram_classifier(d)
    test = (
        d.where(F.col("doc_id") % 2 == 1)
        .select("lang", F.expr("n_chars DIV 100").alias("bucket"))
        .join(F.broadcast(train), "bucket", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.when(
                F.coalesce(F.col("pred_bp"), F.col("prior_bp"))
                >= F.col("prior_bp"),
                1,
            )
            .otherwise(0)
            .alias("pred"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
    )
    c = test.agg(
        F.sum(F.expr("pred * y")).cast("long").alias("tp"),
        F.sum(F.expr("pred * (1 - y)")).cast("long").alias("fp"),
        F.sum(F.expr("(1 - pred) * y")).cast("long").alias("fn"),
        F.sum(F.expr("(1 - pred) * (1 - y)")).cast("long").alias("tn"),
    )
    return c.selectExpr(
        "tp",
        "fp",
        "fn",
        "tn",
        # nullif: a zero confusion margin (single-class truth or
        # single-class predictions) must read NULL on BOTH engines
        "round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)"
        " - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))"
        " / nullif(sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)"
        " * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 0.0), 6)"
        " AS mcc",
    )


# ------------------------------------------------- sequential testing (SPRT)

# Wald SPRT for the purchase-share hypothesis test H0: p = 3/20 vs
# H1: p = 1/4, alpha = beta = 0.05. The per-observation log-likelihood
# increments and the decision boundary are DECLARED once as
# micro-log-likelihood integers (round(1e6·ln(·)) — the Fellegi–Sunter
# ppm-weight discipline), so the sequential fold is pure BIGINT
# arithmetic on both engines:
#   success:  round(1e6·ln(p1/p0))          = round(1e6·ln(5/3))
#   failure:  round(1e6·ln((1-p1)/(1-p0)))  = round(1e6·ln(15/17))
#   boundary: round(1e6·ln((1-b)/a))        = round(1e6·ln(19))
_SPRT_W_SUCC = 510826
_SPRT_W_FAIL = -125163
_SPRT_BOUND = 2944439


@register(
    "q_ab_sprt",
    oracle=f"""
    WITH daily AS (
      SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
             count(*)::BIGINT AS n_trials,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS n_success
      FROM events GROUP BY 1),
    cum AS (
      SELECT day, n_trials, n_success,
             sum(n_success * {_SPRT_W_SUCC}
                 + (n_trials - n_success) * {_SPRT_W_FAIL})
               OVER (ORDER BY day)::BIGINT AS llr_micro
      FROM daily),
    cross_day AS (
      SELECT min(day) AS cday
      FROM cum WHERE abs(llr_micro) >= {_SPRT_BOUND}),
    verdict AS (
      SELECT c.cday,
             (SELECT llr_micro FROM cum WHERE day = c.cday) AS cllr
      FROM cross_day c)
    SELECT cum.day, cum.n_trials, cum.n_success, cum.llr_micro,
           CASE WHEN v.cday IS NULL OR cum.day < v.cday THEN 'continue'
                WHEN v.cllr >= {_SPRT_BOUND} THEN 'accept_h1'
                ELSE 'accept_h0' END AS status
    FROM cum CROSS JOIN verdict v
    """,
    category="experimentation",
)
def q_ab_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (1945) on the daily
    purchase share — the sequential monitoring every experimentation
    platform runs instead of a fixed-horizon test, because peeking at
    a t-test inflates false positives while the SPRT's (alpha, beta)
    guarantee HOLDS under continuous monitoring: the cumulative
    log-likelihood ratio of H1: p = 1/4 vs H0: p = 3/20 walks up with
    each purchase and down with each non-purchase, and the experiment
    stops the first day |LLR| crosses ln(19). Rows report the full
    day-grain trajectory with the sequential state — 'continue' before
    any crossing, then the verdict from the crossing day's sign (rows
    after the stop keep the verdict label: a stopped test stays
    stopped).

    Cross-engine exactness: the per-observation increments and the
    boundary are the declared micro-log integers above, so the
    trajectory is a pure BIGINT prefix sum (≈5e5-scale weights × 1e6
    daily trials × 2500 days ≈ 1e15 — BIGINT-safe at sf1000); no float
    exists anywhere in the operator.

    Scale posture: one map-side-combined day aggregate off the fact
    scan; the cumulative window runs on the bounded day-grain value
    table (never fact rows); the crossing verdict is a 1-row relation
    cross-joined back (unhinted — AQE broadcasts a 1-row side). No
    Python, no fact-table windows.

    Reference scope: the reference engine has no experimentation
    surface; this extends SURVEY.md §2.4's analytics family.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(unix_micros(cast(ts as timestamp)) DIV 86400000000"
            " AS BIGINT)"
        ).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_trials"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_success"),
    )
    cum = daily.select(
        "day",
        "n_trials",
        "n_success",
        F.sum(
            F.col("n_success") * F.lit(_SPRT_W_SUCC)
            + (F.col("n_trials") - F.col("n_success")) * F.lit(_SPRT_W_FAIL)
        )
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("llr_micro"),
    )
    crossed = cum.where(F.abs(F.col("llr_micro")) >= _SPRT_BOUND)
    verdict = crossed.agg(F.min("day").alias("cday")).join(
        crossed.select(F.col("day").alias("cday"), F.col("llr_micro").alias("cllr")),
        "cday",
        "left",
    )
    return cum.crossJoin(verdict).selectExpr(
        "day",
        "n_trials",
        "n_success",
        "llr_micro",
        f"CASE WHEN cday IS NULL OR day < cday THEN 'continue'"
        f" WHEN cllr >= {_SPRT_BOUND} THEN 'accept_h1'"
        f" ELSE 'accept_h0' END AS status",
    )



# ------------------------------------------------------ isotonic regression

@register(
    "q_ml_isotonic",
    oracle="""
    WITH daily AS (
      SELECT (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day_no,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY 1),
    r AS (
      SELECT day_no, cents, row_number() OVER (ORDER BY day_no) AS r
      FROM daily),
    ps AS (
      SELECT day_no, cents, r, sum(cents) OVER (ORDER BY r)::BIGINT AS s
      FROM r),
    pairs AS (
      SELECT a.r AS j, b.r AS k,
             (b.s - a.s + a.cents)::DOUBLE / (b.r - a.r + 1) AS avgjk
      FROM ps a JOIN ps b ON b.r >= a.r),
    cm AS (
      SELECT j, k AS i,
             min(avgjk) OVER (PARTITION BY j ORDER BY k DESC) AS t1
      FROM pairs),
    f AS (
      SELECT i, j, max(t1) OVER (PARTITION BY i ORDER BY j) AS fit
      FROM cm)
    SELECT r.day_no, r.cents, round(f.fit, 4) AS fitted
    FROM f JOIN r ON r.r = f.i
    WHERE f.j = f.i
    """,
    category="ml",
)
def q_ml_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing, L2) regression of the daily
    revenue series — the shape-constrained fit behind probability
    calibration (Zadrozny–Elkan), dose-response curves, and monotone
    trend extraction. Sequential PAVA does not distribute, so this
    computes the closed-form MINIMAX identity instead:
    fitted[i] = max_{j<=i} min_{k>=i} mean(y[j..k]) — three bounded
    relational stages (prefix sums → all (j,k) segment means → a
    right-to-left running min per j, then a running max per i), which
    IS the pool-adjacent-violators solution
    (tests/test_metric_kernels.py pins equality against an
    independent python PAVA on the fixtures and on adversarial
    series).

    Cross-engine exactness: segment means are double quotients of
    exact BIGINT prefix-sum differences — identical integers →
    identical IEEE doubles → identical min/max picks on both engines;
    the 4-dp round is presentation only.

    Scale posture: everything after the one fact aggregate runs on
    the CALENDAR-BOUNDED day table (n ≈ 2.4k days at every SF — the
    n(n+1)/2 ≈ 2.9M segment-mean rows and their two windows are
    value-table work, constant in corpus size; the pairs join is a
    broadcast range join of the day table with itself, documented
    bounded). The fact table contributes one map-side-combined
    day aggregate and is never windowed.

    Reference scope: the reference engine has no ML surface; this
    extends SURVEY.md §2.4's analytics family.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(unix_micros(cast(o_orderdate as timestamp))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("day_no")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    r = daily.select(
        "day_no",
        "cents",
        F.row_number().over(Window.orderBy("day_no")).alias("r"),
    )
    ps = r.select(
        "day_no",
        "cents",
        "r",
        F.sum("cents").over(Window.orderBy("r")).cast("long").alias("s"),
    )
    a = ps.select(
        F.col("r").alias("j"), F.col("s").alias("sa"), F.col("cents").alias("ca")
    )
    b = ps.select(F.col("r").alias("k"), F.col("s").alias("sb"))
    pairs = a.join(b, F.col("k") >= F.col("j")).select(
        "j",
        "k",
        (
            (F.col("sb") - F.col("sa") + F.col("ca")).cast("double")
            / (F.col("k") - F.col("j") + 1)
        ).alias("avgjk"),
    )
    cm = pairs.select(
        "j",
        F.col("k").alias("i"),
        F.min("avgjk")
        .over(Window.partitionBy("j").orderBy(F.col("k").desc()))
        .alias("t1"),
    )
    f = cm.select(
        "i",
        "j",
        F.max("t1").over(Window.partitionBy("i").orderBy("j")).alias("fit"),
    ).where(F.col("j") == F.col("i"))
    return f.join(r, f["i"] == r["r"]).select(
        "day_no", "cents", F.round("fit", 4).alias("fitted")
    )


@register(
    "q_ml_kruskal_wallis",
    oracle="""
    WITH daily AS (
      SELECT (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day_no,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY 1),
    v AS (
      SELECT cents, count(*)::BIGINT AS c FROM daily GROUP BY 1),
    w AS (
      SELECT cents,
             (2 * (sum(c) OVER (ORDER BY cents) - c) + c + 1)::BIGINT
               AS midrank2
      FROM v),
    r AS (
      SELECT (d.day_no % 7)::BIGINT AS dow7, w.midrank2
      FROM daily d JOIN w ON w.cents = d.cents),
    g AS (
      SELECT dow7, count(*)::BIGINT AS n_days,
             sum(midrank2)::BIGINT AS sum_rank2
      FROM r GROUP BY 1),
    tot AS (
      SELECT sum(n_days)::BIGINT AS n,
             list_reduce(
               list((sum_rank2::DOUBLE * sum_rank2::DOUBLE) / n_days
                    ORDER BY dow7),
               (a, x) -> a + x) AS sum_hterm,
             (SELECT sum(c * c * c - c)::BIGINT FROM v) AS tie_cubes
      FROM g)
    SELECT g.dow7, g.n_days, g.sum_rank2,
           ((1000 * g.sum_rank2) // (2 * g.n_days))::BIGINT
             AS mean_rank_milli,
           round((3.0 * t.sum_hterm / (t.n::DOUBLE * (t.n + 1))
                  - 3.0 * (t.n + 1))
                 / nullif(1.0 - t.tie_cubes::DOUBLE
                          / (t.n::DOUBLE * t.n * t.n - t.n), 0.0), 6)
             AS h_stat
    FROM g CROSS JOIN tot t
    """,
    category="ml",
)
def q_ml_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test of weekday on daily revenue — the
    nonparametric companion to q_ts_weekday_effect's ANOVA η²: when
    daily totals are heavy-tailed (real revenue always is), the
    rank-based H statistic answers "does weekday shift the revenue
    DISTRIBUTION" without the normality assumption the parametric
    test leans on. Per epoch-anchored weekday (day_no MOD 7): day
    count, exact rank-sum, mean rank in milli-units, and the
    tie-corrected H repeated on each of the 7 rows.

    Cross-engine exactness: midranks are carried DOUBLED
    (midrank2 = 2·rank_before + run + 1) so ties of even length stay
    exact BIGINTs — Σ midrank2 over all days is N(N+1) by
    construction (pinned in tests). Rank sums and the tie term
    Σ(t³−t) are exact integers; the one float stage (Σ R²/n and the
    H ratio) folds its 7 per-group terms in EXPLICIT dow7 order
    (array_sort left fold vs list_reduce over an ORDER BY list — the
    q_ts_weekday_effect discipline), so the doubles are bit-identical
    with the 6-dp round as a belt. The rank window runs over the
    DISTINCT-value histogram (bounded by the calendar day count),
    never the fact table, so sum_rank2² < 4·N⁴ ≈ 1.3e14 stays
    double-exact at ANY scale factor.

    Scale posture: one map-side-combined day aggregate, a rank window
    over the bounded value table, one value-table-sized join back, a
    7-row aggregate and a 1-row total. No windows over facts, no
    Python, no hints (AQE broadcasts the value table by itself).

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's evaluation/stats family.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(unix_micros(cast(o_orderdate as timestamp))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("day_no")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    v = daily.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = v.select(
        "cents",
        (2 * (F.sum("c").over(cum) - F.col("c")) + F.col("c") + 1)
        .cast("long")
        .alias("midrank2"),
    )
    r = daily.join(w, "cents").select(
        F.expr("day_no % 7").cast("long").alias("dow7"), "midrank2"
    )
    g = r.groupBy("dow7").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("midrank2").cast("long").alias("sum_rank2"),
    )
    tie = v.agg(
        F.sum(F.expr("c * c * c - c")).cast("long").alias("tie_cubes")
    )
    tot = (
        g.agg(
            F.sum("n_days").cast("long").alias("n"),
            F.array_sort(
                F.collect_list(F.struct("dow7", "n_days", "sum_rank2"))
            ).alias("gs"),
        )
        .crossJoin(tie)
        .selectExpr(
            "n",
            "tie_cubes",
            "aggregate(gs, 0.0D, (a, x) -> a +"
            " (CAST(x.sum_rank2 AS DOUBLE) * CAST(x.sum_rank2 AS DOUBLE))"
            " / x.n_days) AS sum_hterm",
        )
    )
    return g.crossJoin(tot).selectExpr(
        "dow7",
        "n_days",
        "sum_rank2",
        "CAST((1000 * sum_rank2) DIV (2 * n_days) AS BIGINT)"
        " AS mean_rank_milli",
        # nullif: an all-tied corpus (every daily total identical) must
        # read NULL on BOTH engines, not raise under ANSI Spark
        "round((3.0D * sum_hterm / (CAST(n AS DOUBLE) * (n + 1))"
        " - 3.0D * (n + 1))"
        " / nullif(1.0D - CAST(tie_cubes AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n * n - n), 0.0D), 6) AS h_stat",
    )


@register(
    "q_ml_tukey_hsd",
    oracle="""
    WITH daily AS (
      SELECT (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day_no,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY 1),
    g AS (
      SELECT (day_no % 7)::BIGINT AS dow7,
             count(*)::BIGINT AS n_days,
             sum(cents)::BIGINT AS sum_cents,
             sum(cents::HUGEINT * cents)::HUGEINT AS ssq
      FROM daily GROUP BY 1),
    tot AS (
      SELECT sum(n_days)::BIGINT AS n, count(*)::BIGINT AS k,
             list_reduce(
               list((n_days::HUGEINT * ssq
                     - sum_cents::HUGEINT * sum_cents)::DOUBLE / n_days
                    ORDER BY dow7),
               (a, x) -> a + x) AS ssw
      FROM g)
    SELECT a.dow7 AS dow_a, b.dow7 AS dow_b, a.n_days AS n_a,
           b.n_days AS n_b,
           abs((1000 * a.sum_cents) // a.n_days
               - (1000 * b.sum_cents) // b.n_days)::BIGINT
             AS diff_millicents,
           round(abs(a.sum_cents::DOUBLE / a.n_days
                     - b.sum_cents::DOUBLE / b.n_days)
                 / nullif(sqrt((t.ssw / nullif(t.n - t.k, 0)) / 2.0
                               * (1.0 / a.n_days + 1.0 / b.n_days)),
                          0.0), 4) AS q_ratio,
           CASE WHEN abs(a.sum_cents::DOUBLE / a.n_days
                         - b.sum_cents::DOUBLE / b.n_days)
                     / nullif(sqrt((t.ssw / nullif(t.n - t.k, 0)) / 2.0
                                   * (1.0 / a.n_days + 1.0 / b.n_days)),
                              0.0) > 4.17
                THEN 1 ELSE 0 END AS significant
    FROM g a JOIN g b ON a.dow7 < b.dow7 CROSS JOIN tot t
    """,
    category="ml",
)
def q_ml_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparisons of weekday mean daily
    revenue — the step AFTER q_ts_weekday_effect's omnibus ANOVA:
    which weekday PAIRS actually differ, with the studentized-range
    multiple-comparison control a per-pair t-test family would blow.
    All 21 weekday pairs: exact mean difference in milli-cents, the
    studentized q ratio |Δmean| / sqrt((MSW/2)(1/n_a + 1/n_b)), and a
    significance flag against the declared critical value
    q(0.05, k=7, df→∞) = 4.17 (literal in the shared formula text).

    Cross-engine exactness: per-weekday n/Σx/Σx² are exact integers
    (Σx² via a wide lane); the within-group sum of squares folds its
    7 per-group exact-integer numerators (n_j·Q_j − S_j²) in EXPLICIT
    dow7 order (the q_ts_weekday_effect fold discipline), and every
    float op after that appears in identical operand order in both
    engines' formula text — identical IEEE bits, so even the
    threshold comparison cannot flip cross-engine. The 4-dp round on
    q_ratio is the belt; diff_millicents is exact integer DIV.

    Scale posture: one map-side-combined day aggregate, a 7-row group
    table self-joined into 21 pair rows with a 1-row total — the
    pair join runs on metadata-scale frames regardless of corpus
    size. No windows over facts, no Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's evaluation/stats family.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(unix_micros(cast(o_orderdate as timestamp))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("day_no")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    g = daily.groupBy(F.expr("day_no % 7").cast("long").alias("dow7")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38, 0)) * cents")).alias("ssq"),
    )
    # SSW = Σ_j (Q_j − S_j²/n_j): each numerator n_j·Q_j − S_j² is an
    # exact wide integer; fold the 7 terms in explicit dow7 order so
    # the double accumulation sequence matches the oracle's
    # list_reduce bit-for-bit (a bare float SUM has no guaranteed
    # partial-merge order across Spark partitions).
    tot = g.agg(
        F.sum("n_days").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.array_sort(
            F.collect_list(F.struct("dow7", "n_days", "sum_cents", "ssq"))
        ).alias("gs"),
    ).selectExpr(
        "n",
        "k",
        "aggregate(gs, 0.0D, (a, x) -> a +"
        " CAST(x.n_days * x.ssq - CAST(x.sum_cents AS DECIMAL(38,0))"
        " * x.sum_cents AS DOUBLE) / x.n_days) AS ssw",
    )
    a = g.select(
        F.col("dow7").alias("dow_a"),
        F.col("n_days").alias("n_a"),
        F.col("sum_cents").alias("s_a"),
    )
    b = g.select(
        F.col("dow7").alias("dow_b"),
        F.col("n_days").alias("n_b"),
        F.col("sum_cents").alias("s_b"),
    )
    pairs = a.join(b, F.col("dow_a") < F.col("dow_b")).crossJoin(tot)
    # nullif: a zero-within-variance corpus (every day in a weekday
    # identical) must read NULL on BOTH engines, not raise (ANSI)
    q_expr = (
        "abs(CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)"
        " / nullif(sqrt((ssw / nullif(n - k, 0)) / 2.0D"
        " * (1.0D / n_a + 1.0D / n_b)), 0.0D)"
    )
    return pairs.selectExpr(
        "dow_a",
        "dow_b",
        "n_a",
        "n_b",
        "CAST(abs((1000 * s_a) DIV n_a - (1000 * s_b) DIV n_b) AS BIGINT)"
        " AS diff_millicents",
        f"round({q_expr}, 4) AS q_ratio",
        f"CASE WHEN {q_expr} > 4.17D THEN 1 ELSE 0 END AS significant",
    )


@register(
    "q_ab_effect_size",
    oracle="""
    WITH s AS (
      SELECT count(*) FILTER (event_type = 'click')::BIGINT AS n1,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sx1,
             sum((round(value * 100)::BIGINT)::HUGEINT
                 * round(value * 100)::BIGINT)
               FILTER (event_type = 'click') AS sxx1,
             count(*) FILTER (event_type = 'purchase')::BIGINT AS n2,
             sum(round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sx2,
             sum((round(value * 100)::BIGINT)::HUGEINT
                 * round(value * 100)::BIGINT)
               FILTER (event_type = 'purchase') AS sxx2
      FROM events
      WHERE event_type IN ('click', 'purchase')),
    v AS (
      SELECT round(value * 100)::BIGINT AS cents,
             count(*) FILTER (event_type = 'click')::BIGINT AS c1,
             count(*) FILTER (event_type = 'purchase')::BIGINT AS c2
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1),
    w AS (
      SELECT c1,
             (2 * (sum(c2) OVER (ORDER BY cents) - c2) + c2)::HUGEINT
               AS below2
      FROM v),
    u AS (SELECT sum(c1::HUGEINT * below2)::HUGEINT AS u2 FROM w),
    d AS (
      SELECT s.n1, s.n2,
             (s.sx1::DOUBLE / s.n1 - s.sx2::DOUBLE / s.n2)
             / nullif(sqrt(((s.sxx1::DOUBLE
                             - (s.sx1::DOUBLE * s.sx1::DOUBLE) / s.n1)
                            + (s.sxx2::DOUBLE
                               - (s.sx2::DOUBLE * s.sx2::DOUBLE) / s.n2))
                           / (s.n1 + s.n2 - 2)), 0.0) AS cohens_d,
             u.u2
      FROM s CROSS JOIN u)
    SELECT n1 AS n_click, n2 AS n_purchase,
           round(cohens_d, 6) AS cohens_d,
           round(cohens_d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6)
             AS hedges_g,
           ((1000000 * u2) // (2::HUGEINT * n1 * n2))::BIGINT AS cles_ppm
    FROM d
    """,
    category="experimentation",
)
def q_ab_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect SIZES for the click-vs-purchase value comparison — the
    numbers a significance test (q_ab_welch_ttest, same arms) does
    not give: Cohen's d on the pooled standard deviation, the
    small-sample Hedges' g correction d·(1 − 3/(4N−9)), and the
    common-language effect size P(click > purchase) + ½P(=) — the
    probability a random click value beats a random purchase value,
    computed EXACTLY from the Mann–Whitney doubled-U over the
    distinct-value histogram (the q_ml_auc rank identity), so the
    most interpretable of the three is also integer-exact in ppm.

    Cross-engine exactness: counts/sums/squares are exact integers
    (squares through wide lanes); d and g are one shared float
    formula over them, rounded at 6 (nullif: zero pooled variance
    reads NULL on both engines); cles_ppm is exact integer DIV —
    the cumulative window runs over the bounded value histogram,
    never event rows.

    Scale posture: one conditional aggregate over the filtered scan,
    one value-histogram aggregate + window (bounded by distinct
    cents), two 1-row frames joined. No fact-table windows, no
    Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this completes SURVEY.md §2.4's experimentation family beside
    welch / CUPED / delta-method / power-MDE.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    cents = "CAST(round(value * 100) AS BIGINT)"
    s = e.agg(
        F.expr("count(CASE WHEN event_type = 'click' THEN 1 END)")
        .cast("long")
        .alias("n1"),
        F.expr(f"sum(CASE WHEN event_type = 'click' THEN {cents} END)")
        .cast("long")
        .alias("sx1"),
        F.expr(
            f"sum(CASE WHEN event_type = 'click' THEN"
            f" CAST({cents} AS DECIMAL(38,0)) * {cents} END)"
        ).alias("sxx1"),
        F.expr("count(CASE WHEN event_type = 'purchase' THEN 1 END)")
        .cast("long")
        .alias("n2"),
        F.expr(f"sum(CASE WHEN event_type = 'purchase' THEN {cents} END)")
        .cast("long")
        .alias("sx2"),
        F.expr(
            f"sum(CASE WHEN event_type = 'purchase' THEN"
            f" CAST({cents} AS DECIMAL(38,0)) * {cents} END)"
        ).alias("sxx2"),
    )
    v = e.groupBy(F.expr(cents).alias("cents")).agg(
        F.expr("count(CASE WHEN event_type = 'click' THEN 1 END)")
        .cast("long")
        .alias("c1"),
        F.expr("count(CASE WHEN event_type = 'purchase' THEN 1 END)")
        .cast("long")
        .alias("c2"),
    )
    cum = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = v.select(
        (
            F.col("c1").cast("decimal(38,0)")
            * (2 * (F.sum("c2").over(cum) - F.col("c2")) + F.col("c2"))
        ).alias("term")
    ).agg(F.sum("term").alias("u2"))
    d_expr = (
        "(CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2)"
        " / nullif(sqrt(((CAST(sxx1 AS DOUBLE)"
        " - (CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) / n1)"
        " + (CAST(sxx2 AS DOUBLE)"
        " - (CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)) / n2))"
        " / (n1 + n2 - 2)), 0.0D)"
    )
    return s.crossJoin(u).selectExpr(
        "n1 AS n_click",
        "n2 AS n_purchase",
        f"round({d_expr}, 6) AS cohens_d",
        f"round({d_expr} * (1.0D - 3.0D / (4.0D * (n1 + n2) - 9.0D)), 6)"
        " AS hedges_g",
        "CAST((1000000 * u2) DIV (CAST(2 AS DECIMAL(38,0)) * n1 * n2)"
        " AS BIGINT) AS cles_ppm",
    )


@register(
    "q_ml_f1_threshold",
    oracle=f"""
    WITH {{clf}},
    test AS (
      SELECT coalesce(t.pred_bp, p.prior_bp) AS score_bp,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents d
      LEFT JOIN train t ON t.bucket = d.n_chars // 100
      CROSS JOIN prior p
      WHERE d.doc_id % 2 = 1),
    hist AS (
      SELECT score_bp, sum(y)::BIGINT AS pos,
             (count(*) - sum(y))::BIGINT AS neg
      FROM test GROUP BY 1),
    tot AS (SELECT sum(pos)::BIGINT AS p FROM hist),
    sweep AS (
      SELECT score_bp AS threshold_bp,
             sum(pos) OVER (ORDER BY score_bp DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)::BIGINT AS tp,
             sum(neg) OVER (ORDER BY score_bp DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)::BIGINT AS fp
      FROM hist),
    scored AS (
      SELECT s.threshold_bp, s.tp, s.fp, (t.p - s.tp)::BIGINT AS fn,
             ((1000000 * 2 * s.tp) // nullif(2 * s.tp + s.fp + t.p - s.tp,
                                             0))::BIGINT AS f1_ppm
      FROM sweep s CROSS JOIN tot t),
    mx AS (SELECT max(f1_ppm) AS m FROM scored),
    best AS (
      SELECT min(threshold_bp)::BIGINT AS best_threshold_bp
      FROM scored, mx WHERE f1_ppm = m)
    SELECT sc.threshold_bp, sc.tp, sc.fp, sc.fn, sc.f1_ppm,
           b.best_threshold_bp,
           CASE WHEN sc.threshold_bp = b.best_threshold_bp
                THEN 1 ELSE 0 END AS is_best
    FROM scored sc CROSS JOIN best b
    """.replace("{clf}", _CLF_ORACLE_CTES.strip()),
    category="ml",
)
def q_ml_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold sweep for the shared histogram classifier
    (q_ml_brier_score's even/odd split — the no-drift rule: every
    evaluator of a model shares its construction): for each distinct
    score, the confusion counts of "predict positive iff
    score ≥ threshold" and the F1 in integer ppm, plus the best
    threshold (max F1, ties to the LOWEST threshold — higher recall
    at equal F1, declared). The step q_ml_pr_auc summarizes away:
    pr-auc ranks models, this picks the OPERATING POINT a production
    filter actually deploys.

    Cross-engine exactness: the sweep runs on the bounded
    distinct-score histogram (cumulative window over score values,
    never documents); TP/FP/FN are exact integers and F1 is ONE
    integer DIV to ppm (nullif for the no-predictions row), so the
    argmax and tie-break are exact integer comparisons.

    Scale posture: one classifier aggregate (bucket-sized), one test
    scan, one score-histogram aggregate, windows over the ≤|distinct
    scores| rows, 1-row best broadcast back. No Python, no hints.

    Reference scope: the reference engine has no ML surface; this
    extends SURVEY.md §2.4's evaluation family beside q_ml_pr_auc,
    q_ml_brier_score and q_ml_mcc.
    """
    d = load_table(spark, sf_dir, "documents")
    train, prior = _histogram_classifier(d)
    test = (
        d.where(F.col("doc_id") % 2 == 1)
        .withColumn("bucket", F.expr("n_chars DIV 100"))
        .join(train, "bucket", "left")
        .crossJoin(prior)
        .selectExpr(
            "coalesce(pred_bp, prior_bp) AS score_bp",
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        )
    )
    hist = test.groupBy("score_bp").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    tot = hist.agg(F.sum("pos").cast("long").alias("p"))
    cum = (
        Window.orderBy(F.col("score_bp").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = hist.select(
        F.col("score_bp").alias("threshold_bp"),
        F.sum("pos").over(cum).cast("long").alias("tp"),
        F.sum("neg").over(cum).cast("long").alias("fp"),
    )
    scored = sweep.crossJoin(tot).selectExpr(
        "threshold_bp",
        "tp",
        "fp",
        "CAST(p - tp AS BIGINT) AS fn",
        "CAST((1000000 * 2 * tp) DIV nullif(2 * tp + fp + p - tp, 0)"
        " AS BIGINT) AS f1_ppm",
    )
    mx = scored.agg(F.max("f1_ppm").alias("max_f1"))
    best = (
        scored.crossJoin(mx)
        .where(F.col("f1_ppm") == F.col("max_f1"))
        .agg(F.min("threshold_bp").cast("long").alias("best_threshold_bp"))
    )
    return scored.crossJoin(best).selectExpr(
        "threshold_bp",
        "tp",
        "fp",
        "fn",
        "f1_ppm",
        "best_threshold_bp",
        "CASE WHEN threshold_bp = best_threshold_bp THEN 1 ELSE 0 END"
        " AS is_best",
    )


@register(
    "q_events_decay_score",
    oracle="""
    WITH e AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000)::BIGINT AS day,
             round(value * 100)::BIGINT AS cents
      FROM events),
    anchor AS (SELECT max(day)::BIGINT AS d1 FROM e),
    w AS (
      SELECT user_id, cents,
             least((a.d1 - day) // 7, 40)::BIGINT AS k
      FROM e CROSS JOIN anchor a)
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           sum(cents)::BIGINT AS raw_cents,
           sum(cents // (1::BIGINT << k))::BIGINT AS decay_cents
    FROM w GROUP BY user_id
    """,
    category="events",
)
def q_events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score per user — the ranking signal
    behind "active customer" lists and churn-risk sorts: every
    event's value counts at full weight in its most recent week and
    HALVES per week of age (half-life = 7 days, anchored at the
    corpus's last day), so one purchase last week outranks four from
    last quarter. The decay is the exact integer lane
    cents DIV 2^weeks_ago (a DECLARED floor per event — no float
    pow, no libm), with the horizon capped at 40 weeks (2⁻⁴⁰ of a
    cent is zero in any currency; the cap also keeps the shift
    BIGINT-safe for arbitrarily old corpora).

    Cross-engine exactness: ages are exact integer day arithmetic
    off a 1-row anchor; the per-event decayed value is integer
    shift-divide on both engines; totals are plain integer sums.
    Nothing to round anywhere.

    Scale posture: one scan, a 1-row max-day broadcast back onto it,
    one map-side-combined user aggregate. At 100 TB this is the
    cheapest shape a per-user score can take: no windows, no joins
    beyond the scalar anchor, no Python.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's events family beside RFM
    segmentation and lifecycle accounting.
    """
    e = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "CAST(unix_micros(cast(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT) AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    anchor = e.agg(F.max("day").cast("long").alias("d1"))
    w = e.crossJoin(anchor).selectExpr(
        "user_id",
        "cents",
        "CAST(least((d1 - day) DIV 7, 40) AS BIGINT) AS k",
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("raw_cents"),
        F.sum(F.expr("cents DIV (CAST(1 AS BIGINT) << k)"))
        .cast("long")
        .alias("decay_cents"),
    )


@register(
    "q_ml_learning_curve",
    oracle="""
    WITH m AS (SELECT unnest([1, 2, 4, 8])::BIGINT AS m8),
    train AS (
      SELECT m.m8, d.n_chars // 100 AS bucket,
             count(*)::BIGINT AS n,
             count(*) FILTER (d.lang = 'en')::BIGINT AS n_en
      FROM documents d JOIN m ON (d.doc_id // 2) % 8 < m.m8
      WHERE d.doc_id % 2 = 0
      GROUP BY 1, 2),
    model AS (
      SELECT m8, bucket, ((10000 * n_en) // n)::BIGINT AS pred_bp
      FROM train),
    prior AS (
      SELECT m8, ((10000 * sum(n_en)) // sum(n))::BIGINT AS prior_bp,
             sum(n)::BIGINT AS n_train
      FROM train GROUP BY 1),
    test AS (
      SELECT p.m8, p.n_train,
             coalesce(mo.pred_bp, p.prior_bp) AS score_bp,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents d
      CROSS JOIN prior p
      LEFT JOIN model mo ON mo.m8 = p.m8
                        AND mo.bucket = d.n_chars // 100
      WHERE d.doc_id % 2 = 1)
    SELECT m8 AS train_frac_8th, n_train,
           count(*)::BIGINT AS n_test,
           ((10000 * sum(CASE WHEN (score_bp >= 5000) = (y = 1)
                              THEN 1 ELSE 0 END)) // count(*))::BIGINT
             AS accuracy_bp
    FROM test GROUP BY 1, 2
    """,
    category="ml",
)
def q_ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve of the shared histogram classifier — accuracy
    on the FIXED odd-doc_id test set as the training set grows
    through nested eighths of the even docs (1/8, 2/8, 4/8, all):
    the data-scaling audit that answers "would more labeled data
    still help" before anyone spends on labeling, and the sanity
    check that the full-data model (m8 = 8) reproduces
    q_ml_brier_score's classifier exactly (same construction, same
    split — the no-drift rule). Subsets nest by (doc_id DIV 2) MOD 8
    < m, so each point trains on a superset of the previous.

    Cross-engine exactness: per-(subset, bucket) counts are exact
    integers; predictions and the prior are integer-bp DIV; the
    decision rule (score ≥ 5000 vs label) and accuracy-bp are exact
    integer comparisons — nothing floats.

    Scale posture: ONE training scan fanned to the 4 subset sizes
    (bounded multiplier, map-side combined into bucket-sized
    models), one test scan fanned 4×, a bucket-sized model join
    (AQE broadcasts), a 4-row report. No windows over facts, no
    Python, no hints.

    Reference scope: the reference engine has no ML surface; this
    extends SURVEY.md §2.4's evaluation family beside q_ml_kfold_cv
    (which resamples FOLDS at fixed size; this scales SIZE at fixed
    split).
    """
    d = load_table(spark, sf_dir, "documents")
    m = spark.range(4).selectExpr(
        "CAST(CASE id WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4"
        " ELSE 8 END AS BIGINT) AS m8"
    )
    train = (
        d.where(F.col("doc_id") % 2 == 0)
        .crossJoin(m)
        .where(F.expr("(doc_id DIV 2) % 8 < m8"))
        .groupBy("m8", F.expr("n_chars DIV 100").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("count(CASE WHEN lang = 'en' THEN 1 END)")
            .cast("long")
            .alias("n_en"),
        )
    )
    model = train.selectExpr(
        "m8", "bucket", "CAST((10000 * n_en) DIV n AS BIGINT) AS pred_bp"
    )
    prior = train.groupBy("m8").agg(
        F.expr("CAST((10000 * sum(n_en)) DIV sum(n) AS BIGINT)").alias(
            "prior_bp"
        ),
        F.sum("n").cast("long").alias("n_train"),
    )
    test = (
        d.where(F.col("doc_id") % 2 == 1)
        .withColumn("bucket", F.expr("n_chars DIV 100"))
        .crossJoin(prior)
        .join(model, ["m8", "bucket"], "left")
        .selectExpr(
            "m8",
            "n_train",
            "coalesce(pred_bp, prior_bp) AS score_bp",
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        )
    )
    return test.groupBy(
        F.col("m8").alias("train_frac_8th"), "n_train"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.expr(
            "CAST((10000 * sum(CASE WHEN (score_bp >= 5000) = (y = 1)"
            " THEN 1 ELSE 0 END)) DIV count(1) AS BIGINT)"
        ).alias("accuracy_bp"),
    )


@register(
    "q_sample_group_holdout",
    oracle="""
    WITH cell AS (
      SELECT source, lang, count(*)::BIGINT AS n
      FROM documents GROUP BY 1, 2),
    src AS (
      SELECT source, sum(n)::BIGINT AS n_src FROM cell GROUP BY 1),
    lg AS (
      SELECT lang, sum(n)::BIGINT AS n_lang FROM cell GROUP BY 1),
    tot AS (SELECT sum(n)::BIGINT AS n FROM cell),
    shift AS (
      SELECT s.source,
             max(abs((10000 * (lg.n_lang - coalesce(c.n, 0)))
                     // nullif(t.n - s.n_src, 0)
                     - (10000 * coalesce(c.n, 0)) // s.n_src))::BIGINT
               AS lang_shift_bp
      FROM src s
      CROSS JOIN tot t
      JOIN lg ON TRUE
      LEFT JOIN cell c ON c.source = s.source AND c.lang = lg.lang
      GROUP BY 1)
    SELECT s.source, (t.n - s.n_src)::BIGINT AS n_train,
           s.n_src AS n_test, sh.lang_shift_bp
    FROM src s CROSS JOIN tot t JOIN shift sh ON sh.source = s.source
    """,
    category="sampling",
)
def q_sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-SOURCE-out holdout audit — the split a contamination
    -aware evaluation must use when documents within a source share
    style/boilerplate (random splits leak the source's fingerprint
    into training; q_llm_split_leakage measures the leak, this
    builds the split that avoids it): for every source, the
    train/test sizes when that source is held out, plus the
    LABEL-SHIFT audit — the worst per-language composition gap
    between train and test in basis points (the q_sample_time_split
    drift discipline applied group-wise). A large shift warns that
    the heldout source is distributionally unlike its training set,
    so its score reads as domain transfer, not i.i.d. accuracy.

    Cross-engine exactness: everything derives from the
    (source, lang) contingency cells — exact integer counts, shares
    as integer-bp DIV (train share = (N_lang − n_cell)/(N − N_src),
    both exact), max over the bounded lang enum.

    Scale posture: one map-side-combined cell aggregate; every
    later frame is enum-sized (sources × languages). The corpus is
    scanned once. No Python, no hints.

    Reference scope: the reference engine has no sampling surface;
    this extends SURVEY.md §2.4's sampling family beside
    q_sample_time_split and q_sample_hash_split.
    """
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    src = cell.groupBy("source").agg(F.sum("n").cast("long").alias("n_src"))
    lg = cell.groupBy("lang").agg(F.sum("n").cast("long").alias("n_lang"))
    tot = cell.agg(F.sum("n").cast("long").alias("n_total"))
    shift = (
        src.crossJoin(tot)
        .crossJoin(lg)
        .join(
            cell.withColumnRenamed("n", "n_cell"), ["source", "lang"], "left"
        )
        .selectExpr(
            "source",
            # nullif: a SINGLE-source corpus has an empty train side;
            # the shift is undefined (NULL), not an ANSI divide error
            "abs((10000 * (n_lang - coalesce(n_cell, 0)))"
            " DIV nullif(n_total - n_src, 0)"
            " - (10000 * coalesce(n_cell, 0)) DIV n_src) AS gap_bp",
        )
        .groupBy("source")
        .agg(F.max("gap_bp").cast("long").alias("lang_shift_bp"))
    )
    return (
        src.crossJoin(tot)
        .join(shift, "source")
        .selectExpr(
            "source",
            "CAST(n_total - n_src AS BIGINT) AS n_train",
            "n_src AS n_test",
            "lang_shift_bp",
        )
    )


@register(
    "q_ml_nelson_aalen",
    oracle="""
    WITH v AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view') AS v_ts,
             max(ts) AS t_max
      FROM events GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND v.v_ts IS NOT NULL
        AND e.ts >= v.v_ts
      GROUP BY e.user_id),
    subj AS (
      SELECT v.user_id,
             ((epoch_us(coalesce(p.p_ts, v.t_max)) - epoch_us(v.v_ts))
              // 86400000000)::BIGINT AS dur,
             CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END AS evt
      FROM v LEFT JOIN p ON p.user_id = v.user_id
      WHERE v.v_ts IS NOT NULL),
    km AS (
      SELECT dur, sum(evt)::BIGINT AS e, count(*)::BIGINT AS leave
      FROM subj GROUP BY dur),
    risk AS (
      SELECT dur, e,
             sum(leave) OVER (ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
               AS n_risk
      FROM km),
    ev AS (SELECT dur, e, n_risk FROM risk WHERE e > 0)
    SELECT dur AS duration_days, n_risk, e AS n_events,
           ((1000000000000::HUGEINT * e) // n_risk)::BIGINT AS hazard_e12,
           sum(((1000000000000::HUGEINT * e) // n_risk)::BIGINT)
             OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             ::BIGINT AS cum_hazard_e12
    FROM ev
    """,
    category="ml",
)
def q_ml_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator of view→purchase
    conversion — the ADDITIVE companion to q_ml_kaplan_meier's
    product-limit curve (same subjects, same censoring rule — the
    shared-construction no-drift discipline): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ.
    Epidemiology and reliability read the hazard directly (its local
    slope IS the conversion intensity, flat stretches are dormancy),
    and at small risk sets it is numerically steadier than
    exp-transforming the KM curve. Per event time: risk-set size,
    events, the per-time hazard increment and the running total —
    both in exact integer 1e-12 units.

    Cross-engine exactness: pure integer counting plus ONE declared
    floor per event time ((1e12·d) DIV n — the q_ml_pinball_loss
    per-term DIV convention); the cumulative sum is an exact integer
    window over the bounded event-time table. Unlike the KM product
    there is no sequential fold at all — the additive estimator is a
    prefix sum, embarrassingly window-shaped.

    Scale posture: one user-keyed aggregate pair (map-side combined),
    a duration-grain aggregate bounded by the observation window,
    and windows only over that value table. No Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this completes SURVEY.md §2.4's survival family beside
    q_ml_kaplan_meier and q_events_lifecycle.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    v = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts"),
        F.max("ts").alias("t_max"),
    )
    p = (
        e.join(v.select("user_id", "v_ts"), "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & F.col("v_ts").isNotNull()
            & (F.col("ts") >= F.col("v_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    subj = (
        v.where(F.col("v_ts").isNotNull())
        .join(p, "user_id", "left")
        .selectExpr(
            "CAST((unix_micros(CAST(coalesce(p_ts, t_max) AS TIMESTAMP))"
            " - unix_micros(CAST(v_ts AS TIMESTAMP))) DIV 86400000000"
            " AS BIGINT) AS dur",
            "CASE WHEN p_ts IS NULL THEN 0 ELSE 1 END AS evt",
        )
    )
    km = subj.groupBy("dur").agg(
        F.sum("evt").cast("long").alias("e"),
        F.count(F.lit(1)).cast("long").alias("leave"),
    )
    tail = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = km.select(
        "dur", "e", F.sum("leave").over(tail).cast("long").alias("n_risk")
    )
    ev = risk.where(F.col("e") > 0)
    cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("e").alias("n_events"),
        F.expr("CAST((1000000000000 * CAST(e AS DECIMAL(38,0))) DIV n_risk"
               " AS BIGINT)").alias("hazard_e12"),
        F.sum(
            F.expr(
                "CAST((1000000000000 * CAST(e AS DECIMAL(38,0))) DIV n_risk"
                " AS BIGINT)"
            )
        )
        .over(cum)
        .cast("long")
        .alias("cum_hazard_e12"),
    )
