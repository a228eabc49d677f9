"""Event-time window aggregation (SURVEY.md §2.3): tumbling, sliding,
and session windows over the `events` table.

These use the SAME `F.window`/`F.session_window` operators in batch
mode that Structured Streaming uses with a watermark — the streaming
variants in `streaming/queries.py` reuse these builders on a stream,
which is exactly how the engine keeps batch/stream semantics aligned.

Window starts are emitted as epoch seconds (BIGINT) so the oracle
compare is timezone/precision-proof.
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
    "q_win_tumbling",
    oracle=f"""
    WITH s AS (
      SELECT epoch(date_trunc('day', ts))::BIGINT AS win_start,
             event_type,
             count(*)::BIGINT AS cnt,
             sum({sql_units("value", 100)}) AS sv
      FROM events
      GROUP BY 1, 2)
    SELECT win_start, event_type, cnt, {sql_descale("sv", 100)} AS total_value
    FROM s
    """,
    category="timeseries",
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling windows per event type (epoch-aligned, so a day
    window start equals date_trunc('day')); totals in the exact cents
    lane (functions/exactmath.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("value"), 100)).alias("sv"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type",
            "cnt",
            descale("sv", 100).alias("total_value"),
        )
    )


@register(
    "q_win_sliding",
    oracle=f"""
    WITH expanded AS (
      SELECT (epoch_us(ts) // 900000000) * 900 - k * 900 AS win_start, value
      FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
    ),
    s AS (
      SELECT win_start::BIGINT AS win_start,
             count(*)::BIGINT AS cnt,
             sum({sql_units("value", 100)}) AS sv
      FROM expanded
      GROUP BY 1)
    SELECT win_start, cnt, {sql_descale("sv", 100)} AS total_value FROM s
    """,
    category="timeseries",
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes: each event lands in 4
    overlapping windows. The oracle expands the 4 window starts
    explicitly (floor to the slide grid, step back k slides); totals
    in the exact cents lane."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("value"), 100)).alias("sv"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "cnt",
            descale("sv", 100).alias("total_value"),
        )
    )


@register(
    "q_ts_rollup_multires",
    oracle=f"""
    WITH minute AS (
      SELECT (epoch_us(ts) // 60000000) * 60 AS m_start, event_type,
             count(*) AS cnt, sum({sql_units("value", 100)}) AS sv
      FROM events GROUP BY 1, 2),
    hour AS (
      SELECT (m_start // 3600) * 3600 AS h_start, event_type,
             sum(cnt) AS cnt, sum(sv) AS sv
      FROM minute GROUP BY 1, 2),
    day AS (
      SELECT (h_start // 86400) * 86400 AS day_start, event_type,
             sum(cnt)::BIGINT AS cnt,
             sum(sv) AS sv,
             count(*)::BIGINT AS hours_active
      FROM hour GROUP BY 1, 2)
    SELECT day_start, event_type, cnt,
           {sql_descale("sv", 100)} AS total_value, hours_active
    FROM day
    """,
    category="timeseries",
)
def q_ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute → hour → day,
    each level aggregating the PREVIOUS level's partials (never
    re-scanning raw data) — the continuous-aggregate pattern that
    keeps 100 TB of raw events summarizable. Also yields per-day
    active-hour counts only derivable from the intermediate level.
    Partials carry exact integer cents, which is also what makes the
    re-aggregation exactly associative — a double partial would make
    the rollup depend on the merge tree."""
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 60) * 60).alias("m_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum(to_units(F.col("value"), 100)).alias("sv"))
    )
    hour = (
        minute.groupBy(
            (F.floor(F.col("m_start") / 3600) * 3600).alias("h_start"), "event_type"
        )
        .agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv"))
    )
    return (
        hour.groupBy(
            (F.floor(F.col("h_start") / 86400) * 86400).alias("day_start"), "event_type"
        )
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sv").alias("sv"),
            F.count(F.lit(1)).alias("hours_active"),
        )
        .select(
            "day_start",
            "event_type",
            "cnt",
            descale("sv", 100).alias("total_value"),
            "hours_active",
        )
    )


@register(
    "q_win_session",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT user_id,
           (epoch_us(min(ts)) // 1000000)::BIGINT AS session_start,
           (epoch_us(max(ts)) // 1000000)::BIGINT + 1800 AS session_end,
           count(*)::BIGINT AS n_events,
           {sql_descale(f"sum({sql_units('value', 100)})", 100)} AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    category="timeseries",
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user.
    Spark's session_window end = last event + gap; the oracle builds
    the same sessions with the classic gaps-and-islands idiom; totals
    in the exact cents lane."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(to_units(F.col("value"), 100)).alias("sv"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("session_start"),
            F.unix_timestamp(F.col("win.end")).alias("session_end"),
            "n_events",
            descale("sv", 100).alias("total_value"),
        )
    )


@register(
    "q_ts_gapfill",
    oracle="""
    WITH d AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM d),
                                    (SELECT d0 FROM d) + INTERVAL 1439 MINUTES,
                                    INTERVAL 1 MINUTE)) AS m),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT event_type, date_trunc('minute', ts) AS m,
             count(*)::BIGINT AS cnt,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events WHERE ts < (SELECT d0 FROM d) + INTERVAL 1 DAY
      GROUP BY event_type, date_trunc('minute', ts)),
    filled AS (
      SELECT t.event_type, g.m, coalesce(a.cnt, 0) AS cnt, a.cents
      FROM grid g CROSS JOIN types t
      LEFT JOIN actual a ON a.event_type = t.event_type AND a.m = g.m)
    SELECT event_type,
           (epoch_us(m) // 1000000)::BIGINT AS minute_s,
           cnt,
           coalesce(cents, 0)::BIGINT AS cents,
           coalesce(last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             -1)::BIGINT AS carry_cents
    FROM filled
    """,
    category="timeseries",
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill over the first day: a dense per-minute ×
    per-event-type grid where minutes with no events appear with
    cnt=0 / cents=0, plus a forward-filled "carry" of the last
    observed minute total (-1 until a type's first event) — the
    densification every downstream rolling/interpolation step needs.

    Scale posture: the grid is generated (1440 rows/day × types, no
    scan), actuals are one map-side-combined shuffle, the grid join
    is a broadcast, and the forward fill is a window on the SAME
    (event_type) partitioning. Value totals ride the exact cents
    lane so fills are bit-stable across engines.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d0 = e.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    grid = d0.select(
        F.explode(
            F.sequence(
                F.col("d0"),
                F.col("d0") + F.expr("INTERVAL 1439 MINUTES"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("m")
    )
    types = e.select("event_type").distinct()
    day1 = e.join(F.broadcast(d0), F.col("ts") < F.col("d0") + F.expr("INTERVAL 1 DAY"))
    actual = (
        day1.groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"),
        )
    )
    filled = (
        grid.crossJoin(F.broadcast(types))
        .join(actual, ["event_type", "m"], "left")
        .select(
            "event_type",
            "m",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            "cents",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        F.unix_timestamp("m").alias("minute_s"),
        "cnt",
        F.coalesce("cents", F.lit(0)).alias("cents"),
        F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(-1)).alias(
            "carry_cents"
        ),
    )
