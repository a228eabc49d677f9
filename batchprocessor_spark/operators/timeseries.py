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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_win_tumbling",
    oracle="""
    SELECT epoch(date_trunc('day', ts))::BIGINT AS win_start,
           event_type,
           count(*)::BIGINT AS cnt,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    category="timeseries",
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling windows per event type (epoch-aligned, so a day
    window start equals date_trunc('day'))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@register(
    "q_win_sliding",
    oracle="""
    WITH expanded AS (
      SELECT (epoch_us(ts) // 900000000) * 900 - k * 900 AS win_start, value
      FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
    )
    SELECT win_start::BIGINT AS win_start,
           count(*)::BIGINT AS cnt,
           round(sum(value), 2) AS total_value
    FROM expanded
    GROUP BY 1
    """,
    category="timeseries",
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes: each event lands in 4
    overlapping windows. The oracle expands the 4 window starts
    explicitly (floor to the slide grid, step back k slides)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "cnt",
            "total_value",
        )
    )


@register(
    "q_ts_rollup_multires",
    oracle="""
    WITH minute AS (
      SELECT (epoch_us(ts) // 60000000) * 60 AS m_start, event_type,
             count(*) AS cnt, sum(value) AS sv
      FROM events GROUP BY 1, 2),
    hour AS (
      SELECT (m_start // 3600) * 3600 AS h_start, event_type,
             sum(cnt) AS cnt, sum(sv) AS sv
      FROM minute GROUP BY 1, 2)
    SELECT (h_start // 86400) * 86400 AS day_start, event_type,
           sum(cnt)::BIGINT AS cnt,
           round(sum(sv), 2) AS total_value,
           count(*)::BIGINT AS hours_active
    FROM hour GROUP BY 1, 2
    """,
    category="timeseries",
)
def q_ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute → hour → day,
    each level aggregating the PREVIOUS level's partials (never
    re-scanning raw data) — the continuous-aggregate pattern that
    keeps 100 TB of raw events summarizable. Also yields per-day
    active-hour counts only derivable from the intermediate level."""
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 60) * 60).alias("m_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
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
            F.round(F.sum("sv"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("hours_active"),
        )
    )


@register(
    "q_win_session",
    oracle="""
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
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    category="timeseries",
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user.
    Spark's session_window end = last event + gap; the oracle builds
    the same sessions with the classic gaps-and-islands idiom."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("session_start"),
            F.unix_timestamp(F.col("win.end")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
