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
from batchprocessor_spark.sources.catalog import load_table, spread_keyed


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
    in the exact cents lane.

    r13 (guide §2.5, VERDICT r12 #1): the r12 unconditional
    REPARTITION_BY_NUM pin (64-task floor) regressed the driver bench
    0.88x at sf0.1 — 64 tiny tasks for a ~3 MB shuffle is scheduling
    overhead. The pin is now SIZE-GATED (spread_keyed): at small
    inputs the plan is the r11 shape (session_window groupBy
    establishes the exchange, AQE sizes it); past 256 MB of source
    the explicit pin keeps the CPU-dense session sort+agg stage
    cluster-wide with a byte-derived width."""
    e = spread_keyed(load_table(spark, sf_dir, "events"), sf_dir, "events", "user_id")
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


@register(
    "q_win_trailing_time",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id,
             (epoch_us(ts) // 1000000)::BIGINT AS ts_s,
             round(value * 100)::BIGINT AS cents
      FROM events)
    SELECT user_id, event_id, ts_s,
           count(*) OVER w AS n_1h,
           (sum(cents) OVER w)::BIGINT AS cents_1h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    category="timeseries",
)
def q_win_trailing_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing TIME-range window per user: for every event, the count
    and value total of that user's events in the preceding hour
    (inclusive). Unlike row frames (q_win_frame) the frame is bounded
    by event-time distance, so bursts widen it and quiet periods
    shrink it — the per-entity rate/sum feature every fraud or
    alerting pipeline computes.

    Scale posture: ONE shuffle on user_id; the RANGE frame runs over
    epoch-seconds (a plain BIGINT ordering both engines frame
    identically), and the sum rides the exact cents lane, so sliding
    evaluation trees cannot produce engine-dependent doubles. No
    self-join — the naive formulation (events ⋈ events within 1 h) is
    quadratic per user; the window form is linear after the sort.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        to_units(F.col("value"), 100).alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3599, 0)
    return e.select(
        "user_id",
        "event_id",
        "ts_s",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )


@register(
    "q_ts_interpolate",
    oracle="""
    WITH d AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM d),
                                    (SELECT d0 FROM d) + INTERVAL 1439 MINUTES,
                                    INTERVAL 1 MINUTE)) AS m),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT event_type, date_trunc('minute', ts) AS m,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events WHERE ts < (SELECT d0 FROM d) + INTERVAL 1 DAY
      GROUP BY event_type, date_trunc('minute', ts)),
    filled AS (
      SELECT t.event_type, g.m, a.cents,
             CASE WHEN a.cents IS NOT NULL THEN g.m END AS obs_m
      FROM grid g CROSS JOIN types t
      LEFT JOIN actual a ON a.event_type = t.event_type AND a.m = g.m),
    bounded AS (
      SELECT event_type, m, cents,
             last_value(obs_m IGNORE NULLS) OVER wp AS prev_m,
             last_value(cents IGNORE NULLS) OVER wp AS prev_c,
             first_value(obs_m IGNORE NULLS) OVER wf AS next_m,
             first_value(cents IGNORE NULLS) OVER wf AS next_c
      FROM filled
      WINDOW wp AS (PARTITION BY event_type ORDER BY m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY m
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type,
           (epoch_us(m) // 1000000)::BIGINT AS minute_s,
           coalesce(cents, -1)::BIGINT AS cents,
           CASE
             WHEN cents IS NOT NULL THEN cents::DOUBLE
             WHEN prev_m IS NULL OR next_m IS NULL THEN -1.0
             ELSE prev_c::DOUBLE
                  + (next_c - prev_c)::DOUBLE
                    * (date_diff('minute', prev_m, m)::DOUBLE
                       / date_diff('minute', prev_m, next_m)::DOUBLE)
           END AS interp_cents
    FROM bounded
    """,
    category="timeseries",
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling over the first day's per-minute
    grid: minutes with no events get the straight-line value between
    the nearest observed minute totals on either side (-1 outside the
    observed range) — the standard time-series densification step
    after gap detection (q_ts_gapfill does zero-fill/LOCF; this is the
    interpolating variant a hypertable exposes as `interpolate()`).

    Scale posture: same shape as q_ts_gapfill — a generated grid
    (1440 × types, no scan), one map-side-combined shuffle for the
    minute totals, a broadcast grid join, then BOTH bounding windows
    run on the SAME (event_type, m) sort: Catalyst plans one Exchange
    + one forward and one backward WindowExec pass. The interpolation
    arithmetic starts from exact integer cents and applies the
    identical IEEE expression on both engines, so the doubles are
    bit-stable.
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
    actual = day1.groupBy("event_type", F.date_trunc("minute", "ts").alias("m")).agg(
        dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents")
    )
    filled = (
        grid.crossJoin(F.broadcast(types))
        .join(actual, ["event_type", "m"], "left")
        .select(
            "event_type",
            "m",
            "cents",
            F.when(F.col("cents").isNotNull(), F.col("m")).alias("obs_m"),
        )
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    bounded = filled.select(
        "event_type",
        "m",
        "cents",
        F.last("obs_m", ignorenulls=True).over(wp).alias("prev_m"),
        F.last("cents", ignorenulls=True).over(wp).alias("prev_c"),
        F.first("obs_m", ignorenulls=True).over(wf).alias("next_m"),
        F.first("cents", ignorenulls=True).over(wf).alias("next_c"),
    )
    minutes_between = lambda a, b: (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(60)
    interp = (
        F.col("prev_c").cast("double")
        + (F.col("next_c") - F.col("prev_c")).cast("double")
        * (
            minutes_between(F.col("prev_m"), F.col("m")).cast("double")
            / minutes_between(F.col("prev_m"), F.col("next_m")).cast("double")
        )
    )
    return bounded.select(
        "event_type",
        F.unix_timestamp("m").alias("minute_s"),
        F.coalesce("cents", F.lit(-1)).cast("long").alias("cents"),
        F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
        .when(F.col("prev_m").isNull() | F.col("next_m").isNull(), F.lit(-1.0))
        .otherwise(interp)
        .alias("interp_cents"),
    )


# EWMA smoothing: alpha = 1/2 makes every weight 2^-j. Scaling all
# weights by 2^(_EWMA_TERMS-1) turns the kernel into INTEGERS
# (2^(19-j)), so the weighted sum accumulates exactly in BIGINT on
# both engines and only ONE float operation remains — the final
# divide by the scaled weight total (2^20 - 1). _EWMA_TERMS lags
# bound the kernel; the dropped tail mass is 2^-20 of the weight.
_EWMA_TERMS = 20
_EWMA_NORM = 2**_EWMA_TERMS - 1  # sum of scaled weights 2^(19-j)


def _ewma_sql_terms() -> str:
    terms = [
        f"coalesce(lag(cents, {j}) OVER w, 0) * {2 ** (_EWMA_TERMS - 1 - j)}"
        for j in range(_EWMA_TERMS)
    ]
    return " + ".join(terms)


@register(
    "q_ts_ewma",
    oracle=f"""
    WITH m AS (
      SELECT event_type, date_trunc('minute', ts) AS minute,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           (epoch_us(minute) // 1000000)::BIGINT AS minute_s,
           cents,
           ({_ewma_sql_terms()})::DOUBLE / {_EWMA_NORM} AS ewma_cents
    FROM m
    WINDOW w AS (PARTITION BY event_type ORDER BY minute)
    """,
    category="timeseries",
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of per-minute
    value totals per event type — the standard trend-smoothing pass
    over a metric series. The recursive EWMA definition is unrolled
    into a 20-term weighted lag sum normalized by the truncated
    weight total (tail mass 2^-20).

    Scale posture: minute totals are one map-side-combined shuffle;
    all 20 lags run over a SINGLE (event_type) window sort — Catalyst
    plans one Exchange + one WindowExec evaluating every lag in the
    same pass. α = 1/2 lets the whole kernel scale to INTEGER weights
    2^(19-j): the weighted sum is exact BIGINT arithmetic (an
    extension of the cents lane — no per-addition double rounding for
    engines to disagree on, where a float kernel diverged by 1 ulp
    between engines), and the single final divide is the same IEEE op
    on both sides. Max magnitude cents·2^19·20 ≈ 1e13, far inside
    BIGINT and double-exact range.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    m = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("minute")
    acc = None
    for j in range(_EWMA_TERMS):
        term = F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * F.lit(
            2 ** (_EWMA_TERMS - 1 - j)
        )
        acc = term if acc is None else acc + term
    return m.select(
        "event_type",
        F.unix_timestamp("minute").alias("minute_s"),
        "cents",
        (acc.cast("double") / F.lit(float(_EWMA_NORM))).alias("ewma_cents"),
    )


# Trailing z-score window: 20 rows (current + 19 preceding).
_Z_N = 20
_Z_FLAG = 2.0


@register(
    "q_ts_zscore_anomaly",
    oracle=f"""
    WITH c AS (
      SELECT event_id, user_id, ts,
             round(value * 100)::BIGINT AS cents
      FROM events),
    w AS (
      SELECT event_id, user_id, cents,
             count(*) OVER win AS n,
             sum(cents) OVER win AS s,
             sum(cents * cents) OVER win AS sq
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_Z_N - 1} PRECEDING AND CURRENT ROW)),
    z AS (
      SELECT event_id, user_id, cents,
             ({_Z_N} * cents - s)::DOUBLE
               * sqrt({_Z_N}::DOUBLE * {_Z_N - 1})
               / ({_Z_N}::DOUBLE * sqrt(({_Z_N} * sq - s * s)::DOUBLE)) AS zval
      FROM w
      WHERE n = {_Z_N} AND {_Z_N} * sq - s * s > 0)
    SELECT event_id, user_id, cents, round(zval, 4) AS z
    FROM z WHERE abs(zval) > {_Z_FLAG}
    """,
    category="timeseries",
)
def q_ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    trailing 20-observation window of its user's value series; |z| > 2
    flagged. The streaming-shaped sibling of q_anomaly_iqr (whose
    fences are global per type).

    Exactness (cross-engine hash gate): the window sums run in the
    integer cents lane (sum ≤ 20·49e3, sum-of-squares ≤ 5e10 — far
    under 2^53), so n·Σx², (Σx)² and n·x−Σx are EXACT integers on both
    engines; z is then derived with the identical IEEE sequence
    (two correctly-rounded sqrt, one multiply, one divide) from those
    integers, making even the unrounded z bit-identical — the > 2
    flag can never disagree at the boundary. One shuffle on user_id;
    the frame is incremental (no per-row rescan)."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_id", "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-(_Z_N - 1), 0)
    )
    n = F.lit(_Z_N)
    w = c.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cents").over(win).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("sq"),
    )
    var_n = n * F.col("sq") - F.col("s") * F.col("s")
    zval = (
        (n * F.col("cents") - F.col("s")).cast("double")
        * F.sqrt(n.cast("double") * F.lit(_Z_N - 1))
        / (n.cast("double") * F.sqrt(var_n.cast("double")))
    )
    return (
        w.where((F.col("n") == _Z_N) & (var_n > 0))
        .select("event_id", "user_id", "cents", zval.alias("zval"))
        .where(F.abs("zval") > _Z_FLAG)
        .select("event_id", "user_id", "cents", F.round("zval", 4).alias("z"))
    )


@register(
    "q_ts_twap",
    oracle="""
    WITH seg AS (
      SELECT event_type,
             round(value * 100)::BIGINT AS cents,
             epoch_us(lead(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events),
    agg AS (
      SELECT event_type,
             count(*)::BIGINT AS n_segments,
             sum(cents * dur_us) AS num,
             sum(dur_us) AS den
      FROM seg WHERE dur_us IS NOT NULL
      GROUP BY 1)
    SELECT event_type, n_segments,
           (den // 1000000)::BIGINT AS total_s,
           (num // den)::DOUBLE + (num % den)::DOUBLE / den::DOUBLE
             AS twap_cents
    FROM agg
    """,
    category="timeseries",
)
def q_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is
    weighted by how long it remained current (microseconds until the
    next observation of the same type); the open last segment is
    excluded. The canonical irregular-series average that a plain
    avg() gets wrong.

    Exactness: per-segment products cents·dur_us (≤1.3e17) fit a
    long; the accumulators are decimal(38,0) so 100 TB sums cannot
    overflow; and the final weighted mean is emitted via the integer
    DIV/MOD descale (quotient ≤ max cents, remainder < den < 2^53 —
    each exactly representable, same IEEE sequence both engines), so
    the double is bit-identical WITHOUT rounding even though num
    itself exceeds 2^53. One shuffle on event_type shared by the
    lead() window and the aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # timestampdiff works on TIMESTAMP_NTZ (the parquet-resolved type)
    # and is timezone-independent, unlike unix_micros.
    seg = (
        e.select(
            "event_type",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .select(
            "event_type",
            "cents",
            F.expr("timestampdiff(MICROSECOND, ts, next_ts)").alias("dur_us"),
        )
        .where(F.col("dur_us").isNotNull())
    )
    agg = seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_segments"),
        dec_sum(F.col("cents") * F.col("dur_us")).alias("num"),
        dec_sum(F.col("dur_us")).alias("den"),
    )
    return agg.select(
        "event_type",
        "n_segments",
        F.expr("CAST(den DIV 1000000 AS BIGINT)").alias("total_s"),
        (
            F.expr("CAST(num DIV den AS DOUBLE)")
            + F.expr("CAST(num % den AS DOUBLE)") / F.expr("CAST(den AS DOUBLE)")
        ).alias("twap_cents"),
    )


@register(
    "q_ts_downsample_m4",
    oracle="""
    WITH c AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bucket,
             round(value * 100)::BIGINT AS cents,
             printf('%020d-%020d', epoch_us(ts), event_id) AS ord
      FROM events)
    SELECT event_type,
           (epoch_us(bucket) // 1000000)::BIGINT AS bucket_s,
           count(*)::BIGINT AS n,
           min(cents) AS min_cents,
           max(cents) AS max_cents,
           arg_min(cents, ord) AS first_cents,
           arg_max(cents, ord) AS last_cents
    FROM c GROUP BY 1, 2
    """,
    category="timeseries",
)
def q_ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, time
    bucket) keep min, max, first and last — the four points that make
    a line-chart rendering of the bucket pixel-exact, the standard
    lossy-but-visually-lossless reduction for shipping billions of
    points to a dashboard.

    One partial+final hash aggregate — min/max/min_by/max_by all fold
    map-side, so the shuffle carries 4 values per (series, bucket)
    regardless of input size. first/last are deterministic via the
    (ts, event_id) total order encoded as a fixed-width string key —
    20 digits per field, the full non-negative BIGINT width, so
    lexicographic = numeric for any epoch-micros/id the engine can
    hold (a compound struct key would be cleaner but DuckDB's arg_min
    rejects non-scalar keys); bare first()/last() would be
    partition-order dependent and fail the cross-engine hash gate.
    Precondition (asserted nowhere cheaper than here): both fields
    non-negative — pre-1970 timestamps would need an offset."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        # ts arrives TIMESTAMP_NTZ from parquet; unix_micros requires
        # TIMESTAMP, hence the cast (UTC session ⇒ same instant).
        F.format_string(
            "%020d-%020d", F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id")
        ).alias("ord"),
    )
    return (
        c.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.min_by("cents", "ord").alias("first_cents"),
            F.max_by("cents", "ord").alias("last_cents"),
        )
        .select(
            "event_type",
            F.expr("unix_micros(bucket) DIV 1000000").alias("bucket_s"),
            "n",
            "min_cents",
            "max_cents",
            "first_cents",
            "last_cents",
        )
    )


@register(
    "q_ts_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    trended AS (
      SELECT event_type, h, cents,
             sum(cents) OVER win AS wsum,
             count(*) OVER win AS wn
      FROM hourly
      WINDOW win AS (PARTITION BY event_type ORDER BY h
                     RANGE BETWEEN INTERVAL 12 HOUR PRECEDING
                           AND INTERVAL 11 HOUR FOLLOWING)),
    detrended AS (
      SELECT event_type, h, cents,
             wsum::DOUBLE / wn AS trend,
             cents - wsum::DOUBLE / wn AS dev
      FROM trended WHERE wn >= 18),
    seasonal AS (
      SELECT event_type, extract(hour FROM h) AS hod,
             round(avg(dev), 6) AS s
      FROM detrended GROUP BY 1, 2)
    SELECT d.event_type,
           (epoch_us(d.h) // 1000000)::BIGINT AS hour_s,
           d.cents,
           round(d.trend, 6) AS trend,
           s.s AS seasonal,
           round(d.dev - s.s, 6) AS residual
    FROM detrended d
    JOIN seasonal s
      ON d.event_type = s.event_type AND extract(hour FROM d.h) = s.hod
    """,
    category="timeseries",
)
def q_ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (classical moving-average
    method): hourly series per event type split into trend (centered
    24-wall-clock-hour moving mean over the hours present (>= 18 of
    24 required — gap-tolerant, never spanning beyond the day)), hour-of-day
    seasonal profile (mean detrended deviation), and residual — the
    anomaly-detection preprocessor that separates "3am is always
    quiet" from "this 3am is anomalous".

    Exactness: hourly sums are integer cents; the window trend is
    exact-int-sum / exact-count — ONE IEEE divide, bit-identical cross-engine
    with no rounding; the seasonal mean averages doubles whose order
    differs between engines, so it (and the residual built from it)
    round to 6 dp. The trend window is a RANGE frame over event time
    (±12/11 wall-clock hours) with wn >= 18 required, NOT a ROWS frame:
    with hourly gaps a 24-ROW frame silently spans more than 24
    wall-clock hours and misaligns the hour-of-day profile near gaps —
    a both-engines-agree-on-the-wrong-value bug the parity gate cannot
    see. Shape: one event_type exchange shared by the window and the
    hourly rollup, a tiny (type × 24) seasonal table joined back
    broadcast."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    # RANGE frame on epoch seconds (hour grain, so second == hour/3600).
    # cast: h is NTZ whenever ts resolves NTZ (date_trunc preserves it)
    # and unix_micros rejects NTZ — same guard as q_ts_downsample_m4.
    win = (
        Window.partitionBy("event_type")
        .orderBy(F.expr("unix_micros(cast(h as timestamp)) DIV 1000000"))
        .rangeBetween(-12 * 3600, 11 * 3600)
    )
    trended = hourly.select(
        "event_type",
        "h",
        "cents",
        F.sum("cents").over(win).alias("wsum"),
        F.count(F.lit(1)).over(win).alias("wn"),
    )
    detrended = trended.where(F.col("wn") >= 18).select(
        "event_type",
        "h",
        "cents",
        (F.col("wsum").cast("double") / F.col("wn")).alias("trend"),
        (F.col("cents") - F.col("wsum").cast("double") / F.col("wn")).alias("dev"),
    )
    seasonal = (
        detrended.groupBy("event_type", F.hour("h").alias("hod"))
        .agg(F.round(F.avg("dev"), 6).alias("s"))
    )
    return (
        detrended.withColumn("hod", F.hour("h"))
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            F.expr("unix_micros(cast(h as timestamp)) DIV 1000000").alias("hour_s"),
            "cents",
            F.round("trend", 6).alias("trend"),
            F.col("s").alias("seasonal"),
            F.round(F.col("dev") - F.col("s"), 6).alias("residual"),
        )
    )


@register(
    "q_ts_cross_correlation",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                    (SELECT h1 FROM bounds),
                                    INTERVAL 1 HOUR)) AS h),
    v AS (SELECT h, count(*)::BIGINT AS c FROM b
          WHERE event_type = 'view' GROUP BY h),
    p AS (SELECT h, count(*)::BIGINT AS c FROM b
          WHERE event_type = 'purchase' GROUP BY h),
    sv AS (SELECT g.h, coalesce(v.c, 0) AS x FROM grid g LEFT JOIN v ON v.h = g.h),
    sp AS (SELECT g.h, coalesce(p.c, 0) AS y FROM grid g LEFT JOIN p ON p.h = g.h),
    lags AS (SELECT unnest(range(6))::BIGINT AS lag_h),
    joined AS (
      SELECT l.lag_h, sv.x, sp.y
      FROM lags l
      JOIN sv ON TRUE
      JOIN sp ON sp.h = sv.h + to_hours(l.lag_h)),
    m AS (
      SELECT lag_h, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
      FROM joined GROUP BY lag_h)
    SELECT lag_h, n,
           round((n * sxy - sx * sy)::DOUBLE
                 / (sqrt((n * sxx - sx * sx)::DOUBLE)
                    * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS r
    FROM m
    """,
    category="timeseries",
)
def q_ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly 'view' and
    'purchase' count series (lags 0–5 h, view leading) — the
    lead/lag discovery a metrics pipeline runs to find which signal
    anticipates which. Series are densified onto the full hourly grid
    (missing hours count 0) so alignment is positional in TIME, not
    in observation index.

    Exactness: all five moment sums (Σx, Σy, Σxy, Σx², Σy²) are
    integers (window-free, one map-side-combined aggregate per lag),
    so Pearson r reduces to ONE float expression over exact integers
    — bit-identical cross-engine, rounded at 6 dp. Shape: the grid is
    generated, counts are one shuffle each, the lag join is an equi
    join on the shifted hour, and the final aggregate is 6 groups."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    b = e.select("event_type", F.date_trunc("hour", "ts").alias("h"))
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    v = b.where(F.col("event_type") == "view").groupBy("h").agg(
        F.count(F.lit(1)).alias("c")
    )
    p = b.where(F.col("event_type") == "purchase").groupBy("h").agg(
        F.count(F.lit(1)).alias("c")
    )
    sv = grid.join(v, "h", "left").select("h", F.coalesce("c", F.lit(0)).alias("x"))
    sp = grid.join(p, "h", "left").select(
        F.col("h").alias("hp"), F.coalesce("c", F.lit(0)).alias("y")
    )
    lags = spark.range(6).select(F.col("id").alias("lag_h"))
    joined = (
        sv.crossJoin(F.broadcast(lags))
        .join(
            sp,
            F.col("hp")
            == F.col("h") + F.expr("make_interval(0, 0, 0, 0, lag_h)"),
        )
    )
    m = joined.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "lag_h", "n", F.round(num / (F.sqrt(d1) * F.sqrt(d2)), 6).alias("r")
    )


@register(
    "q_ts_changepoint",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             round(value * 100)::BIGINT AS cents
      FROM events),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                    (SELECT h1 FROM bounds),
                                    INTERVAL 1 HOUR)) AS h),
    hourly AS (
      SELECT event_type, h, sum(cents)::BIGINT AS cents
      FROM b GROUP BY 1, 2),
    dense AS (
      SELECT t.event_type, g.h, coalesce(x.cents, 0) AS cents
      FROM grid g
      CROSS JOIN (SELECT DISTINCT event_type FROM b) t
      LEFT JOIN hourly x ON x.event_type = t.event_type AND x.h = g.h),
    pre AS (
      SELECT event_type, h,
             sum(cents) OVER (PARTITION BY event_type ORDER BY h
                              ROWS UNBOUNDED PRECEDING)::BIGINT AS s,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS t,
             sum(cents) OVER (PARTITION BY event_type)::BIGINT AS stot,
             count(*) OVER (PARTITION BY event_type)::BIGINT AS n
      FROM dense),
    stats AS (
      SELECT event_type, h, n,
             abs(s::DOUBLE / t - (stot - s)::DOUBLE / (n - t))
             * sqrt(t::DOUBLE * (n - t) / n) AS stat
      FROM pre WHERE t < n)
    SELECT event_type,
           (epoch_us(h) // 1000000)::BIGINT AS cp_hour_s,
           round(stat, 6) AS stat, n FROM (
      SELECT event_type, h, n, stat,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY stat DESC, h) AS rn
      FROM stats) WHERE rn = 1
    """,
    category="timeseries",
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type (binary
    segmentation / scaled CUSUM form): over the DENSE hourly series
    of value totals, score every split point with the weighted mean
    shift |mean_left − mean_right| · sqrt(t·(n−t)/n) and report the
    argmax hour — the drift monitor a metrics pipeline runs per
    series. Densification matters: gap hours are real zeros; scoring
    only observed hours would shift every split index.

    Exactness: prefix/total sums are window sums over integer cents
    (exact); each split's statistic derives from those integers via
    the identical IEEE expression on both engines, so the argmax
    (tie-broken on earliest hour) cannot disagree. Shape: one
    event_type exchange shared by the windows, grid generated, no
    driver data path; the argmax is a WindowGroupLimit rn=1."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    b = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        to_units(F.col("value"), 100).alias("cents"),
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    hourly = b.groupBy("event_type", "h").agg(
        dec_sum(F.col("cents")).cast("long").alias("cents")
    )
    types = b.select("event_type").distinct()
    dense = (
        grid.crossJoin(F.broadcast(types))
        .join(hourly, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    wcum = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    pre = dense.select(
        "event_type",
        "h",
        F.sum("cents").over(wcum).cast("long").alias("s"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("h")).alias("t"),
        F.sum("cents").over(wall).cast("long").alias("stot"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    )
    stat = F.abs(
        F.col("s").cast("double") / F.col("t")
        - (F.col("stot") - F.col("s")).cast("double") / (F.col("n") - F.col("t"))
    ) * F.sqrt(F.col("t").cast("double") * (F.col("n") - F.col("t")) / F.col("n"))
    stats = pre.where(F.col("t") < F.col("n")).select(
        "event_type", "h", "n", stat.alias("stat")
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.col("stat").desc(), "h")
    )
    return (
        stats.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.expr("unix_micros(cast(h as timestamp)) DIV 1000000").alias("cp_hour_s"),
            F.round("stat", 6).alias("stat"),
            "n",
        )
    )


@register(
    "q_ts_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id, round(value * 100)::BIGINT AS cents
      FROM events),
    med AS (
      SELECT event_type, median(cents) AS med FROM v GROUP BY event_type),
    dev AS (
      SELECT v.event_type, v.event_id, v.cents, m.med,
             abs(v.cents - m.med) AS adev
      FROM v JOIN med m ON m.event_type = v.event_type),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type,
           count(*)::BIGINT AS n,
           round(max(d.med), 1) AS median_c,
           round(max(m.mad), 1) AS mad_c,
           sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
    category="timeseries",
)
def q_ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via Median Absolute
    Deviation: |x − median| > 3·1.4826·MAD — the heavy-tail-safe
    complement to the IQR fences (q_anomaly_iqr) and the rolling
    z-score (q_ts_zscore_anomaly), which a metrics pipeline prefers
    when a few extreme points would poison mean/stddev.

    Exactness: values ride the integer cents lane; medians of
    integers interpolate at most one midpoint (x.5, exact in double),
    so med/MAD are bit-identical cross-engine; the 3·1.4826·MAD
    threshold is one IEEE product both engines compute identically
    and the outlier decision is a comparison of exact quantities.
    Shape: two per-group medians (Spark's median = exact percentile
    agg — one shuffle each on event_type) + broadcast joins of the
    5-row med/MAD tables back onto events; the flag count is
    map-side combined."""
    v = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", to_units(F.col("value"), 100).alias("cents")
    )
    med = v.groupBy("event_type").agg(F.median("cents").alias("med"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "cents",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 1).alias("median_c"),
            F.round(F.max("mad"), 1).alias("mad_c"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "q_ts_period_over_period",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             date_trunc('month', o_orderdate) AS month,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY 1, 2),
    w AS (
      SELECT priority, month, cents,
             lag(cents) OVER (PARTITION BY priority ORDER BY month)
               AS prev_cents
      FROM m)
    SELECT priority, month, cents, prev_cents,
           CASE WHEN prev_cents > 0 THEN
             (CASE WHEN cents >= prev_cents THEN 1 ELSE -1 END)
             * ((10000 * abs(cents - prev_cents)) // prev_cents)
           END::BIGINT AS mom_bp
    FROM w
    """,
    category="timeseries",
)
def q_ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — monthly revenue per order priority
    with the month-over-month delta in signed basis points: the
    aggregate-then-window composite behind every KPI dashboard
    ("-12.3% vs last month"), stated window-over-AGGREGATE so the lag
    runs over (priority × month) rows, never the fact table (the
    q_win_ratio_to_report discipline).

    Exactness: revenue is integer cents, and the growth rate is
    sign · (10000·|Δ|) DIV prev — |Δ| keeps the integer division on
    non-negative operands, where DuckDB's flooring `//` and Spark's
    truncating `div` agree (on a negative numerator they differ by
    one unit; the decomposition makes the disagreement unreachable).
    First month emits NULL, canonicalized identically.

    Scale posture: one map-side-combined aggregate to months × 5
    rows; the window shuffles only that rollup. The fact scan reads
    two columns plus the pushed date."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("cents"))
    )
    w = Window.partitionBy("priority").orderBy("month")
    out = m.withColumn("prev_cents", F.lag("cents").over(w))
    return out.select(
        "priority",
        "month",
        "cents",
        "prev_cents",
        F.when(
            F.col("prev_cents") > 0,
            F.when(F.col("cents") >= F.col("prev_cents"), 1)
            .otherwise(-1)
            * F.expr("(10000 * abs(cents - prev_cents)) div prev_cents"),
        )
        .cast("long")
        .alias("mom_bp"),
    )


@register(
    "q_ts_acf",
    oracle="""
    WITH b AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS d),
    rev AS (SELECT d, sum(cents)::BIGINT AS c FROM b GROUP BY d),
    s AS (SELECT g.d, coalesce(r.c, 0)::BIGINT AS x
          FROM grid g LEFT JOIN rev r ON r.d = g.d),
    lags AS (SELECT unnest([1, 2, 7, 14])::BIGINT AS lag_d),
    joined AS (
      SELECT l.lag_d, a.x, b2.x AS y
      FROM lags l
      JOIN s a ON TRUE
      JOIN s b2 ON b2.d = a.d + to_days(l.lag_d::INT)),
    m AS (
      SELECT lag_d, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x::HUGEINT * y::HUGEINT) AS sxy,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(y::HUGEINT * y::HUGEINT) AS syy
      FROM joined GROUP BY lag_d)
    SELECT lag_d, n,
           round((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
                 / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE)
                    * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE)),
                 6) AS acf
    FROM m
    """,
    category="timeseries",
)
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the DAILY revenue series at lags 1, 2, 7 and
    14 days — the seasonality detector (a lag-7 spike says the series
    has weekly structure; the forecasting/anomaly stack conditions on
    it). The series is densified onto the full daily grid (missing
    days are genuine zeros, not gaps), so lag alignment is positional
    in TIME — the q_ts_cross_correlation discipline applied to a
    series against itself at horizon lags.

    Exactness: the five moment sums are exact integers (decimal
    accumulators — daily cents reach ~1e9 and squared products
    ~1e18·days overflow BIGINT well inside real retention windows),
    and Pearson r is one identical float expression over them,
    rounded at 6.

    Scale posture: one aggregate to the |days|-row series, one
    broadcast of the 4-row lag table, an equi-join on the shifted
    day, a 4-group aggregate. The fact table is scanned once."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("d"),
        to_units(F.col("o_totalprice"), 100).alias("cents"),
    )
    bounds = o.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    rev = o.groupBy("d").agg(F.sum("cents").alias("c"))
    s = grid.join(rev, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    lags = spark.createDataFrame([(1,), (2,), (7,), (14,)], "lag_d BIGINT")
    s2 = s.select(F.col("d").alias("dp"), F.col("x").alias("y"))
    joined = s.crossJoin(F.broadcast(lags)).join(
        s2,
        F.col("dp") == F.col("d") + F.expr("make_interval(0, 0, 0, lag_d)"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = joined.groupBy("lag_d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
    )
    num = (dec(F.col("n")) * F.col("sxy") - dec(F.col("sx")) * dec(F.col("sy"))).cast(
        "double"
    )
    d1 = (dec(F.col("n")) * F.col("sxx") - dec(F.col("sx")) * dec(F.col("sx"))).cast(
        "double"
    )
    d2 = (dec(F.col("n")) * F.col("syy") - dec(F.col("sy")) * dec(F.col("sy"))).cast(
        "double"
    )
    return m.select(
        "lag_d", "n", F.round(num / (F.sqrt(d1) * F.sqrt(d2)), 6).alias("acf")
    )


@register(
    "q_ts_resample_ohlc",
    oracle="""
    WITH c AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hr,
             round(value * 100)::BIGINT AS cents,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_asc,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_desc
      FROM events)
    SELECT event_type,
           (epoch_us(hr) // 1000000)::BIGINT AS hour_s,
           max(CASE WHEN rn_asc = 1 THEN cents END)::BIGINT AS open_c,
           max(cents)::BIGINT AS high_c,
           min(cents)::BIGINT AS low_c,
           max(CASE WHEN rn_desc = 1 THEN cents END)::BIGINT AS close_c,
           count(*)::BIGINT AS volume
    FROM c GROUP BY event_type, hr
    """,
    category="timeseries",
)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each event-type's value series to hourly OHLC bars
    (open/high/low/close + volume) — the canonical resampling shape
    for metrics dashboards and financial rollups.

    Open/close need the FIRST and LAST value in event-time order:
    a total order via (ts, event_id) feeds two row_number windows
    over the SAME (event_type, hour) partitioning, so Catalyst plans
    ONE exchange; open/close then fall out of the bucket aggregate
    as conditional maxes — no second scan, no self-join, no min_by
    tie-break ambiguity (min_by/arg_min pick arbitrarily among equal
    ordering keys; the explicit row_number tie-break is
    engine-deterministic). Values ride the integer cents lane.

    Scale posture: one shuffle on (type, hour), per-bucket state is
    O(1), output is (types × hours) rows. At 100 TB with a
    date-partitioned fact the exchange is partition-local.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        to_units(F.col("value"), 100).alias("cents"),
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("event_type", "hr").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    c = e.select(
        "event_type",
        "hr",
        "cents",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return c.groupBy("event_type", "hr").agg(
        F.max(F.when(F.col("rn_asc") == 1, F.col("cents"))).alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max(F.when(F.col("rn_desc") == 1, F.col("cents"))).alias("close_c"),
        F.count(F.lit(1)).alias("volume"),
    ).select(
        "event_type",
        F.unix_timestamp("hr").cast("long").alias("hour_s"),
        "open_c",
        "high_c",
        "low_c",
        "close_c",
        "volume",
    )


@register(
    "q_ts_sax",
    oracle="""
    WITH b AS (
      SELECT (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day_no,
             round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    seg AS (
      SELECT ((day_no - (SELECT min(day_no) FROM b)) // 30)::BIGINT AS segment_id,
             count(DISTINCT day_no)::BIGINT AS n_days,
             sum(cents)::BIGINT AS sum_cents
      FROM b GROUP BY segment_id),
    sym AS (
      SELECT segment_id, n_days, sum_cents,
             ntile(4) OVER (ORDER BY sum_cents::DOUBLE / n_days, segment_id)
               AS q
      FROM seg)
    SELECT segment_id, n_days, sum_cents,
           substr('abcd', q, 1) AS symbol
    FROM sym
    ORDER BY segment_id
    """,
    category="timeseries",
)
def q_ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of the daily-revenue
    series — the time-series indexing/motif-discovery primitive:
    Piecewise Aggregate Approximation (30-day segment means over
    exact integer cents) followed by equal-frequency quartile
    symbols 'a'..'d'. The alphabet assignment uses ntile over the
    SEGMENT table with a deterministic total order (mean, then
    segment_id — the mean is ONE IEEE division of exact integers, so
    the sort key is bit-identical cross-engine); empirical
    equal-frequency breakpoints replace the classic Gaussian table,
    which keeps every step exact instead of depending on a float
    normal quantile.

    Scale posture: one aggregate from the fact scan to the bounded
    segment table (|days|/30 rows at any SF); the ntile window runs
    over that table only — the value-table window discipline. The
    min-day offset is a 1-row broadcast subquery."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
        .cast("long")
        .alias("day_no"),
        to_units(F.col("o_totalprice"), 100).alias("cents"),
    )
    d0 = o.agg(F.min("day_no").alias("d0"))
    seg = (
        o.crossJoin(F.broadcast(d0))
        .select(
            F.expr("(day_no - d0) DIV 30").cast("long").alias("segment_id"),
            "day_no",
            "cents",
        )
        .groupBy("segment_id")
        .agg(
            F.count_distinct(F.col("day_no")).alias("n_days"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    w = Window.orderBy(
        F.col("sum_cents").cast("double") / F.col("n_days"), F.col("segment_id")
    )
    return (
        seg.select(
            "segment_id",
            "n_days",
            "sum_cents",
            F.ntile(4).over(w).alias("q"),
        )
        .select(
            "segment_id",
            "n_days",
            "sum_cents",
            F.substring(F.lit("abcd"), F.col("q"), 1).alias("symbol"),
        )
        .orderBy("segment_id")
    )


@register(
    "q_ts_holt",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    f AS (
      SELECT event_type, rn, n,
             cents::DOUBLE AS l, 0.0::DOUBLE AS b
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.event_type, o.rn, o.n,
             0.5 * o.cents::DOUBLE + 0.5 * (f.l + f.b),
             0.5 * ((0.5 * o.cents::DOUBLE + 0.5 * (f.l + f.b)) - f.l)
               + 0.5 * f.b
      FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn + 1)
    SELECT event_type, n::BIGINT AS n_days,
           l AS level, b AS trend, l + b AS forecast_next
    FROM f WHERE rn = n
    """,
    category="timeseries",
)
def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend,
    α = β = 1/2) over the per-day value totals of each event type,
    emitting the final smoothed level, trend, and one-step forecast —
    the classic short-horizon forecaster a metrics warehouse runs per
    series. Unlike q_ts_ewma (whose single-state recursion unrolls
    into a lag-weighted window sum), the two-state Holt recursion has
    no fixed-depth unrolling, so the engine folds each series with
    `F.aggregate` over its time-ordered day array and the oracle runs
    the IDENTICAL recurrence as a recursive CTE. Exactness: cents are
    exact integers; α = β = 1/2 makes every multiplication an exact
    halving, and the adds/subtracts appear in the same operand order
    in both engines' formula text — bit-identical doubles, no rounding
    lanes needed (the shared-formula discipline of
    q_ml_linreg_normal_eq, extended to a sequential fold).

    Scale posture: one map-side-combined day aggregate, then
    collect_list per series — state is O(days-per-series) (~30 here,
    bounded by retention in production), never O(events); the fold is
    a single catalyst higher-order function, JVM-side, no Python. One
    exchange on event_type total. A 100 TB deployment runs this per
    (metric, entity) key with millions of independent series — the
    same plan, embarrassingly parallel across keys."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    series = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("xs")
    )
    y = lambda x: x["cents"].cast("double")  # noqa: E731
    l_new = lambda acc, x: F.lit(0.5) * y(x) + F.lit(0.5) * (  # noqa: E731
        acc["l"] + acc["b"]
    )
    state = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at("xs", 1)["cents"].cast("double").alias("l"),
            F.lit(0.0).alias("b"),
        ),
        lambda acc, x: F.struct(
            l_new(acc, x).alias("l"),
            (
                F.lit(0.5) * (l_new(acc, x) - acc["l"])
                + F.lit(0.5) * acc["b"]
            ).alias("b"),
        ),
    )
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + state["b"]).alias("forecast_next"),
    )


@register(
    "q_ts_holt_winters",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    f AS (
      SELECT event_type, rn, n,
             cents::DOUBLE AS l, 0.0::DOUBLE AS b,
             [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS s
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.event_type, o.rn, o.n,
             0.5 * (o.cents::DOUBLE - f.s[1]) + 0.5 * (f.l + f.b),
             0.5 * ((0.5 * (o.cents::DOUBLE - f.s[1]) + 0.5 * (f.l + f.b))
                    - f.l) + 0.5 * f.b,
             f.s[2:7] || [0.5 * (o.cents::DOUBLE
                    - (0.5 * (o.cents::DOUBLE - f.s[1]) + 0.5 * (f.l + f.b)))
                  + 0.5 * f.s[1]]
      FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn + 1)
    SELECT event_type, n::BIGINT AS n_days,
           l AS level, b AS trend, s[1] AS s_next,
           l + b + s[1] AS forecast_next
    FROM f WHERE rn = n
    """,
    category="timeseries",
)
def q_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters TRIPLE exponential smoothing (level +
    trend + weekly seasonality, m = 7, α = β = γ = 1/2) per
    event-type day series — completing the smoothing ladder beside
    q_ts_ewma (single) and q_ts_holt (double). Emits the final
    level/trend, the next season slot, and the one-step forecast
    l + b + s_{t+1-m}.

    The seasonal state rides as a 7-slot QUEUE: s[1] is always the
    value from m steps ago (what the recurrence consumes), and each
    step pops the head and appends the updated seasonal —
    slice(s, 2, 6) || [s_t] — so neither engine needs indexed list
    writes. Conventions stated once and shared: zero-initialized
    seasonals, l_0 = x_0, b_0 = 0,
    l_t = ½(x_t − s_{t−m}) + ½(l_{t−1} + b_{t−1}),
    b_t = ½(l_t − l_{t−1}) + ½ b_{t−1},
    s_t = ½(x_t − l_t) + ½ s_{t−m}.

    Cross-engine exactness: cents are exact integers; α = β = γ = ½
    makes every multiplication an exact halving and every state a
    dyadic rational, and adds/subtracts share operand order between
    the Spark fold and the recursive-CTE oracle — bit-identical
    doubles end-to-end (the q_ts_holt discipline extended to vector
    state).

    Scale posture: one map-side-combined day aggregate, then
    collect_list per series (state O(days-per-series), never
    O(events)); the fold is one catalyst higher-order function,
    JVM-side, no Python, one exchange on event_type. At 100 TB this
    runs per (metric, entity) key — embarrassingly parallel across
    millions of independent series.

    Reference scope: the reference engine has no time-series surface;
    this extends SURVEY.md §2.4's analytics family.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    series = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("xs")
    )
    y = lambda x: x["cents"].cast("double")  # noqa: E731
    half = F.lit(0.5)
    l_new = lambda acc, x: half * (y(x) - F.element_at(acc["s"], 1)) + half * (  # noqa: E731
        acc["l"] + acc["b"]
    )
    state = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at("xs", 1)["cents"].cast("double").alias("l"),
            F.lit(0.0).alias("b"),
            F.array(*[F.lit(0.0) for _ in range(7)]).alias("s"),
        ),
        lambda acc, x: F.struct(
            l_new(acc, x).alias("l"),
            (half * (l_new(acc, x) - acc["l"]) + half * acc["b"]).alias("b"),
            F.concat(
                F.slice(acc["s"], 2, 6),
                F.array(
                    half * (y(x) - l_new(acc, x))
                    + half * F.element_at(acc["s"], 1)
                ),
            ).alias("s"),
        ),
    )
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        F.element_at(state["s"], 1).alias("s_next"),
        (state["l"] + state["b"] + F.element_at(state["s"], 1)).alias(
            "forecast_next"
        ),
    )


@register(
    "q_ts_page_hinkley",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000)::BIGINT AS day_no,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, day_no, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day_no)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    base AS (
      SELECT event_type, sum(cents)::BIGINT AS b
      FROM o WHERE rn <= 7 GROUP BY event_type),
    f AS (
      SELECT o.event_type, o.rn, o.n, base.b,
             0::BIGINT AS s, 0::BIGINT AS mx,
             NULL::BIGINT AS alarm
      FROM o JOIN base ON base.event_type = o.event_type
      WHERE o.rn = 7 AND o.n >= 7
      UNION ALL
      SELECT o.event_type, o.rn, o.n, f.b,
             greatest(0, f.s + 7 * o.cents - f.b - (f.b // 10)),
             greatest(f.mx,
                      greatest(0, f.s + 7 * o.cents - f.b - (f.b // 10))),
             coalesce(f.alarm,
               CASE WHEN greatest(0, f.s + 7 * o.cents - f.b - (f.b // 10))
                         > f.b // 2
                    THEN o.day_no END)
      FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn + 1)
    SELECT event_type, n::BIGINT AS n_days, b AS baseline_cents,
           mx AS max_stat, alarm AS alarm_day_no
    FROM f WHERE rn = n
    """,
    category="timeseries",
)
def q_ts_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential drift detection (Page 1954 — the
    reset-at-zero one-sided CUSUM every streaming drift monitor
    ships) per event-type daily series: the first 7 days fix the
    baseline B = Σx (7× the baseline daily mean), then each later
    day accumulates s_k = max(0, s_{k−1} + 7·x_k − B − B DIV 10) —
    the ×7 scaling keeps the mean comparison integer, B DIV 10 is
    the declared 10% drift allowance — and the detector ALARMS at
    the first day where s_k exceeds h = B DIV 2 (half a baseline-day
    of cumulative excess — tuned so this fixture's series split into
    alarming and quiet ones; production tunes h per false-alarm
    budget). Emits the max statistic and the alarm day
    (NULL = no drift). Unlike q_ts_changepoint (offline argmax
    split over the whole series), this is the ONLINE kernel: state
    is O(1), each step looks only forward, and the reset means a
    recovered series re-arms the detector.

    Cross-engine exactness: pure BIGINT arithmetic (sums, ×7,
    floor DIV, max) — the fold recurrence is stated once and shared
    by the Spark `aggregate` and the recursive-CTE oracle; no
    floats anywhere.

    Scale posture: one map-side-combined day aggregate, then
    collect_list per series (state O(days), never O(events)); the
    fold is one catalyst higher-order function, JVM-side, no
    Python, one event_type exchange — the q_ts_holt shape with
    detection state.

    Reference scope: the reference engine has no time-series
    surface; this extends SURVEY.md §2.4's analytics family.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d = e.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(cast(ts as timestamp)) DIV 86400000000 AS BIGINT)"
        ).alias("day_no"),
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    series = (
        d.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("day_no", "cents"))).alias(
                "xs"
            )
        )
        # series shorter than the 7-day baseline are undefined for the
        # detector and EXCLUDED on both lanes (the oracle's recursive
        # seed requires rn = 7; without this filter the engine emitted
        # partial-baseline rows the oracle never produced)
        .where(F.size("xs") >= 7)
    )
    stepped = series.selectExpr(
        "event_type",
        "CAST(size(xs) AS BIGINT) AS n_days",
        "aggregate(slice(xs, 1, 7), CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x.cents) AS baseline_cents",
        "xs",
    ).selectExpr(
        "event_type",
        "n_days",
        "baseline_cents",
        """
        aggregate(
          slice(xs, 8, greatest(size(xs) - 7, 0)),
          struct(CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS mx,
                 CAST(NULL AS BIGINT) AS alarm),
          (acc, x) -> struct(
            greatest(CAST(0 AS BIGINT),
                     acc.s + 7 * x.cents - baseline_cents
                       - (baseline_cents DIV 10)) AS s,
            greatest(acc.mx,
                     greatest(CAST(0 AS BIGINT),
                              acc.s + 7 * x.cents - baseline_cents
                                - (baseline_cents DIV 10))) AS mx,
            coalesce(acc.alarm,
              CASE WHEN greatest(CAST(0 AS BIGINT),
                                 acc.s + 7 * x.cents - baseline_cents
                                   - (baseline_cents DIV 10))
                        > baseline_cents DIV 2
                   THEN x.day_no END) AS alarm)
        ) AS ph
        """,
    )
    return stepped.select(
        "event_type",
        "n_days",
        "baseline_cents",
        F.col("ph.mx").alias("max_stat"),
        F.col("ph.alarm").alias("alarm_day_no"),
    )


@register(
    "q_ts_croston",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT l_partkey AS part,
             (epoch_us(l_shipdate) // 86400000000)::BIGINT AS day,
             sum(l_quantity)::BIGINT AS qty
      FROM lineitem GROUP BY 1, 2),
    o AS (
      SELECT part, day, qty,
             row_number() OVER (PARTITION BY part ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY part) AS n
      FROM d),
    f AS (
      SELECT part, rn, n, day,
             qty::DOUBLE AS s, CAST(NULL AS DOUBLE) AS i
      FROM o WHERE rn = 1 AND n >= 2
      UNION ALL
      SELECT o.part, o.rn, o.n, o.day,
             0.5 * o.qty::DOUBLE + 0.5 * f.s,
             CASE WHEN f.i IS NULL THEN (o.day - f.day)::DOUBLE
                  ELSE 0.5 * (o.day - f.day)::DOUBLE + 0.5 * f.i END
      FROM f JOIN o ON o.part = f.part AND o.rn = f.rn + 1)
    SELECT part, n::BIGINT AS n_events,
           s AS size_est, i AS interval_est,
           round(s / i, 6) AS forecast_per_day
    FROM f WHERE rn = n
    """,
    category="timeseries",
)
def q_ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for INTERMITTENT demand — the
    forecasting kernel retail/spare-parts pipelines run when most
    days have no demand at all, where plain smoothing (q_ts_ewma /
    q_ts_holt) decays toward zero between orders: per part, separate
    exponential smoothing of the non-zero demand SIZES and of the
    INTER-DEMAND intervals (both α = ½), with the demand-rate
    forecast size_est / interval_est per day. The fixture's
    part-level shipments are genuinely intermittent (~30 demand days
    per part spread over ~6.5 years, mean gap ~84 days).

    Conventions stated once and shared: size state initialized to
    the first demand, interval state to the FIRST gap, updates from
    the second event on: s ← ½·qty + ½·s, i ← ½·gap + ½·i.

    Cross-engine exactness: quantities and day gaps are exact
    integers; α = ½ makes every state a dyadic rational (the
    q_ts_holt discipline); the ONE division per part (s/i) is the
    same IEEE op on identical operands; 6-dp round as a belt.

    Scale posture: one map-side-combined (part, day) aggregate, then
    collect_list per part (state O(demand events per part), never
    O(lines)); the fold is one catalyst higher-order function
    carrying (s, i, prev_day) — JVM-side, no Python, one part
    exchange; millions of SKUs parallelize embarrassingly.

    Reference scope: the reference engine has no time-series surface;
    this extends SURVEY.md §2.4's analytics family.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.expr(
            "CAST(unix_micros(cast(l_shipdate as timestamp))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("day"),
        F.col("l_quantity"),
    )
    d = li.groupBy("part", "day").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    series = (
        d.groupBy("part")
        .agg(F.array_sort(F.collect_list(F.struct("day", "qty"))).alias("xs"))
        .where(F.size("xs") >= 2)
    )
    folded = series.selectExpr(
        "part",
        "CAST(size(xs) AS BIGINT) AS n_events",
        """
        aggregate(
          slice(xs, 2, size(xs) - 1),
          struct(CAST(element_at(xs, 1).qty AS DOUBLE) AS s,
                 CAST(NULL AS DOUBLE) AS i,
                 element_at(xs, 1).day AS prev_day),
          (acc, x) -> struct(
            0.5 * CAST(x.qty AS DOUBLE) + 0.5 * acc.s AS s,
            CASE WHEN acc.i IS NULL
                 THEN CAST(x.day - acc.prev_day AS DOUBLE)
                 ELSE 0.5 * CAST(x.day - acc.prev_day AS DOUBLE)
                      + 0.5 * acc.i END AS i,
            x.day AS prev_day)
        ) AS st
        """,
    )
    return folded.select(
        "part",
        "n_events",
        F.col("st.s").alias("size_est"),
        F.col("st.i").alias("interval_est"),
        F.round(F.col("st.s") / F.col("st.i"), 6).alias("forecast_per_day"),
    )


@register(
    "q_ts_weekday_effect",
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
      SELECT sum(n_days)::BIGINT AS n, sum(sum_cents)::BIGINT AS s,
             sum(ssq)::HUGEINT AS q,
             list_reduce(
               list((sum_cents::DOUBLE * sum_cents::DOUBLE) / n_days
                    ORDER BY dow7),
               (a, x) -> a + x) AS sum_gsq
      FROM g)
    SELECT g.dow7, g.n_days, g.sum_cents,
           ((1000 * g.sum_cents) // g.n_days)::BIGINT AS mean_millicents,
           round(10000 * (t.sum_gsq - (t.s::DOUBLE * t.s::DOUBLE) / t.n)
                 / nullif(t.q::DOUBLE
                          - (t.s::DOUBLE * t.s::DOUBLE) / t.n, 0.0), 2)
             AS eta2_bp
    FROM g CROSS JOIN tot t
    """,
    category="timeseries",
)
def q_ts_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect size on daily revenue — the one-way ANOVA
    η² (between-group share of total variance) that answers "does
    weekday actually matter for this metric" BEFORE anyone builds a
    seasonal model: per epoch-anchored weekday (day_no MOD 7 — no
    calendar week semantics to disagree on), the day counts, revenue
    sums, and means, plus η² in basis points repeated on every row
    (the 7-row report reads as one table). η² near 0 on this
    fixture's uniform synthetic dates is the honest finding — the
    audit exists to STOP unneeded seasonal terms too. The group mean
    is integer MILLI-cents (1000·Σ DIV n): at 1e9-cent magnitudes a
    round(double, 6) turned out to diverge between the engines'
    rounding implementations at the double's precision limit —
    caught by the sf0.1 parity lane in development.

    Cross-engine exactness: per-weekday n/Σx/Σx² are exact integers
    (Σx² through a wide-integer lane — daily cents squared passes
    BIGINT sums by sf1); the float stage (sum_gsq, the η² ratio)
    applies the SAME operation sequence to those identical integers
    on both engines — sum_gsq folds the 7 per-group terms in
    EXPLICIT dow7 order (array_sort + left fold vs list_reduce over
    an ORDER BY list; ADVICE r8 — a bare float SUM has no guaranteed
    partial-merge order), so the doubles are genuinely bit-identical,
    with the 2-dp round as a belt.

    Scale posture: one map-side-combined day aggregate, one 7-row
    weekday aggregate, a 1-row total broadcast back onto the 7-row
    table. No windows over facts, no Python.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's analytics family.
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
    # sum_gsq is the ONE float accumulation here, and a plain SUM of
    # doubles has no guaranteed partial-merge order across Spark
    # partitions — a ULP flip at a rounding boundary could diverge
    # from the oracle (ADVICE r8). Fold the 7 per-weekday terms in
    # explicit dow7 order instead (array_sort + left fold, mirrored
    # by the oracle's list_reduce over an ORDER BY dow7 list); the
    # fold's 0.0D seed is an exact identity so both engines perform
    # the identical 7-addition sequence.
    tot = g.agg(
        F.sum("n_days").cast("long").alias("n"),
        F.sum("sum_cents").cast("long").alias("s"),
        F.sum("ssq").alias("q"),
        F.array_sort(
            F.collect_list(F.struct("dow7", "n_days", "sum_cents"))
        ).alias("gs"),
    ).selectExpr(
        "n",
        "s",
        "q",
        "aggregate(gs, 0.0D, (a, x) -> a +"
        " (CAST(x.sum_cents AS DOUBLE) * CAST(x.sum_cents AS DOUBLE))"
        " / x.n_days) AS sum_gsq",
    )
    return g.crossJoin(F.broadcast(tot)).selectExpr(
        "dow7",
        "n_days",
        "sum_cents",
        "CAST((1000 * sum_cents) DIV n_days AS BIGINT) AS mean_millicents",
        # nullif: a zero-variance series must read NULL on BOTH engines
        # (ANSI Spark raises on double/0 while DuckDB emits NULL)
        "round(10000 * (sum_gsq - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / n) / nullif(CAST(q AS DOUBLE) - (CAST(s AS DOUBLE)"
        " * CAST(s AS DOUBLE)) / n, 0.0), 2) AS eta2_bp",
    )


@register(
    "q_sample_time_split",
    oracle="""
    WITH d AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000)::BIGINT AS day
      FROM events),
    days AS (
      SELECT day, row_number() OVER (ORDER BY day) AS rn,
             count(*) OVER () AS n
      FROM (SELECT DISTINCT day FROM d)),
    b AS (
      SELECT day AS boundary_day FROM days
      WHERE rn = ((8 * n + 9) // 10)),
    marked AS (
      SELECT event_type,
             CASE WHEN day < b.boundary_day THEN 1 ELSE 0 END AS is_train,
             b.boundary_day
      FROM d CROSS JOIN b),
    per_type AS (
      SELECT event_type, boundary_day,
             sum(is_train)::BIGINT AS n_train,
             sum(1 - is_train)::BIGINT AS n_test
      FROM marked GROUP BY event_type, boundary_day)
    SELECT event_type, boundary_day, n_train, n_test,
           ((10000 * n_train) // nullif(sum(n_train) OVER (), 0))::BIGINT
             AS train_share_bp,
           ((10000 * n_test) // nullif(sum(n_test) OVER (), 0))::BIGINT
             AS test_share_bp,
           (((10000 * n_test) // nullif(sum(n_test) OVER (), 0))
            - ((10000 * n_train) // nullif(sum(n_train) OVER (), 0)))::BIGINT
             AS drift_bp
    FROM per_type
    """,
    category="sampling",
)
def q_sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split audit — the split EVERY forecasting
    and recommendation pipeline must use instead of the hash split
    (q_sample_hash_split), because random splits leak the future into
    training: the boundary is the exact 80th-percentile distinct day
    (nearest-rank ceil(0.8·n) over the bounded day table), events
    strictly before it train, the rest test, and the report gives
    per-event-type counts plus the LABEL-SHIFT audit (within-split
    composition in basis points and its drift) that tells you whether
    the test period is distributionally comparable before you trust
    offline metrics on it.

    Cross-engine exactness: the boundary is an integer order
    statistic with the declared nearest-rank rule ((8n+9) DIV 10 ==
    ceil(0.8·n) for integer n); counts and shares are exact integer
    DIV basis points.

    Scale posture: the day table is bounded by the observation
    window, so its rank window is value-table-sized; the boundary
    broadcasts as one row onto the fact scan; one (event_type)
    aggregate + windows over the ≤|event types| report rows. No
    fact-table windows, no Python.

    Reference scope: the reference engine has no sampling surface;
    this extends SURVEY.md §2.4's sampling family.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(unix_micros(cast(ts as timestamp)) DIV 86400000000"
            " AS BIGINT)"
        ).alias("day"),
    )
    days = (
        e.select("day")
        .distinct()
        .select(
            "day",
            F.row_number().over(Window.orderBy("day")).alias("rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
    )
    b = days.where(F.expr("rn = (8 * n + 9) DIV 10")).select(
        F.col("day").alias("boundary_day")
    )
    per_type = (
        e.crossJoin(F.broadcast(b))
        .groupBy("event_type", "boundary_day")
        .agg(
            F.sum(F.when(F.col("day") < F.col("boundary_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(F.col("day") >= F.col("boundary_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_type.select(
        "event_type",
        "boundary_day",
        "n_train",
        "n_test",
        F.expr("10000 * n_train").alias("_tr10k"),
        F.expr("10000 * n_test").alias("_te10k"),
        F.sum("n_train").over(w).alias("_tr_tot"),
        F.sum("n_test").over(w).alias("_te_tot"),
    ).selectExpr(
        "event_type",
        "boundary_day",
        "n_train",
        "n_test",
        # nullif guards the single-distinct-day corpus: the nearest-
        # rank boundary is then the minimum day, NOTHING is strictly
        # before it, and _tr_tot is 0 — ANSI Spark would raise while
        # DuckDB diverges; both engines now emit NULL shares
        # (ADVICE r8).
        "CAST(_tr10k DIV nullif(_tr_tot, 0) AS BIGINT) AS train_share_bp",
        "CAST(_te10k DIV nullif(_te_tot, 0) AS BIGINT) AS test_share_bp",
        "CAST(_te10k DIV nullif(_te_tot, 0)"
        " - _tr10k DIV nullif(_tr_tot, 0) AS BIGINT) AS drift_bp",
    )


@register(
    "q_ts_theta_forecast",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    o AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    m AS (
      SELECT event_type,
             count(*)::BIGINT AS n,
             sum(rn)::BIGINT AS st,
             sum(cents)::BIGINT AS sy,
             sum(rn::HUGEINT * rn)::HUGEINT AS stt,
             sum(rn::HUGEINT * cents)::HUGEINT AS sty
      FROM o GROUP BY 1),
    f AS (
      SELECT event_type, rn, n, cents::DOUBLE AS l
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.event_type, o.rn, o.n,
             0.5 * o.cents::DOUBLE + 0.5 * f.l
      FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn + 1),
    last AS (SELECT event_type, n, l FROM f WHERE rn = n)
    SELECT m.event_type, m.n AS n_days,
           round((m.n::HUGEINT * m.sty - m.st::HUGEINT * m.sy)::DOUBLE
                 / nullif((m.n::HUGEINT * m.stt
                           - m.st::HUGEINT * m.st)::DOUBLE, 0.0), 6)
             AS slope,
           last.l AS ses_level,
           round(last.l
                 + round((m.n::HUGEINT * m.sty - m.st::HUGEINT * m.sy)::DOUBLE
                         / nullif((m.n::HUGEINT * m.stt
                                   - m.st::HUGEINT * m.st)::DOUBLE, 0.0), 6)
                   / 2.0 * 1, 4) AS forecast_1,
           round(last.l
                 + round((m.n::HUGEINT * m.sty - m.st::HUGEINT * m.sy)::DOUBLE
                         / nullif((m.n::HUGEINT * m.stt
                                   - m.st::HUGEINT * m.st)::DOUBLE, 0.0), 6)
                   / 2.0 * 7, 4) AS forecast_7
    FROM m JOIN last ON last.event_type = m.event_type
    """,
    category="timeseries",
)
def q_ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner) per event-type daily series, in the
    drift-adjusted-SES form Hyndman & Billah 2003 proved equivalent
    for θ = 2: simple exponential smoothing of the series (α = 1/2)
    plus half the OLS trend slope per step ahead,
    f_h = ℓ_n + (b̂/2)·h. Emits the fitted slope, the final SES
    level, and the 1-day and 7-day-ahead forecasts — the
    short-horizon baseline that beat every exponential-family rival
    in M3 while costing one fold and one moment aggregate.

    Cross-engine exactness: the OLS slope comes from exact integer
    moments (Σt, Σy, Σt², Σty through wide-integer lanes — n·Σty
    passes BIGINT at sf1 daily magnitudes), divided ONCE in a shared
    formula (6-dp round); the SES level folds exact integer cents
    with α = 1/2 halvings in the same operand order as the oracle's
    recursive CTE (the q_ts_holt discipline — bit-identical doubles);
    forecasts combine the two deterministic stages with identical
    expression text (4-dp round as a belt). nullif guards the
    single-day series (slope denominator 0 must read NULL on both
    engines, not raise under ANSI Spark).

    Scale posture: one map-side-combined day aggregate, one
    event_type exchange, per-series state O(days-per-series) bounded
    by retention; the fold and the moment aggregate are JVM-side
    catalyst expressions. A 100 TB metrics store runs this per
    (metric, entity) series — embarrassingly parallel across keys.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series family beside
    q_ts_holt / q_ts_holt_winters / q_ts_croston.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    series = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("xs")
    )
    # OLS moments over (rn, cents) with rn the 1-based time index —
    # computed from the SAME sorted array so the index assignment
    # cannot disagree with the fold's visit order.
    moments = series.selectExpr(
        "event_type",
        "xs",
        "CAST(size(xs) AS BIGINT) AS n",
        "aggregate(xs, struct(0L AS i, CAST(0 AS DECIMAL(38,0)) AS st,"
        " CAST(0 AS DECIMAL(38,0)) AS sy, CAST(0 AS DECIMAL(38,0)) AS stt,"
        " CAST(0 AS DECIMAL(38,0)) AS sty),"
        " (a, x) -> struct(a.i + 1L AS i,"
        " CAST(a.st + (a.i + 1) AS DECIMAL(38,0)) AS st,"
        " CAST(a.sy + x.cents AS DECIMAL(38,0)) AS sy,"
        " CAST(a.stt + (a.i + 1) * (a.i + 1) AS DECIMAL(38,0)) AS stt,"
        " CAST(a.sty + (a.i + 1) * CAST(x.cents AS DECIMAL(38,0))"
        " AS DECIMAL(38,0)) AS sty)) AS m",
    )
    ses = (
        "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),"
        " CAST(element_at(xs, 1).cents AS DOUBLE),"
        " (l, x) -> 0.5D * CAST(x.cents AS DOUBLE) + 0.5D * l)"
    )
    slope = (
        "round(CAST(n * m.sty - m.st * m.sy AS DOUBLE)"
        " / nullif(CAST(n * m.stt - m.st * m.st AS DOUBLE), 0.0D), 6)"
    )
    return moments.selectExpr(
        "event_type",
        "n AS n_days",
        f"{slope} AS slope",
        f"{ses} AS ses_level",
        f"round({ses} + {slope} / 2.0D * 1, 4) AS forecast_1",
        f"round({ses} + {slope} / 2.0D * 7, 4) AS forecast_7",
    )


@register(
    "q_ts_ljung_box",
    oracle="""
    WITH b AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS d),
    rev AS (SELECT d, sum(cents)::BIGINT AS c FROM b GROUP BY d),
    s AS (SELECT g.d, coalesce(r.c, 0)::BIGINT AS x
          FROM grid g LEFT JOIN rev r ON r.d = g.d),
    tot AS (
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
             sum(x::HUGEINT * x::HUGEINT)::HUGEINT AS sxx
      FROM s),
    lags AS (
      SELECT * FROM (VALUES (1::BIGINT, 3.841), (2, 5.991), (3, 7.815),
                            (4, 9.488), (5, 11.070), (6, 12.592),
                            (7, 14.067)) AS t(lag_d, chi2_crit)),
    joined AS (
      SELECT l.lag_d, a.x AS x, b2.x AS y
      FROM lags l
      JOIN s a ON TRUE
      JOIN s b2 ON b2.d = a.d + to_days(l.lag_d::INT)),
    m AS (
      SELECT lag_d,
             sum(x::HUGEINT * y::HUGEINT)::HUGEINT AS sxy,
             sum(x)::BIGINT AS shead, sum(y)::BIGINT AS stail
      FROM joined GROUP BY lag_d),
    r AS (
      SELECT m.lag_d,
             (t.n::HUGEINT * t.n * m.sxy
              - t.n::HUGEINT * t.sx * (m.shead + m.stail)
              + (t.n - m.lag_d)::HUGEINT * t.sx * t.sx)::DOUBLE
             / nullif((t.n::HUGEINT * t.n * t.sxx
                       - t.n::HUGEINT * t.sx * t.sx)::DOUBLE, 0.0) AS acf,
             t.n AS n
      FROM m CROSS JOIN tot t),
    q AS (
      SELECT lag_d, n, acf,
             n * (n + 2.0)
               * sum(acf * acf / (n - lag_d))
                 OVER (ORDER BY lag_d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lb_q
      FROM r)
    SELECT q.lag_d, q.n AS n_days, round(q.acf, 6) AS acf,
           round(q.lb_q, 4) AS lb_q,
           CASE WHEN q.lb_q > l.chi2_crit THEN 1 ELSE 0 END AS reject_h0
    FROM q JOIN lags l ON l.lag_d = q.lag_d
    """,
    category="timeseries",
)
def q_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau whiteness test on the daily revenue
    series — the formal "is there ANY autocorrelation up to lag h"
    test run before trusting an i.i.d. assumption and after fitting
    a forecaster (on residuals): standard autocorrelations
    r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² at lags 1..7,
    the cumulative Q_h = n(n+2)·Σ_{k≤h} r_k²/(n−k), and the χ²(h)
    0.95-quantile verdict per row (critical values as declared
    literals in the shared lag table). Complements q_ts_acf (which
    reports Pearson-on-aligned-pairs at sparse lags): Ljung–Box uses
    the SERIES mean and variance, the estimator the test's null
    distribution assumes.

    Cross-engine exactness: the series is densified onto the full
    daily grid (missing days are genuine zeros); each r_k is one
    division of two exact wide integers (×n² clears the mean:
    n²Σxy − nS(Σhead+Σtail) + (n−k)S² over n²Σx² − nS², every
    intermediate < 1e26 at sf1 — DECIMAL(38)/HUGEINT hold it) cast
    once to double, with nullif on the variance so a CONSTANT series
    reads NULL acf / NULL Q on both engines (never NaN vs NULL); Q_h accumulates the 7 per-lag terms in lag order
    on a 7-row frame in BOTH engines (ordered cumulative window —
    deterministic float sequence), rounded at 4; the verdict
    compares identical doubles to a shared literal.

    Scale posture: one aggregate to the |days|-row series (bounded
    by retention), a 7-row lag table joined on the shifted day, a
    7-group aggregate, windows only over the 7-row report. The fact
    table is scanned once.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series diagnostics beside
    q_ts_acf and q_ts_control_chart.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("d"),
        to_units(F.col("o_totalprice"), 100).alias("cents"),
    )
    bounds = o.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    rev = o.groupBy("d").agg(F.sum("cents").cast("long").alias("c"))
    s = grid.join(rev, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    lags = spark.createDataFrame(
        [(1, 3.841), (2, 5.991), (3, 7.815), (4, 9.488), (5, 11.070),
         (6, 12.592), (7, 14.067)],
        "lag_d BIGINT, chi2_crit DOUBLE",
    )
    shifted = s.select(
        F.col("d").alias("d2"), F.col("x").alias("y")
    )
    joined = (
        lags.crossJoin(s)
        .join(
            shifted,
            F.col("d2") == F.expr("d + make_interval(0, 0, 0, CAST(lag_d AS INT))"),
        )
    )
    m = joined.groupBy("lag_d").agg(
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum("x").cast("long").alias("shead"),
        F.sum("y").cast("long").alias("stail"),
    )
    r = m.crossJoin(tot).selectExpr(
        "lag_d",
        "n",
        "CAST(CAST(n AS DECIMAL(38,0)) * n * sxy"
        " - CAST(n AS DECIMAL(38,0)) * sx * (shead + stail)"
        " + CAST(n - lag_d AS DECIMAL(38,0)) * sx * sx AS DOUBLE)"
        " / nullif(CAST(CAST(n AS DECIMAL(38,0)) * n * sxx"
        " - CAST(n AS DECIMAL(38,0)) * sx * sx AS DOUBLE), 0.0D) AS acf",
    )
    cum = (
        Window.orderBy("lag_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = r.select(
        "lag_d",
        "n",
        "acf",
        (
            F.col("n")
            * (F.col("n") + F.lit(2.0))
            * F.sum(
                F.col("acf") * F.col("acf") / (F.col("n") - F.col("lag_d"))
            ).over(cum)
        ).alias("lb_q"),
    )
    return q.join(lags, "lag_d").selectExpr(
        "lag_d",
        "n AS n_days",
        "round(acf, 6) AS acf",
        "round(lb_q, 4) AS lb_q",
        "CASE WHEN lb_q > chi2_crit THEN 1 ELSE 0 END AS reject_h0",
    )


@register(
    "q_ts_permutation_entropy",
    oracle="""
    WITH b AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS d),
    rev AS (SELECT d, sum(cents)::BIGINT AS c FROM b GROUP BY d),
    s AS (SELECT g.d, coalesce(r.c, 0)::BIGINT AS x
          FROM grid g LEFT JOIN rev r ON r.d = g.d),
    tri AS (
      SELECT x AS a,
             lead(x, 1) OVER (ORDER BY d) AS bb,
             lead(x, 2) OVER (ORDER BY d) AS cc
      FROM s),
    pat AS (
      SELECT (4 * (CASE WHEN a > bb THEN 1 ELSE 0 END)
              + 2 * (CASE WHEN bb > cc THEN 1 ELSE 0 END)
              + (CASE WHEN a > cc THEN 1 ELSE 0 END))::BIGINT AS code
      FROM tri WHERE cc IS NOT NULL),
    cnt AS (
      SELECT code, count(*)::BIGINT AS n_windows FROM pat GROUP BY 1),
    tot AS (
      SELECT sum(n_windows)::BIGINT AS n,
             list_reduce(
               list(n_windows::DOUBLE * log2(n_windows::DOUBLE)
                    ORDER BY code),
               (a, x) -> a + x) AS sum_clogc
      FROM cnt)
    SELECT c.code, c.n_windows,
           ((1000000 * c.n_windows) // t.n)::BIGINT AS share_ppm,
           round(log2(t.n::DOUBLE) - t.sum_clogc / t.n, 6) AS entropy_bits,
           round((log2(t.n::DOUBLE) - t.sum_clogc / t.n)
                 / log2(6.0::DOUBLE), 6) AS entropy_norm
    FROM cnt c CROSS JOIN tot t
    """,
    category="timeseries",
)
def q_ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002) of the daily revenue
    series at embedding dimension 3 — the model-free complexity
    gauge that separates trending/periodic series (few ordinal
    patterns dominate, low entropy) from noise (all six patterns
    equally likely, entropy → log₂6): each consecutive day triple
    maps to its ordinal pattern — encoded as the 3 pairwise
    strictly-greater bits 4·(a>b) + 2·(b>c) + (a>c), which ties
    resolve deterministically (≤ as "not greater", the
    earlier-position-first convention) — and the pattern
    distribution's Shannon entropy is reported raw and normalized
    by log₂6. Per pattern: count, corpus share in exact ppm, and
    the two entropy figures repeated.

    Cross-engine exactness: the series is densified onto the daily
    grid (missing days are genuine zeros); pattern codes and counts
    are exact integers; entropy uses the one-pass algebraic form
    log₂N − Σc·log₂c / N folding the ≤8 per-code terms in EXPLICIT
    code order (the q_ts_weekday_effect fold discipline), rounded
    at 6.

    Scale posture: one map-side-combined day aggregate; the two
    lead() windows run over the bounded day table (retention-sized,
    never fact rows); an ≤8-row pattern aggregate and a 1-row total.
    No Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series diagnostics beside
    q_ts_sax and q_ts_burstiness.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("d"),
        to_units(F.col("o_totalprice"), 100).alias("cents"),
    )
    bounds = o.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    rev = o.groupBy("d").agg(F.sum("cents").cast("long").alias("c"))
    s = grid.join(rev, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    lead_w = Window.orderBy("d")
    tri = s.select(
        F.col("x").alias("a"),
        F.lead("x", 1).over(lead_w).alias("bb"),
        F.lead("x", 2).over(lead_w).alias("cc"),
    )
    pat = tri.where(F.col("cc").isNotNull()).selectExpr(
        "CAST(4 * (CASE WHEN a > bb THEN 1 ELSE 0 END)"
        " + 2 * (CASE WHEN bb > cc THEN 1 ELSE 0 END)"
        " + (CASE WHEN a > cc THEN 1 ELSE 0 END) AS BIGINT) AS code"
    )
    cnt = pat.groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    tot = cnt.agg(
        F.sum("n_windows").cast("long").alias("n"),
        F.array_sort(
            F.collect_list(F.struct("code", "n_windows"))
        ).alias("gs"),
    ).selectExpr(
        "n",
        "aggregate(gs, 0.0D, (a, x) -> a"
        " + CAST(x.n_windows AS DOUBLE) * log2(CAST(x.n_windows AS DOUBLE)))"
        " AS sum_clogc",
    )
    return cnt.crossJoin(tot).selectExpr(
        "code",
        "n_windows",
        "CAST((1000000 * n_windows) DIV n AS BIGINT) AS share_ppm",
        "round(log2(CAST(n AS DOUBLE)) - sum_clogc / n, 6) AS entropy_bits",
        "round((log2(CAST(n AS DOUBLE)) - sum_clogc / n)"
        " / log2(6.0D), 6) AS entropy_norm",
    )


@register(
    "q_ts_stl_strength",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    trended AS (
      SELECT event_type, h, cents,
             sum(cents) OVER win AS wsum,
             count(*) OVER win AS wn
      FROM hourly
      WINDOW win AS (PARTITION BY event_type ORDER BY h
                     RANGE BETWEEN INTERVAL 12 HOUR PRECEDING
                           AND INTERVAL 11 HOUR FOLLOWING)),
    detrended AS (
      SELECT event_type, h, cents,
             cents - wsum::DOUBLE / wn AS dev
      FROM trended WHERE wn >= 18),
    seasonal AS (
      SELECT event_type, extract(hour FROM h) AS hod,
             round(avg(dev), 6) AS s
      FROM detrended GROUP BY 1, 2),
    q AS (
      SELECT d.event_type,
             round((d.dev - s.s) * 1000000)::BIGINT AS r_u,
             round(d.dev * 1000000)::BIGINT AS sr_u,
             round((d.cents - s.s) * 1000000)::BIGINT AS tr_u
      FROM detrended d
      JOIN seasonal s ON s.event_type = d.event_type
                     AND s.hod = extract(hour FROM d.h)),
    mo AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(r_u)::BIGINT AS s_r, sum(r_u::HUGEINT * r_u) AS q_r,
             sum(sr_u)::BIGINT AS s_sr, sum(sr_u::HUGEINT * sr_u) AS q_sr,
             sum(tr_u)::BIGINT AS s_tr, sum(tr_u::HUGEINT * tr_u) AS q_tr
      FROM q GROUP BY 1)
    SELECT event_type, n AS n_hours,
           CASE WHEN n * q_sr - s_sr::HUGEINT * s_sr = 0 THEN NULL
                ELSE round(greatest(0.0, 1.0
                     - (n::HUGEINT * q_r - s_r::HUGEINT * s_r)::DOUBLE
                     / (n::HUGEINT * q_sr
                        - s_sr::HUGEINT * s_sr)::DOUBLE), 6) END
             AS seasonal_strength,
           CASE WHEN n * q_tr - s_tr::HUGEINT * s_tr = 0 THEN NULL
                ELSE round(greatest(0.0, 1.0
                     - (n::HUGEINT * q_r - s_r::HUGEINT * s_r)::DOUBLE
                     / (n::HUGEINT * q_tr
                        - s_tr::HUGEINT * s_tr)::DOUBLE), 6) END
             AS trend_strength
    FROM mo
    """,
    category="timeseries",
)
def q_ts_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonal STRENGTH (Wang, Smith & Hyndman 2006) of
    each event type's hourly series — the two 0–1 scores that turn
    q_ts_seasonal_decompose's component table into a decision: model
    the seasonality (F_s = max(0, 1 − Var(R)/Var(S+R)) near 1) or
    drop it, detrend (F_t over Var(T+R)) or not. Built on the SAME
    decomposition construction as q_ts_seasonal_decompose (24 h
    centered moving-average trend, hour-of-day mean seasonal — one
    source of truth for what 'the components' mean).

    Cross-engine exactness: the decompose stages are the proven
    parity-green construction (exact integer trend rationals, the
    6-dp-rounded seasonal cell means); the NEW variance stage
    quantizes each residual to exact integer micro-units FIRST
    (round(x·1e6) of bit-identical doubles) so the variances come
    from exact integer moments through wide lanes, combined in one
    shared float formula — no unordered float summation anywhere in
    this operator's own math. nullif: a zero-variance series reads
    NULL strength on both engines.

    Scale posture: one hour aggregate (retention-bounded), the
    trend window per event_type over the bounded hour table, an
    hod-cell seasonal aggregate, one moment aggregate, a 5-row
    report. No Python, no hints.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series family beside
    q_ts_seasonal_decompose.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dec_sum(to_units(F.col("value"), 100)).cast("long").alias("cents"))
    win = (
        Window.partitionBy("event_type")
        .orderBy(F.col("h").cast("timestamp").cast("long"))
        .rangeBetween(-12 * 3600, 11 * 3600)
    )
    trended = hourly.select(
        "event_type",
        "h",
        "cents",
        F.sum("cents").over(win).alias("wsum"),
        F.count(F.lit(1)).over(win).alias("wn"),
    )
    detrended = trended.where(F.col("wn") >= 18).selectExpr(
        "event_type",
        "h",
        "cents",
        "cents - CAST(wsum AS DOUBLE) / wn AS dev",
    )
    seasonal = detrended.groupBy(
        "event_type", F.expr("extract(hour FROM h)").alias("hod")
    ).agg(F.round(F.avg("dev"), 6).alias("s"))
    q = (
        detrended.withColumn("hod", F.expr("extract(hour FROM h)"))
        .join(seasonal, ["event_type", "hod"])
        .selectExpr(
            "event_type",
            "CAST(round((dev - s) * 1000000) AS BIGINT) AS r_u",
            "CAST(round(dev * 1000000) AS BIGINT) AS sr_u",
            "CAST(round((cents - s) * 1000000) AS BIGINT) AS tr_u",
        )
    )
    mo = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r_u").cast("long").alias("s_r"),
        F.sum(F.expr("CAST(r_u AS DECIMAL(38,0)) * r_u")).alias("q_r"),
        F.sum("sr_u").cast("long").alias("s_sr"),
        F.sum(F.expr("CAST(sr_u AS DECIMAL(38,0)) * sr_u")).alias("q_sr"),
        F.sum("tr_u").cast("long").alias("s_tr"),
        F.sum(F.expr("CAST(tr_u AS DECIMAL(38,0)) * tr_u")).alias("q_tr"),
    )
    var = (
        "(CAST(n AS DECIMAL(38,0)) * {q} - CAST({s} AS DECIMAL(38,0)) * {s})"
    )
    # the zero-variance NULL is decided OUTSIDE greatest(): both
    # engines' greatest() SKIPS NULL arguments, so greatest(0, NULL)
    # would silently read 0.0 (the q_dedup_fellegi_sunter least()
    # class, caught by the constant-series edge test in dev)
    return mo.selectExpr(
        "event_type",
        "n AS n_hours",
        "CASE WHEN " + var.format(q="q_sr", s="s_sr")
        + " = 0 THEN NULL ELSE round(greatest(0.0D, 1.0D - CAST("
        + var.format(q="q_r", s="s_r")
        + " AS DOUBLE) / CAST("
        + var.format(q="q_sr", s="s_sr")
        + " AS DOUBLE)), 6) END AS seasonal_strength",
        "CASE WHEN " + var.format(q="q_tr", s="s_tr")
        + " = 0 THEN NULL ELSE round(greatest(0.0D, 1.0D - CAST("
        + var.format(q="q_r", s="s_r")
        + " AS DOUBLE) / CAST("
        + var.format(q="q_tr", s="s_tr")
        + " AS DOUBLE)), 6) END AS trend_strength",
    )


def _theil_sen_slopes(daily: DataFrame) -> DataFrame:
    """All-pairs quantized slopes over the day table (da < db) — the
    declared n² value-table stage, factored out so tests/test_plans.py
    gates ITS shape (nested-loop over the bounded day frames, never a
    cartesian product, no Python) even though the registered builder
    materializes it before the rank-k selection (r12)."""
    a = daily.select(F.col("day_no").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("day_no").alias("db"), F.col("cents").alias("cb"))
    return a.join(b, F.col("da") < F.col("db")).selectExpr(
        "CAST(CASE WHEN cb - ca >= 0"
        " THEN (1000000 * (cb - ca)) DIV (db - da)"
        " ELSE -((1000000 * (ca - cb)) DIV (db - da)) END AS BIGINT)"
        " AS smicro"
    )


@register(
    "q_ts_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT (epoch_us(o_orderdate) // 86400000000)::BIGINT AS day_no,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT b.day_no - a.day_no AS dx, b.cents - a.cents AS dy
      FROM daily a JOIN daily b ON a.day_no < b.day_no),
    slopes AS (
      SELECT (CASE WHEN dy >= 0
                   THEN (1000000 * dy) // dx
                   ELSE -((1000000 * (-dy)) // dx) END)::BIGINT AS smicro
      FROM pairs),
    hist AS (
      SELECT smicro, count(*)::BIGINT AS c FROM slopes GROUP BY 1),
    w AS (
      SELECT smicro,
             sum(c) OVER (ORDER BY smicro
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS cum
      FROM hist),
    tot AS (
      SELECT sum(c)::BIGINT AS n_pairs,
             (SELECT count(*)::BIGINT FROM daily) AS n_days
      FROM hist)
    SELECT t.n_days, t.n_pairs,
           min(w.smicro) FILTER (2 * w.cum >= t.n_pairs + 1)::BIGINT
             AS ts_slope_micro
    FROM w CROSS JOIN tot t
    GROUP BY t.n_days, t.n_pairs
    """,
    category="timeseries",
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue — the median of all
    pairwise slopes: up to ~29% of days can be corrupted (outages,
    backfills, flash sales) before the estimate moves, where the OLS
    slope (q_ts_theta_forecast's b̂) chases every outlier. The
    estimator behind robust KPI trend lines.

    Cross-engine exactness: each pairwise slope is quantized ONCE to
    integer micro-units with the sign-aware floor
    sign(Δy)·((1e6·|Δy|) DIV Δx) (DuckDB // floors while Spark DIV
    truncates — they agree only on non-negative operands, so the
    sign is factored out explicitly; the declared quantization is
    part of the metric, the q_llm_keyword_rake convention); the
    median is the exact nearest-rank lower median over the slope
    histogram (2·cum ≥ n+1), all integer comparisons.

    Scale posture: the pair expansion is over the CALENDAR-BOUNDED
    day table (retention-sized — ~2400 days = ~2.9M pairs regardless
    of corpus SF, the q_ml_isotonic declared value-table n² class;
    slope_last ~0 by design), never fact rows. No Python, no hints
    (the non-equi day join is a nested-loop over the bounded day
    frames — AQE broadcasts).

    r12 (guide §2.4, measured): the slopes are ~all-distinct (2.89M
    distinct of 2.89M pairs at sf0.1), so the old global
    Window.orderBy over the slope "histogram" serialized every pair
    through ONE task (~3 s of the query's 5.8 s), and the histogram
    aggregate itself shuffled 2.9M rows to keep ~nothing. The median
    is now a distributed two-phase rank-k selection (the
    pack_by_cumsum idiom): range-partition the slopes, pin the
    assignment with materialize, collect the #partitions-sized count
    table, and run the cum window only over the ONE partition that
    holds the global rank — 2.9M/parallelism rows instead of 2.9M.
    n_pairs is C(n_days, 2) analytically (the da<db join over
    distinct days emits every pair exactly once), so the pair
    expansion is evaluated once, not re-aggregated for the total.
    Values identical at both SFs (oracle-proven); 5.8 s → ~2.6 s at
    sf0.1. Driver state: n_days + one count per range partition —
    model-sized scalars (the k-means allowance).

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series family beside
    q_ts_theta_forecast (OLS) and q_ml_isotonic (monotone fit).

    NOTE (ADVICE r12): this builder is EAGER — the rank-k selection
    runs driver-side actions (day count, slope materialize, per-
    partition counts) at BUILD time, so merely constructing the plan
    executes the pair job, and the returned DataFrame bakes in the
    driver-computed rank cut as literals. Plan-only consumers
    (PLANS.md generation, dry inspection) pay the full computation —
    the documented cost of the k-means-class driver-scalar allowance.
    """
    from batchprocessor_spark.session import materialize

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
    ).transform(materialize)  # day-table-sized; read by both join sides
    n_days = daily.count()
    n_pairs = n_days * (n_days - 1) // 2
    if n_pairs == 0:
        # 0 or 1 days: no pairs — empty result on both engines (the
        # oracle's w CTE is empty, so its final GROUP BY emits no row)
        return spark.createDataFrame(
            [], "n_days BIGINT, n_pairs BIGINT, ts_slope_micro BIGINT"
        )
    slopes = _theil_sen_slopes(daily)
    # Phase 1: range-partition by slope and pin the (sampled, hence
    # run-dependent) partition assignment; the per-partition counts
    # locate the partition holding the global lower-median rank.
    nparts = max(16, spark.sparkContext.defaultParallelism)
    parted = (
        slopes.repartitionByRange(nparts, "smicro")
        .withColumn("pid", F.spark_partition_id())
        .transform(materialize)
    )
    totals = {
        r.pid: r.c
        for r in parted.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    acc, target, offset = 0, None, 0
    for pid in sorted(totals):
        if target is None and 2 * (acc + totals[pid]) >= n_pairs + 1:
            target, offset = pid, acc
        acc += totals[pid]
    # Phase 2: the cum window runs over the target partition's slope
    # histogram only, seeded with the global offset — same
    # 2·cum ≥ n_pairs+1 nearest-rank-lower-median cut as before.
    hist = (
        parted.where(F.col("pid") == target)
        .groupBy("smicro")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum = Window.orderBy("smicro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = hist.select(
        "smicro",
        (F.sum("c").over(cum) + F.lit(offset)).cast("long").alias("cum"),
    )
    return (
        w.select(
            F.lit(n_days).cast("long").alias("n_days"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
            "smicro",
            "cum",
        )
        .groupBy("n_days", "n_pairs")
        .agg(
            F.expr(
                "CAST(min(CASE WHEN 2 * cum >= n_pairs + 1 THEN smicro END)"
                " AS BIGINT)"
            ).alias("ts_slope_micro")
        )
    )


# 2·cos(2π/p) Goertzel coefficients as DECLARED literals (shared by
# builder and oracle — the q_ab_sprt micro-log convention: constants
# are part of the metric's contract, not computed at runtime).
_GOERTZEL_C7 = "1.2469796037174672"
_GOERTZEL_C11 = "1.6825070656623622"


@register(
    "q_ts_goertzel_weekly",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             round(o_totalprice * 100)::BIGINT AS cents
      FROM orders),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
    grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS d),
    rev AS (SELECT d, sum(cents)::BIGINT AS c FROM b GROUP BY d),
    s AS (SELECT g.d, coalesce(r.c, 0)::BIGINT AS x
          FROM grid g LEFT JOIN rev r ON r.d = g.d),
    m AS (
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
             sum(x::HUGEINT * x)::HUGEINT AS sxx,
             -- state vector [s7a, s7b, s11a, s11b]: every element maps
             -- to [x, 0, x, 0] so the fold's SEED (= the first element,
             -- list_reduce convention) is the builder's initial struct
             -- and later elements contribute only e[1] = x
             list_reduce(
               list([x::DOUBLE, 0.0, x::DOUBLE, 0.0] ORDER BY d),
               (a, e) -> [e[1] + {_GOERTZEL_C7} * a[1] - a[2], a[1],
                          e[1] + {_GOERTZEL_C11} * a[3] - a[4], a[3]])
               AS st
      FROM s)
    SELECT n AS n_days,
           round((st[1] * st[1] + st[2] * st[2]
                  - {_GOERTZEL_C7} * st[1] * st[2])
                 / nullif((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
                          / n, 0.0) / n, 6) AS p7_norm,
           round((st[3] * st[3] + st[4] * st[4]
                  - {_GOERTZEL_C11} * st[3] * st[4])
                 / nullif((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
                          / n, 0.0) / n, 6) AS p11_norm
    FROM m
    """,
    category="timeseries",
)
def q_ts_goertzel_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goertzel single-bin spectral power of the daily revenue series
    at the WEEKLY frequency (period 7) with a period-11 control bin —
    the frequency-domain seasonality detector that catches a
    sinusoidal weekly cycle even when phase drift dilutes the lag-7
    autocorrelation q_ts_acf reads (and the control bin says whether
    a high reading is weekly structure or broadband noise). One row:
    series length and the two bin powers normalized by n·variance
    (a pure sinusoid at the bin frequency reads O(n/4·amp²) before
    normalization; white noise reads ~1 after it).

    Cross-engine exactness: the Goertzel recurrence
    s_t = x_t + C·s_{{t-1}} − s_{{t-2}} runs with the DECLARED literal
    coefficients 2·cos(2π/7), 2·cos(2π/11) (shared text, the
    q_ab_sprt declared-constant convention) over exact integer cents
    in identical operand order — the oracle folds the identical
    recurrence with list_reduce over time-ordered [s7a,s7b,s11a,s11b]
    state vectors (every element maps to [x,0,x,0] so the fold's
    first-element seed IS the builder's initial struct) and the
    builder uses F.aggregate: bit-identical doubles, the q_ts_holt
    discipline without the recursive CTE's O(n) self-joins; the variance denominator comes from exact
    wide-integer moments; 6-dp round as the belt, nullif for the
    constant series.

    Scale posture: one map-side-combined day aggregate; the fold
    state is TWO doubles per bin regardless of series length, and
    the series is retention-bounded. A 100 TB metrics store runs
    this per (metric, entity) — same plan, parallel across keys.

    Reference scope: the reference engine has no analytics surface;
    this extends SURVEY.md §2.4's time-series diagnostics beside
    q_ts_acf and q_ts_seasonal_decompose.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("d"),
        to_units(F.col("o_totalprice"), 100).alias("cents"),
    )
    bounds = o.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    rev = o.groupBy("d").agg(F.sum("cents").cast("long").alias("c"))
    s = grid.join(rev, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    series = s.agg(
        F.expr("array_sort(collect_list(struct(d, x))) AS xs"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    fold = (
        "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),"
        " struct(CAST(element_at(xs, 1).x AS DOUBLE) AS s7a, 0.0D AS s7b,"
        " CAST(element_at(xs, 1).x AS DOUBLE) AS s11a, 0.0D AS s11b),"
        " (acc, e) -> struct("
        f" CAST(e.x AS DOUBLE) + {_GOERTZEL_C7}D * acc.s7a - acc.s7b AS s7a,"
        " acc.s7a AS s7b,"
        f" CAST(e.x AS DOUBLE) + {_GOERTZEL_C11}D * acc.s11a - acc.s11b"
        " AS s11a,"
        " acc.s11a AS s11b))"
    )
    return series.selectExpr(
        "n",
        "sx",
        "sxx",
        f"{fold} AS st",
    ).selectExpr(
        "n AS n_days",
        # ss = Σ(x−x̄)² from exact wide moments; nullif: a constant
        # series must read NULL on both engines
        f"round((st.s7a * st.s7a + st.s7b * st.s7b"
        f" - {_GOERTZEL_C7}D * st.s7a * st.s7b)"
        " / nullif(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) / n, 0.0D)"
        " / n, 6) AS p7_norm",
        f"round((st.s11a * st.s11a + st.s11b * st.s11b"
        f" - {_GOERTZEL_C11}D * st.s11a * st.s11b)"
        " / nullif(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) / n, 0.0D)"
        " / n, 6) AS p11_norm",
    )
