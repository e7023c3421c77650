"""Event-time window queries over the events table (engine extension).

Batch-mode versions of the Structured Streaming transforms in
streaming/windows.py — the SAME functions run under readStream (verified in
tests/test_streaming.py); here they face the DuckDB oracle.

Window alignment: Spark's F.window aligns tumbling windows to the unix
epoch; the oracles reproduce that with epoch arithmetic rather than
time_bucket (same alignment, engine-independent).

Oracle typing: DuckDB's to_timestamp() returns TIMESTAMP WITH TIME ZONE;
Spark's window bounds are naive TIMESTAMP. Every to_timestamp() in these
oracles is wrapped in CAST(... AS TIMESTAMP) so schema + value hashes
compare against Spark's naive type (the r2 gate failed 3 rows on exactly
this).

Determinism: counts, min/max (exact selections) and DECIMAL(18,6) sums of
the 2-decimal `value` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.windows import session_window_agg, sliding_window_agg, tumbling_window_agg
from .registry import register

_VAL_AGGS = lambda: [  # noqa: E731
    F.count("*").alias("n_events"),
    F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    F.min("value").alias("min_value"),
    F.max("value").alias("max_value"),
]

_VAL_AGGS_SQL = """
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
"""


@register(
    "events_tumbling",
    oracle=f"""
    SELECT CAST(to_timestamp((epoch_us(ts) // 3600000000) * 3600) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp((epoch_us(ts) // 3600000000) * 3600 + 3600) AS TIMESTAMP) AS window_end,
           event_type,
           {_VAL_AGGS_SQL}
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("streaming",),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows per event_type."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(events, "1 hour", aggs=_VAL_AGGS())


@register(
    "events_sliding",
    oracle=f"""
    WITH starts AS (
        SELECT *, unnest([ (epoch_us(ts) // 1800000000) * 1800,
                           (epoch_us(ts) // 1800000000) * 1800 - 1800 ]) AS win_start
        FROM events
    )
    SELECT CAST(to_timestamp(win_start) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(win_start + 3600) AS TIMESTAMP) AS window_end,
           event_type,
           {_VAL_AGGS_SQL}
    FROM starts
    WHERE epoch_us(ts) >= win_start * 1000000 AND epoch_us(ts) < (win_start + 3600) * 1000000
    GROUP BY 1, 2, 3
    """,
    tags=("streaming",),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min per event_type (each event in 2 windows)."""
    events = load_table(spark, sf_dir, "events")
    return sliding_window_agg(events, "1 hour", "30 minutes", aggs=_VAL_AGGS())


@register(
    "events_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("streaming",),
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window in batch;
    the oracle derives the same sessions with gaps-and-islands SQL
    (session_end = last event + gap, matching Spark's semantics)."""
    events = load_table(spark, sf_dir, "events")
    return session_window_agg(events, "30 minutes", aggs=[F.count("*").alias("n_events")])


@register(
    "events_topk_users_per_window",
    oracle="""
    WITH per_user AS (
        SELECT CAST(to_timestamp((epoch_us(ts) // 3600000000) * 3600) AS TIMESTAMP) AS window_start,
               user_id, count(*) AS n_events
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT window_start, user_id, n_events,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY n_events DESC, user_id) AS rnk
        FROM per_user
    )
    SELECT window_start, user_id, n_events, rnk FROM ranked WHERE rnk <= 3
    """,
    tags=("streaming", "sort"),
)
def events_topk_users_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per tumbling hour: windowed aggregation +
    ranking window — the per-window top-K analytics pattern. The rank
    window partitions by window_start (many partitions, bounded size);
    ties broken by user_id for determinism."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "user_id", "n_events")
    )
    w = Window.partitionBy("window_start").orderBy(F.col("n_events").desc(), "user_id")
    return per_user.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


@register(
    "z_events_interval_join",
    oracle="""
    SELECT v.user_id,
           count(*) AS n_pairs,
           min(epoch_us(p.ts) - epoch_us(v.ts)) AS min_delay_us,
           max(epoch_us(p.ts) - epoch_us(v.ts)) AS max_delay_us
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
    tags=("streaming",),
)
def z_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-stream interval join (streaming/joins.py):
    purchases within 1h of a view by the same user, per-user pair counts and
    delay bounds (exact integer microseconds)."""
    from ..streaming.joins import interval_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    buys = events.filter(F.col("event_type") == "purchase")
    pairs = interval_join(views, buys, "user_id", watermark=None)
    delay = F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("ts"))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(delay).alias("min_delay_us"),
        F.max(delay).alias("max_delay_us"),
    )


@register(
    "z_events_interval_join_outer",
    oracle="""
    SELECT v.user_id,
           count(*) AS n_rows,
           count(p.event_id) AS n_matched_pairs,
           count(CASE WHEN p.event_id IS NULL THEN 1 END) AS n_unmatched_views,
           count(DISTINCT CASE WHEN p.event_id IS NOT NULL THEN v.event_id END)
               AS n_matched_views
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
    tags=("streaming",),
)
def z_events_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the LEFT OUTER stream-stream interval join
    (streaming/joins.py, how='left'; streamed e2e in test_streaming.py):
    views NULL-pad when no purchase lands in the hour. Per-user matched /
    unmatched accounting — the retention-analytics shape where absence of
    a follow-up event is itself the signal (reference analogue: datajoin's
    outer-join reducer, DataJoinReducerBase.java)."""
    from ..streaming.joins import interval_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    buys = events.filter(F.col("event_type") == "purchase")
    pairs = interval_join(views, buys, "user_id", watermark=None, how="left")
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("r_event_id").alias("n_matched_pairs"),
        F.count(F.when(F.col("r_event_id").isNull(), F.lit(1))).alias(
            "n_unmatched_views"
        ),
        F.count_distinct(
            F.when(F.col("r_event_id").isNotNull(), F.col("event_id"))
        ).alias("n_matched_views"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(t_signup) AS n_signup,
           count(CASE WHEN t_view > t_signup THEN 1 END) AS n_view_after_signup,
           count(CASE WHEN t_purchase > t_view AND t_view > t_signup THEN 1 END)
               AS n_full_funnel
    FROM firsts
    """,
    tags=("events", "analytics"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → view → purchase funnel by first-occurrence ordering: one
    map-side-combining per-user aggregate (conditional min(ts) per stage),
    then a global count — no self-joins, no windows, one shuffle on
    user_id. The reference would run this as a secondary-sort reducer over
    per-user event streams (EX/SecondarySort.java idiom)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_view") > F.col("t_signup"), F.lit(1))).alias(
            "n_view_after_signup"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_view"))
                & (F.col("t_view") > F.col("t_signup")),
                F.lit(1),
            )
        ).alias("n_full_funnel"),
    )


@register(
    "z_events_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY 1
    )
    SELECT c.cohort_day,
           datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "analytics"),
)
def z_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    day-offset of later activity. Cohort table is user-grained (small
    relative to events) and joins back on user_id; at 100 TB both sides
    hash-partition on user_id and AQE picks broadcast when cohorts fit."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    return (
        ev.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "z_events_asof_view",
    oracle="""
    WITH r AS (
        SELECT user_id, ts AS ats, 0 AS side, event_id AS tie,
               event_id AS r_vid, value AS r_vval, NULL::BIGINT AS purchase_id
        FROM events WHERE event_type = 'view'
    ), l AS (
        SELECT user_id, ts AS ats, 1 AS side, 0 AS tie,
               NULL::BIGINT AS r_vid, NULL::DOUBLE AS r_vval, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
    ), u AS (
        SELECT * FROM r UNION ALL SELECT * FROM l
    ), c AS (
        SELECT *,
               last_value(r_vid IGNORE NULLS) OVER w AS asof_view_id,
               last_value(r_vval IGNORE NULLS) OVER w AS asof_view_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ats, side, tie
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ats AS ts, purchase_id, asof_view_id, asof_view_value
    FROM c WHERE side = 1
    """,
    tags=("events", "join", "analytics"),
)
def z_events_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase enriched with the user's most
    recent prior-or-equal view (operators/joins.asof_join — one shuffle,
    union-and-window, never an inequality join)."""
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases, views, "user_id", "ts", ["view_id", "view_value"],
        right_id_col="view_id",
    )


@register(
    "z_events_resample_ffill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('day', min(ts)) AS lo,
               date_trunc('day', max(ts)) AS hi
        FROM events GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS gts
        FROM bounds
    ), r AS (
        SELECT user_id, ts AS ats, 0 AS side, event_id AS tie,
               event_id AS r_eid, value AS r_val,
               NULL::TIMESTAMP AS grid_ts
        FROM events
    ), l AS (
        SELECT user_id, gts AS ats, 1 AS side, 0 AS tie,
               NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val, gts AS grid_ts
        FROM grid
    ), u AS (
        SELECT * FROM r UNION ALL SELECT * FROM l
    ), c AS (
        SELECT *,
               last_value(r_eid IGNORE NULLS) OVER w AS asof_event_id,
               last_value(r_val IGNORE NULLS) OVER w AS asof_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ats, side, tie
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, grid_ts, asof_event_id, asof_value
    FROM c WHERE side = 1
    """,
    tags=("events", "analytics", "join"),
)
def z_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a per-user daily grid with forward fill: grid points
    take the latest prior-or-equal event's (event_id, value). Grid
    generation is a bounded per-key sequence explode; the fill is the
    as-of operator (one shuffle) — the time-series gap-fill idiom with no
    self-join and no per-row Python."""
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("ts"),
        )
        .withColumn("grid_ts", F.col("ts"))
    )
    obs = ev.select(
        "user_id", "ts",
        F.col("event_id").alias("eid"),
        F.col("value").alias("val"),
    )
    out = asof_join(grid, obs, "user_id", "ts", ["eid", "val"], right_id_col="eid")
    return out.select(
        "user_id",
        "grid_ts",
        F.col("asof_eid").alias("asof_event_id"),
        F.col("asof_val").alias("asof_value"),
    )


@register(
    "z_events_anomaly",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id, ts, value,
               count(*) OVER win AS n_prev,
               sum(CAST(value AS DECIMAL(18,6))) OVER win AS s1,
               sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER win AS s2
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, value,
           CAST(s1 AS DOUBLE) / n_prev AS roll_mean
    FROM w
    WHERE n_prev >= 5
      AND abs(value - CAST(s1 AS DOUBLE) / n_prev)
          > 3 * sqrt(greatest(
                CAST(s2 AS DOUBLE) / n_prev
                    - (CAST(s1 AS DOUBLE) / n_prev) * (CAST(s1 AS DOUBLE) / n_prev),
                0.0))
    """,
    tags=("events", "analytics", "window"),
)
def z_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: events whose value deviates > 3σ
    from the user's previous ≤10 events. Sums are DECIMAL-exact inside
    the window (engine-portable); mean/variance derive by IEEE division.
    One shuffle on user_id; window frames are row-bounded so state per
    key is O(10)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    dv = F.col("value").cast("decimal(18,6)")
    w = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(win).alias("n_prev"),
        F.sum(dv).over(win).alias("s1"),
        F.sum(dv * dv).over(win).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_prev")
    var = F.greatest(
        F.col("s2").cast("double") / F.col("n_prev") - mean * mean, F.lit(0.0)
    )
    return (
        w.filter(F.col("n_prev") >= 5)
        .filter(F.abs(F.col("value") - mean) > 3 * F.sqrt(var))
        .select("user_id", "event_id", "value", mean.alias("roll_mean"))
    )


@register(
    "z_events_json_props",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
               / CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) AS avg_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def z_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction over the events table:
    pull `$.k` out of the JSON `props` column and aggregate per event
    type — the schema-on-read path every log pipeline needs. Extraction is
    get_json_object (JVM codegen, no Python); at 100 TB prefer parsing
    ONCE with from_json into a struct column at ingest and letting column
    pruning skip the raw string thereafter (this query is the
    extract-in-place form for when the schema is not known at ingest)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k).cast("double")).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "z_events_stickiness",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(ts AS DATE) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM events GROUP BY 1, 2
    ), weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM events GROUP BY 1
    )
    SELECT d.week,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.dau) AS BIGINT) AS sum_dau,
           w.wau,
           (CAST(sum(d.dau) AS DOUBLE) / CAST(count(*) AS DOUBLE))
               / CAST(w.wau AS DOUBLE) AS stickiness
    FROM daily d JOIN weekly w USING (week)
    GROUP BY d.week, w.wau
    ORDER BY d.week
    """,
    tags=("events", "aggregate"),
)
def z_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week (the engagement ratio product
    analytics alert on): mean daily distinct users over weekly distinct
    users. Two distinct aggregates (day- and week-keyed, both expanding
    to two-phase distinct with map-side partials), joined on the
    bounded week key; exact integer counts, two IEEE divisions."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    daily = ev.groupBy(week, F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(week).agg(F.countDistinct("user_id").alias("wau"))
    return (
        daily.groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_days"), F.sum("dau").alias("sum_dau"))
        .join(weekly, "week")
        .select(
            "week",
            "n_days",
            "sum_dau",
            "wau",
            (
                (F.col("sum_dau").cast("double") / F.col("n_days").cast("double"))
                / F.col("wau").cast("double")
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


@register(
    "z_events_conversion_lag",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    ), conv AS (
        SELECT epoch_us(t_purchase) - epoch_us(t_signup) AS lag_us
        FROM firsts WHERE t_purchase > t_signup
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(lag_us) AS BIGINT) AS min_lag_us,
           CAST(max(lag_us) AS BIGINT) AS max_lag_us,
           CAST(sum(lag_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
               AS mean_lag_s,
           CAST(count(CASE WHEN lag_us <= 3600000000 THEN 1 END) AS BIGINT)
               AS n_within_1h,
           CAST(count(CASE WHEN lag_us <= 86400000000 THEN 1 END) AS BIGINT)
               AS n_within_1d
    FROM conv
    """,
    tags=("events", "analytics"),
)
def z_events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution: exact integer-
    microsecond deltas from the funnel's per-user conditional-min
    aggregate (one user_id shuffle, no self-joins); mean folds the exact
    BIGINT sum once, the within-1h/1d shares are pure integer compares —
    engine-identical by construction (second-granularity date_diff would
    round sub-second parts differently per engine)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    conv = firsts.filter(F.col("t_purchase") > F.col("t_signup")).select(
        (F.unix_micros("t_purchase") - F.unix_micros("t_signup")).alias("lag_us")
    )
    n = F.count(F.lit(1))
    return conv.agg(
        n.alias("n_converted"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
        (F.sum("lag_us").cast("double") / n.cast("double") / F.lit(1000000.0)).alias(
            "mean_lag_s"
        ),
        F.count(F.when(F.col("lag_us") <= 3600 * 1000 * 1000, F.lit(1))).alias(
            "n_within_1h"
        ),
        F.count(F.when(F.col("lag_us") <= 86400 * 1000 * 1000, F.lit(1))).alias(
            "n_within_1d"
        ),
    )
