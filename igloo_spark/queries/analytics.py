"""Window functions, event analytics, JSON, and array surface
(SURVEY §2.B rows: window functions, frames; array/struct/map;
plus the events-table analytics the reference's CDC roadmap implies).

Parity rules: ranking funcs cast to BIGINT (Spark INT vs DuckDB
BIGINT); ntile cast likewise; array element math in DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from igloo_spark.queries.registry import register, table


@register(
    "q30_window_ranking",
    "ranking window functions: row_number/rank/dense_rank/percent_rank/cume_dist/ntile",
    """
    SELECT * FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 5
    """,
    tags=("window",),
    bench=True,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "q31_window_offsets",
    "offset window functions: lag/lead/first_value/last_value/nth_value + running sum",
    """
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
           nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_val,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 2).over(w_full).alias("second_val"),
        F.sum("value").over(w_run).alias("running_sum"),
    )


@register(
    "q32_window_range_frame",
    "RANGE BETWEEN numeric frame (value-based window)",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band,
           avg(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS band_avg
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("window",),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w1 = Window.partitionBy("o_orderpriority").orderBy("o_totalprice").rangeBetween(-10000, 0)
    w2 = Window.partitionBy("o_orderpriority").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w1).alias("n_in_band"),
        F.avg("o_totalprice").over(w2).alias("band_avg"),
    )


@register(
    "q33_sessionization",
    "session assignment via lag + gap>30min cumulative sum (classic stream-on-batch)",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "events"),
    bench=True,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ-safe epoch seconds: TIMESTAMP_NTZ can't cast straight to long,
    # but NTZ→timestamp→long is valid for both timestamp flavors.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | (ts_s - prev_ts.cast("timestamp").cast("long") > 1800), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(ts_s) - F.min(ts_s)).cast("bigint").alias("duration_s"),
        )
    )


@register(
    "q34_pivot_conditional",
    "pivot via conditional aggregation (event_type → columns)",
    """
    SELECT user_id % 10 AS user_bucket,
           sum(value) FILTER (WHERE event_type = 'click') AS click_value,
           sum(value) FILTER (WHERE event_type = 'view') AS view_value,
           sum(value) FILTER (WHERE event_type = 'purchase') AS purchase_value,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signups
    FROM events
    GROUP BY user_id % 10
    """,
    tags=("aggregation", "events"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    et = F.col("event_type")
    return e.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.sum(F.when(et == "click", F.col("value"))).alias("click_value"),
        F.sum(F.when(et == "view", F.col("value"))).alias("view_value"),
        F.sum(F.when(et == "purchase", F.col("value"))).alias("purchase_value"),
        F.count(F.when(et == "error", 1)).alias("n_errors"),
        F.count(F.when(et == "signup", 1)).alias("n_signups"),
    )


@register(
    "q35_json_extraction",
    "JSON field extraction from the events.props string column",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           avg(value) AS avg_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
    """,
    tags=("functions", "events"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("bigint") % 10
    return e.groupBy(k.alias("k_bucket")).agg(
        F.count("*").alias("n"), F.avg("value").alias("avg_value")
    )


@register(
    "q36_time_bucket_agg",
    "date_bin-style time bucketing (date_trunc day) over the event stream",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           count(*) AS n,
           sum(value) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
    tags=("aggregation", "events"),
    bench=True,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day"), F.col("event_type")).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q37_array_explode",
    "array explode/unnest: per-bucket stats over flattened embeddings",
    """
    SELECT vec_id % 10 AS bucket,
           count(*) AS n_elems,
           avg(CAST(e AS DOUBLE)) AS avg_val,
           min(CAST(e AS DOUBLE)) AS min_val,
           max(CAST(e AS DOUBLE)) AS max_val
    FROM embeddings, unnest(embedding) AS t(e)
    GROUP BY vec_id % 10
    """,
    tags=("arrays",),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select((F.col("vec_id") % 10).alias("bucket"), F.explode("embedding").alias("e"))
    ed = F.col("e").cast("double")
    return flat.groupBy("bucket").agg(
        F.count("*").alias("n_elems"),
        F.avg(ed).alias("avg_val"),
        F.min(ed).alias("min_val"),
        F.max(ed).alias("max_val"),
    )


@register(
    "q38_array_functions",
    "array functions: size, element_at, array min/max/contains-style predicates",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_elem,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_elem,
           label
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("arrays",),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_min("embedding").cast("double").alias("min_elem"),
        "label",
    )


@register(
    "q39_struct_map",
    "struct construction + field access through an aggregation",
    """
    SELECT seg_info.seg AS segment, seg_info.tier AS tier, count(*) AS n
    FROM (
        SELECT {'seg': c_mktsegment,
                'tier': CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END} AS seg_info
        FROM customer
    )
    GROUP BY seg_info.seg, seg_info.tier
    """,
    tags=("arrays",),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    seg_info = F.struct(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") > 5000, "gold").otherwise("std").alias("tier"),
    )
    return (
        c.select(seg_info.alias("seg_info"))
        .groupBy(F.col("seg_info.seg").alias("segment"), F.col("seg_info.tier").alias("tier"))
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Temporal joins (operators Spark lacks built-in; igloo_spark.operators.temporal)
# --------------------------------------------------------------------------
@register(
    "q66_asof_join",
    "as-of join: each click event gets the latest prior purchase value per user "
    "(union+forward-fill plan: one shuffle+sort, no nested-loop join)",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           p.ts AS purchase_ts, p.value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("temporal", "join", "events"),
    bench=True,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both as-of sides are subsets of the SAME events table, so use
    # the single-scan variant: the generic asof_join would scan events
    # once per side; tagging sides with a column expression halves the
    # IO while keeping the identical one-exchange forward-fill window
    from igloo_spark.operators.temporal import asof_join_single_scan

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return asof_join_single_scan(
        ev,
        key="user_id",
        ts="ts",
        left_pred=F.col("event_type") == "click",
        left_cols=["event_id", "user_id", "ts", "value"],
        right_cols={"ts": "purchase_ts", "value": "purchase_value"},
    )


@register(
    "q67_band_join",
    "band join: same-user event pairs within 60s (bucketed equi-join, no O(n^2) theta join)",
    """
    SELECT a.user_id,
           a.event_id AS event_id_a, b.event_id AS event_id_b,
           a.ts AS ts_a, b.ts AS ts_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch(a.ts) - epoch(b.ts)) <= 60
    """,
    tags=("temporal", "join", "events"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.temporal import band_join

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return band_join(ev, key="user_id", ts="ts", band_seconds=60, id_col="event_id")


@register(
    "q76_session_window",
    "built-in session_window (30-min gap) cross-validated vs first-principles islands SQL",
    """
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("window", "events"),
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window aggregation — one shuffle on the
    session key, merge done inside the aggregation operator (no window
    function pass). The oracle recomputes sessions from first
    principles (lag + gap-sum islands), so this query proves the
    built-in operator's semantics, not just its plumbing."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "x76_hypertable_rollup",
    "continuous-aggregate rollup: hour AND day grains in ONE scan via grouping sets",
    """
    SELECT *,
           CASE WHEN hour_b IS NULL THEN 'day' ELSE 'hour' END AS grain
    FROM (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_b,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_b,
               event_type,
               count(*) AS n,
               sum(value) AS total_value
        FROM events
        GROUP BY event_type,
                 GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)))
    )
    """,
    tags=("aggregation", "events", "timeseries"),
)
def x76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Timescale continuous-aggregate / ClickHouse rollup shape:
    every grain of the time hierarchy from ONE scan of the events
    (Expand x2 + one shuffle), instead of one scan per grain. At
    100 TB the rollup output is what gets stored and re-served; the
    raw table is read once."""
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT *,
               CASE WHEN hour_b IS NULL THEN 'day' ELSE 'hour' END AS grain
        FROM (
            SELECT date_trunc('hour', ts) AS hour_b,
                   date_trunc('day', ts) AS day_b,
                   event_type,
                   count(*) AS n,
                   sum(value) AS total_value
            FROM events
            GROUP BY event_type,
                     GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)))
        )
        """
    )


@register(
    "x77_funnel",
    "ordered funnel: users reaching view -> click -> purchase, stages strictly in order",
    """
    WITH s0 AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND e.ts > s0.t0
        GROUP BY e.user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        GROUP BY e.user_id
    )
    SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
           CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'view > click',
           CAST((SELECT count(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view > click > purchase',
           CAST((SELECT count(*) FROM s2) AS BIGINT)
    """,
    tags=("events", "window"),
)
def x77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel equivalent. The oracle computes each
    stage with a join per stage; the Spark side layers conditional-min
    windows on ONE user-keyed Exchange (operators/events.py) — the
    hash match certifies the single-shuffle formulation."""
    from igloo_spark.operators.events import funnel_counts

    e = table(spark, sf_dir, "events")
    return funnel_counts(e, ["view", "click", "purchase"])


@register(
    "x78_retention_cohorts",
    "weekly retention cohorts: first-touch week x activity week distinct users",
    """
    WITH first AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7 AS BIGINT)
               AS period_n,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first f ON e.user_id = f.user_id
    GROUP BY f.cohort, date_trunc('week', e.ts)
    """,
    tags=("events", "aggregation"),
)
def x78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amplitude-style cohort retention (operators/events.py):
    first-touch is a user-keyed partial aggregate; the activity join
    shares the user key, so the exchange is reused rather than
    re-shuffled."""
    from igloo_spark.operators.events import retention_cohorts

    e = table(spark, sf_dir, "events")
    return retention_cohorts(e, grain="week")


@register(
    "q93_rolling_zscore",
    "rolling z-score anomaly flags: value vs trailing 20-event mean/std per user",
    """
    WITH stats AS (
        SELECT user_id, event_id, ts, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(*) OVER w AS n_hist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, value,
           round((value - mu) / sd, 6) AS z
    FROM stats
    WHERE n_hist >= 5 AND sd > 0 AND abs(round((value - mu) / sd, 6)) > 2.5
    """,
    tags=("window", "events", "timeseries"),
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry anomaly gate: each event's value scored against its
    own user's trailing 20-event distribution — one window pass on the
    user-keyed exchange (the same single-Exchange shape as q33/x77).
    The >= 5-event history floor avoids unstable early stds; z is
    rounded before thresholding so both engines flag identical rows.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = e.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6)
    return (
        stats.filter((F.col("n_hist") >= 5) & (F.col("sd") > 0))
        .select("user_id", "event_id", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@register(
    "q99_gaps_islands",
    "gaps-and-islands: maximal runs of consecutive active days per user",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
        SELECT user_id, d,
               date_diff('day', DATE '2024-01-01', d)
                   - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    )
    SELECT user_id, min(d) AS island_start, max(d) AS island_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM seq GROUP BY user_id, grp
    """,
    tags=("window", "events", "timeseries"),
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands idiom (streak detection): day
    ordinal minus per-user row_number is constant within a run of
    consecutive days, so maximal streaks fall out of one groupBy. The
    distinct, the window and the island rollup all share the user key
    — a single user-keyed Exchange end to end, the q33/x77 shape."""
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    seq = days.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w),
    )
    return (
        seq.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("island_start"),
            F.max("d").alias("island_end"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .drop("grp")
    )


@register(
    "x91_scd2_history",
    "SCD Type-2 build: per-user event_type validity intervals with current flag",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS version,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
               AS is_current
    FROM changes
    """,
    tags=("window", "events", "warehouse"),
)
def x91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history build from a change
    stream: collapse repeats to change points (lag), then stamp each
    with its validity interval (lead) and version. Both windows share
    the user-keyed sort, so the whole dimension build is one Exchange
    + one sort — the standard warehouse pattern a MERGE-based SCD2
    (q80 covers MERGE) would otherwise need multiple passes for.
    Ordering ties break on event_id in both engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = ordered.filter(
        F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )
