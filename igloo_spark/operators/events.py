"""Event-stream analytics: funnels, retention cohorts, multi-grain
rollups.

The reference stops at windowed aggregation over the event table; these
are the product-analytics operators (ClickHouse ``windowFunnel``,
Timescale continuous aggregates, Amplitude-style cohorts) an engine
serving an events workload is expected to have.

Scale shapes:
- funnel: every per-stage timestamp is a conditional-min window over
  the SAME ``partitionBy(user)`` — Catalyst plans one Exchange + one
  Sort and layers the windows on it, so a k-stage funnel costs one
  shuffle of the events, not k.
- cohorts: first-touch is a user-keyed partial aggregate; the
  activity join is user-keyed too (same key → exchange reuse /
  broadcast when the user dimension is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users reached stage i by
    doing ``stages[i]`` strictly after their stage i-1 time.

    Stage time t_i = min event time of type ``stages[i]`` with
    ``ts > t_{i-1}`` for that user (t_0 unconstrained). ``within``
    bounds each step by an interval string (e.g. ``"1 hour"`` — the
    ClickHouse ``windowFunnel`` conversion window): the step then also
    requires ``ts <= t_{i-1} + INTERVAL within``. Returns one row per
    stage: (stage_idx, stage, n_users), where n_users is the count of
    users with a non-null t_i.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    gap = None
    if within is not None:
        parts = within.split()
        if len(parts) != 2 or not parts[0].replace(".", "", 1).isdigit():
            raise ValueError(f"within must look like '1 hour', got {within!r}")
        gap = F.expr(f"INTERVAL {within}")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
            if gap is not None:
                cond = cond & (F.col(ts_col) <= F.col(prev) + gap)
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"_t{i}"
    per_user = df.groupBy(user_col).agg(
        *[F.min(f"_t{i}").alias(f"t{i}") for i in range(len(stages))]
    )
    counts = per_user.agg(
        *[
            F.count(f"t{i}").cast("bigint").alias(f"n{i}")
            for i in range(len(stages))
        ]
    )
    tagged = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("stage_idx"),
                F.lit(" > ".join(stages[: i + 1])).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i in range(len(stages))
        ]
    )
    return counts.select(F.inline(tagged))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention: users bucketed by first-touch period, counted
    per subsequent activity period.

    Returns (cohort, period_n, n_active): cohort = date_trunc(grain,
    first event), period_n = whole ``grain``s between cohort and the
    activity period, n_active = distinct users from that cohort active
    in that period.
    """
    days = {"week": 7, "day": 1}
    if grain not in days:
        raise ValueError(f"grain must be one of {sorted(days)}, got {grain!r}")
    first = (
        events.groupBy(user_col)
        .agg(F.date_trunc(grain, F.min(ts_col)).alias("cohort"))
    )
    period = F.date_trunc(grain, F.col(ts_col))
    return (
        events.join(first, user_col)
        .select(
            F.col("cohort"),
            (
                F.datediff(period, F.col("cohort")) / days[grain]
            ).cast("bigint").alias("period_n"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_n")
        .agg(F.count_distinct(user_col).cast("bigint").alias("n_active"))
    )
