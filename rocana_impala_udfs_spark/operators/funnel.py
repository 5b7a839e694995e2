"""Funnel analysis over event streams — ordered-step conversion counting.

The reference's host product (log/event analytics) delegates this to SQL;
here it is a first-class operator: for an ordered list of step event types,
count users whose FIRST qualifying occurrence of each step happens after
their first qualifying occurrence of the previous step (classic
first-touch funnel).

Scale shape: one groupBy per step over a progressively SHRINKING keyed
frame (step i+1 only scans events of its own type joined against step i's
survivors — a broadcast or shuffle join on the user key that AQE sizes at
runtime). No window over the whole event stream, no per-user event
collection; state per step is one timestamp per surviving user.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users) for the ordered ``steps`` funnel.

    A user converts at step i when an event of ``steps[i]`` exists strictly
    after their step-(i-1) conversion time; the conversion time is the MIN
    such timestamp (first touch).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = events.sparkSession
    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("step_ts"))
    )
    counts = [stage.agg(F.count(F.lit(1)).alias("n_users"))]
    for s in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .join(stage.select(key_col, F.col("step_ts").alias("prev_ts")), key_col)
            .filter(F.col(ts_col) > F.col("prev_ts"))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias("step_ts"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).alias("n_users")))
        stage = nxt
    labeled = [
        c.select(F.lit(i).alias("step_idx"), F.lit(name).alias("step"), "n_users")
        for i, (name, c) in enumerate(zip(steps, counts))
    ]
    return reduce(DataFrame.unionAll, labeled)


def retention_cohorts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped into cohorts by their
    first-activity week; for each (cohort, week offset), the count of
    cohort members active that week.

    Returns ``(cohort_week_us, offset_weeks, n_users)``. Two map-side-
    combined aggregations (first-week per user; distinct active weeks) and
    one join on the user key — at scale both sides are co-keyed on
    ``key_col`` so the join reuses the aggregation's partitioning.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(key_col).agg(F.min(wk).alias("cohort_week"))
    active = events.select(key_col, wk.alias("wk")).distinct()
    return (
        active.join(first, key_col)
        .select(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int").alias("offset_weeks"),
        )
        .groupBy("cohort_week_us", "offset_weeks")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
