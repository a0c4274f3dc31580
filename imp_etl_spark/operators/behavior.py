"""Behavioral / event-sequence analytics: funnels, cohort retention,
time-grid resampling.

The reference has no sequence analytics (its events surface stops at the
log tail, index.js:200-270); these are north-star operators over the
``events`` fixture, built as compositions of DataFrame ops — no UDFs,
no per-user collect, no global windows.

Scale design:

- ``funnel_counts`` chains one hash aggregation + one equi join per
  stage, always keyed on the user column. Each stage frame is a strict
  subset of the previous one, so the work *shrinks* monotonically down
  the funnel; nothing ever materializes per-event state beyond the
  (user, first-ts) pairs. The naive alternative — a per-user
  collect_list + Python scan — ships every event body through one
  executor task per user and dies on hot users.
- ``cohort_retention`` is two keyed shuffles: min-date per user, then
  (cohort_day, offset) distinct-user counts. Both partial-aggregate
  map-side before the exchange.
- ``resample_ffill`` materializes a bounded per-key grid (sequence +
  explode — rows generated distributed, proportional to each key's own
  time span, never to the corpus) and forward-fills via the as-of
  union trick (temporal.asof_join): ONE shuffle on the key, linear
  per-partition work. The naive grid LEFT JOIN events ON ts <= gts
  explodes quadratically per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imp_etl_spark.operators.temporal import asof_join


def funnel_stage_users(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Sequence[str] | None = None,
) -> list[DataFrame]:
    """Per-stage (user, first-completion-ts) frames for an ordered
    funnel: a user completes stage i at the EARLIEST event of type
    ``stages[i]`` at-or-after their stage i-1 completion — and, when
    ``within`` is given, no later than ``within[i-1]`` (an INTERVAL
    string like ``'12 hours'``) after it.

    Returns one frame per stage: ``[user_col, __t0], [user_col, __t0,
    __t1], ...`` — inner-join semantics (users drop out at the first
    stage they never complete). ``>=`` (not ``>``) on the timestamp so
    same-instant multi-events count, matching the SQL oracle.
    """
    if within is not None and len(within) != len(stages) - 1:
        raise ValueError("within needs one interval per stage transition")
    first = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t0"))
    )
    frames = [first]
    for i, stage in enumerate(stages[1:], start=1):
        prev = frames[-1]
        prev_ts = [c for c in prev.columns if c != user_col]
        admissible = F.col("__ts") >= F.col(f"__t{i - 1}")
        if within is not None:
            admissible = admissible & (
                F.col("__ts")
                <= F.col(f"__t{i - 1}") + F.expr(f"INTERVAL {within[i - 1]}")
            )
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(prev, on=user_col, how="inner")
            .filter(admissible)
            .groupBy(user_col)
            .agg(
                *[F.min(c).alias(c) for c in prev_ts],
                F.min("__ts").alias(f"__t{i}"),
            )
        )
        frames.append(nxt)
    return frames


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Sequence[str] | None = None,
) -> DataFrame:
    """Ordered-funnel summary: one row per stage with the number of
    users who reached it and the conversion rate vs stage 0.

    Each per-stage count is a single-row aggregate; the union of stage
    rows and the stage-0 total join are driver-free 1-row broadcasts.
    The only float op is one users/base IEEE division per row.
    """
    frames = funnel_stage_users(
        events, stages, user_col, ts_col, type_col, within)
    rows = None
    for i, (stage, frame) in enumerate(zip(stages, frames)):
        one = frame.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col("users"),
        )
        rows = one if rows is None else rows.unionByName(one)
    base = rows.filter(F.col("stage_idx") == 0).select(
        F.col("users").alias("__base"))
    return (
        rows.crossJoin(F.broadcast(base))
        .select(
            "stage_idx", "stage", "users",
            # try_divide: a zero-user funnel (empty day partition) yields
            # NULL conv_pct — DuckDB's x/0 semantics — instead of an ANSI
            # DIVIDE_BY_ZERO abort taking down the whole report job
            F.try_divide(F.col("users").cast("double"),
                         F.col("__base").cast("double")).alias("conv_pct"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted distinct on each day-offset they were active.

    Two keyed shuffles (user -> min date; (cohort_day, offset) ->
    distinct users); the cohort frame joins back to events on the user
    key as a plain hash join — at 100 TB that is a shuffle join on the
    natural key, never a broadcast of the user dimension.
    """
    day = F.to_date(F.col(ts_col))
    cohorts = events.groupBy(user_col).agg(
        F.min(day).alias("cohort_day"))
    return (
        events.select(user_col, day.alias("__day"))
        .join(cohorts, on=user_col, how="inner")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    out_col: str = "last_value",
) -> DataFrame:
    """Per-key time-grid resample with forward fill: one row per ``step``
    tick between each key's first and last event (tick boundaries
    truncated to the step unit), carrying the value of the latest event
    at-or-before the tick (null before the first event's tick).

    Grid generation is sequence()+explode per key — distributed, sized
    by each key's own span. The fill is temporal.asof_join's union +
    running-last window: one shuffle on the key. Duplicate (key, ts)
    build rows resolve to the max value (asof_join's tiebreak), mirrored
    in the oracle.
    """
    unit = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    # temporal contract (see state_intervals): untimed events neither
    # bound the grid nor supply fill values
    events = events.where(F.col(ts_col).isNotNull())
    bounds = events.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("__hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.expr(f"sequence(__lo, __hi, INTERVAL {step})")
        ).alias("grid_ts"),
    )
    return asof_join(
        grid,
        events.select(key_col, ts_col, value_col),
        on=key_col,
        probe_ts="grid_ts",
        build_ts=ts_col,
        build_cols={value_col: out_col},
    )


def activity_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user, one
    row per streak with its start day and length.

    The island key is the classic day - row_number trick: within a
    user's DISTINCT active days ordered ascending, consecutive days
    share ``day - rn`` — one keyed shuffle for the window, one for the
    per-island rollup, both on the user key (the second is (user, grp),
    a refinement that AQE coalesces into small partitions). No
    self-joins, no sequence explosion.
    """
    day = F.to_date(F.col(ts_col))
    d = events.select(F.col(user_col), day.alias("__day")).distinct()
    w = Window.partitionBy(user_col).orderBy(F.col("__day").asc())
    g = d.withColumn(
        "__grp", F.date_sub(F.col("__day"), F.row_number().over(w)))
    return (
        g.groupBy(user_col, "__grp")
        .agg(
            F.min("__day").alias("streak_start"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("__grp")
    )


def state_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD-Type-2 interval compression: collapse a per-key event-state
    sequence into ``[valid_from, valid_to)`` intervals — a new interval
    opens whenever the state differs from the previous event's state
    (ordered by ``ts, tiebreak``), and the key's last interval stays
    open (``valid_to`` null, ``is_current`` true).

    Two windows over ONE shuffle on the key (same partitioning, shared
    sort): lag() marks change points, lead() over the change points
    closes each interval. This is the dimension-history build the
    reference's MERGE sink cannot express (plans/upsert.py keeps only
    the latest row); at 100 TB it is two linear passes per partition.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    # temporal contract: an event without a timestamp cannot be
    # sequenced into a state history — excluded, not sorted to an
    # engine-dependent end (Spark asc = nulls first, most SQL engines =
    # nulls last; a null-ts row would silently shift every interval)
    marked = events.where(F.col(ts_col).isNotNull()).select(
        F.col(key_col), F.col(ts_col), F.col(state_col),
        F.col(tiebreak_col),
        F.lag(F.col(state_col)).over(w).alias("__prev"),
    )
    changes = marked.filter(
        ~F.col(state_col).eqNullSafe(F.col("__prev")))
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    return (
        changes.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
