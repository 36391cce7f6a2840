"""Event-stream session / funnel / cohort operators (W-family
extension: the reference's W1 adjacent-pair window shape —
R/mergecheck_functions.R:150-168 — generalized to the three classic
event-analytics reductions an OLAP engine is expected to own).

All three are single-key window/aggregate compositions over the
``user_id`` partitioning:

* ``sessionize`` — gap-based session assignment: ONE hash exchange by
  user, every window (lag, running sum) rides the same partition spec,
  so Catalyst plans consecutive Window nodes over one shuffle.
* ``funnel_times`` — ordered-step conversion: three unbounded
  per-user window minima chained (step k's minimum is conditioned on
  step k-1's), then a same-key groupBy that REUSES the window's hash
  partitioning (no second exchange — required distribution already
  satisfied).
* ``retention_matrix`` — cohort × offset active-user counts: one
  per-user window for the cohort anchor, one final two-phase
  count-distinct aggregate.

Scale posture (100 TB): everything is keyed by user — parallelism is
user cardinality, no corpus-wide sort, no driver-side state.  Time
arithmetic is exact integer epoch-microseconds (``ts_us``; the repo's
engine-stability rule — float timestamps hash-diverge across engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    order_cols: Sequence[str] = ("ts_us", "event_id"),
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Gap-based sessionization: within each user's time-ordered event
    stream, a gap > ``gap_us`` starts a new session.  Adds
    ``session_seq`` (1-based per user, in time order).

    The boundary flag is a lag over (user, time) and the session index
    is the running sum of boundary flags over the SAME window spec —
    one exchange, two Window nodes, no self-join (the classic
    "sessionization without joins" plan).
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(int(gap_us))), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new_sess", new_sess).withColumn(
        "session_seq", F.sum("__new_sess").over(run).cast("long")
    ).drop("__new_sess")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    order_cols: Sequence[str] = ("ts_us", "event_id"),
    gap_us: int = 1_800_000_000,
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session reduction of ``sessionize``: (user, session_seq) →
    event count, start/end timestamps, duration, distinct event types
    (``type_col`` — parameterized so renamed schemas work, r15
    code-review finding).  The groupBy key extends the window's
    partition key, so the aggregate is map-side-combinable on the
    already-shuffled data."""
    s = sessionize(df, user_col, ts_col, order_cols, gap_us)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("start_us"),
        F.max(ts_col).alias("end_us"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_us"),
        F.countDistinct(type_col).cast("long").alias("n_event_types"),
    )


def funnel_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion per user: step 1's time is the user's
    earliest ``steps[0]`` event; step k's time is the earliest
    ``steps[k-1]`` event STRICTLY AFTER step k-1's time (the standard
    strict-sequence funnel rule — simultaneous events don't convert).
    ``within_us`` adds a CONVERSION WINDOW: step k must also land at
    most ``within_us`` after step k-1 (the product-analytics "convert
    within N days" rule; step 1 is never window-bound).
    Returns one row per user who entered the funnel:
    (user, t_step1_us..t_stepN_us, steps_reached).

    Plan shape: N chained unbounded window minima over the SAME
    partition spec (one exchange), then a user-keyed groupBy that the
    existing hash partitioning already satisfies — no re-shuffle.
    """
    if not steps:
        raise ValueError("funnel_times: steps must be non-empty")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev_t: Column | None = None
    t_cols: list[str] = []
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev_t is not None:
            cond = cond & prev_t.isNotNull() & (F.col(ts_col) > prev_t)
            if within_us is not None:
                cond = cond & (
                    F.col(ts_col) <= prev_t + F.lit(int(within_us))
                )
        name = f"t_step{i}_us"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = F.col(name)
        t_cols.append(name)
    reached = None
    for name in t_cols:
        flag = F.when(F.col(name).isNotNull(), 1).otherwise(0)
        reached = flag if reached is None else reached + flag
    return (
        out.groupBy(user_col)
        .agg(
            *[F.max(c).alias(c) for c in t_cols],
            F.max(reached).cast("long").alias("steps_reached"),
        )
        .where(F.col(t_cols[0]).isNotNull())
    )


def retention_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention: cohort = the epoch-period (integer
    ``ts_us div period_us`` — exact in both engines, no calendar
    truncation ambiguity) of the user's FIRST event; for each
    (cohort_period, period_offset) count the distinct users active.
    Returns (cohort_period, period_offset, n_users).

    Plan shape: one window over user for the cohort anchor, then one
    two-phase count-distinct aggregate on (cohort, offset) — the
    post-window data is already user-partitioned, so the distinct's
    partial phase dedups locally before the final exchange."""
    # FLOOR division, not trunc: bare `div` truncates toward zero, so
    # a pre-1970 (negative-µs) outlier would bucket differently than
    # DuckDB's floor `//` (r15 code-review finding).  pmod is
    # nonnegative, so (a - pmod(a, b)) is an exact multiple of b and
    # the div is exact floor on the whole long domain.
    P = int(period_us)
    wk = F.expr(f"({ts_col} - pmod({ts_col}, {P})) div {P}").cast("long")
    w = Window.partitionBy(user_col)
    anchored = df.select(
        F.col(user_col), wk.alias("__wk")
    ).withColumn("cohort_period", F.min("__wk").over(w))
    return (
        anchored.groupBy(
            "cohort_period",
            (F.col("__wk") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )
