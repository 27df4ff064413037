"""Event-funnel and cohort-retention operators.

The reference answers "how far do entities get through an ordered
process" imperatively per pipeline stage (ETL step timestamps are
carried on every record — e.g. the per-source `etl` lineage structs,
`activedata_etl/__init__.py:20-50`, let a consumer ask "which pushes
reached the test stage and when"), and activity-over-time questions are
ad-hoc edge queries.  A lake engine wants both as FIRST-CLASS operators
over an event stream: funnels (ordered step completion per key, the
product-analytics staple) and cohort retention (of the keys first seen
in period P, how many were active P+k).

Both are pure Catalyst — no UDFs, no collect_list of raw events:

- :func:`funnel` pre-filters to funnel-relevant step events (the shuffle
  carries only matching rows, not the 100 TB stream), hash-partitions by
  key ONCE, then evaluates the K-step earliest-completion cascade as K
  chained full-frame window minimums over that single exchange.  Per-key
  memory is the window buffer of that key's *step* events — the same
  bound as any per-key analytic; hot keys respond to the usual salting
  remedies.
- :func:`cohort_retention` never joins: one groupBy(key) computes the
  cohort (min period) and the distinct active-period set (bounded by the
  calendar, not the event count), explodes, and re-aggregates — two
  shuffles total, both partial-agg combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIME_DTYPES = {"timestamp", "timestamp_ntz", "date"}


def funnel(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    steps: list[str],
    *,
    step_col: str = "event_type",
    within: float | None = None,
) -> DataFrame:
    """Earliest ordered completion of ``steps`` per key.

    One output row per key that performed step 1; columns ``t_1..t_K``
    are the earliest timestamps completing each step IN ORDER (step i+1
    strictly after step i's matched time — equal timestamps do not
    advance the funnel, which keeps results deterministic without a
    tiebreak column), null once a step was never reached; ``depth`` is
    the number of consecutive steps completed (>= 1).

    ``within``: overall conversion window in seconds — steps 2..K only
    count within ``within`` of the step-1 time (the standard "converted
    within N days" funnel).

    Scale shape: filter to step events -> ONE hash partition by key ->
    K full-frame window mins (all reuse the single exchange; `.explain`
    shows one Exchange under a Window chain).  The cascade is the
    textbook conditional-min formulation, so an ANSI-SQL oracle is a
    chain of K CTEs.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate steps {steps!r}: a step may appear once")
    keys = [key] if isinstance(key, str) else list(key)
    dtype = dict(df.dtypes)[time_col]

    ev = df.where(
        F.col(step_col).isin(list(steps)) & F.col(time_col).isNotNull()
    ).select(*keys, step_col, time_col)
    w = Window.partitionBy(*keys)

    ts = F.col(time_col)
    cur = ev.withColumn(
        "t_1", F.min(F.when(F.col(step_col) == steps[0], ts)).over(w)
    )
    if within is not None:
        if dtype in _TIME_DTYPES:
            fence = F.col("t_1") + F.make_interval(secs=F.lit(float(within)))
        else:
            fence = F.col("t_1") + F.lit(within)
    for i in range(1, len(steps)):
        cond = (F.col(step_col) == steps[i]) & (ts > F.col(f"t_{i}"))
        if within is not None:
            cond = cond & (ts <= fence)
        cur = cur.withColumn(f"t_{i + 1}", F.min(F.when(cond, ts)).over(w))

    t_cols = [f"t_{i + 1}" for i in range(len(steps))]
    # t_i are per-key constants: a min-agg on the SAME keys collapses to
    # one row per key and reuses the window's exchange
    out = (
        cur.groupBy(*keys)
        .agg(*[F.min(c).alias(c) for c in t_cols])
        .where(F.col("t_1").isNotNull())
    )
    depth = sum(
        (F.col(c).isNotNull().cast("int") for c in t_cols), F.lit(0)
    )
    return out.withColumn("depth", depth.cast("int"))


def funnel_counts(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    steps: list[str],
    *,
    step_col: str = "event_type",
    within: float | None = None,
) -> DataFrame:
    """Aggregate funnel: for each step, how many keys reached it (i.e.
    completed steps 1..i in order).  Columns ``step_index`` (1-based),
    ``step`` (label), ``n_keys`` — n_keys is non-increasing by
    construction (depth >= i is nested).
    """
    f = funnel(
        df, key, time_col, steps, step_col=step_col, within=within
    )
    reached = f.select(
        F.explode(
            F.sequence(F.lit(1), F.col("depth"))
        ).alias("step_index")
    )
    labels = F.array(*[F.lit(s) for s in steps])
    return (
        reached.groupBy("step_index")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .withColumn("step", F.element_at(labels, F.col("step_index")))
        .select(F.col("step_index").cast("int"), "step", "n_keys")
    )


def cohort_retention(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    *,
    period: float | str = "week",
) -> DataFrame:
    """Cohort retention over fixed-width periods.

    A key's COHORT is the period of its first event; for every
    ``(cohort, offset)`` the output counts the keys of that cohort
    active ``offset`` periods later (offset 0 = cohort size).  Columns:
    ``cohort_period`` (long period index), ``period_offset`` (long),
    ``n_keys``.

    Periods are FIXED-WIDTH windows anchored at the unix epoch
    (``"day"`` = 86400 s, ``"week"`` = 604800 s, or any float width in
    seconds / plain units for numeric time columns) — not calendar
    months: fixed widths make offsets exact arithmetic, identical in any
    SQL engine, and immune to timezone/calendar drift.

    Plan: groupBy(key) -> (min period, collect_set(period)) -> explode
    -> groupBy(cohort, offset).count().  The collected set is bounded by
    the number of periods in the data's time span (calendar-sized, not
    event-count-sized), so the wide row never blows up; no join, two
    shuffles, both with map-side partial aggregation.
    """
    widths = {"day": 86400.0, "week": 604800.0}
    width = widths.get(period, period) if isinstance(period, str) else float(period)
    if not isinstance(width, float):
        raise ValueError(
            f"period must be 'day', 'week', or a numeric width; got {period!r}"
        )
    if width <= 0:
        raise ValueError("period width must be positive")
    keys = [key] if isinstance(key, str) else list(key)
    dtype = dict(df.dtypes)[time_col]
    num = (
        F.col(time_col).cast("timestamp").cast("double")
        if dtype in _TIME_DTYPES
        else F.col(time_col).cast("double")
    )
    pidx = F.floor(num / F.lit(width)).cast("long")

    per_key = (
        df.where(F.col(time_col).isNotNull())
        .select(*keys, pidx.alias("__p"))
        .groupBy(*keys)
        .agg(
            F.min("__p").alias("cohort_period"),
            F.collect_set("__p").alias("__ps"),
        )
    )
    return (
        per_key.select(
            "cohort_period", F.explode("__ps").alias("__p")
        )
        .withColumn(
            "period_offset", F.col("__p") - F.col("cohort_period")
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
