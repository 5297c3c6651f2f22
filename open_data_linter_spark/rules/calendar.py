"""Calendar completeness: expected time buckets that have no rows at all.

rules/volume.py flags buckets whose row count is anomalous; this module
flags buckets that are MISSING OUTRIGHT — the day a partition never
landed, the hour a producer was down. It is the reference's
empty-row/empty-column rule (check 2-x, csv_linter.py:243-262) projected
onto the time axis: the "rows" of a time-series table are its calendar
buckets, and an absent bucket is an empty row the count-based rules
never see (there is nothing to count).

``check_calendar_completeness`` returns one row per missing bucket:
``(group…, missing_bucket)``. The expected range is the OBSERVED global
frontier ``[min(bucket), max(bucket)]`` — every group is measured
against the same calendar, so a group that starts late or dies early is
reported missing at the edges too (pass explicit ``start``/``end`` ISO
strings to anchor externally, e.g. a contract window). Day buckets
surface as DATE (timezone-free replays), hour buckets as the truncated
timestamp. NULL timestamps are ignored; NULL group keys form their own
group (null-safe, consistent with rules/constraints.check_group_counts).

Plan shape: ONE shuffle over the input — the ``(group, bucket)``
count-style aggregate, whose output is #groups × #buckets rows (tiny:
years of hourly data × thousands of groups is still millions, not
table-scale). The expected calendar is built by exploding ``sequence()``
over the 1-row frontier aggregate and cross-joining the distinct-groups
frame derived from the same aggregate — both broadcast-sized by
construction — and the report is a broadcast LEFT ANTI join of expected
minus observed. The 10^12-row table is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STEP = {"day": "interval 1 day", "hour": "interval 1 hour"}


def check_calendar_completeness(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str] | None = None,
    grain: str = "day",
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Expected-but-absent time buckets per group, ordered by group, bucket."""
    if grain not in _STEP:
        raise ValueError(f"grain must be one of {sorted(_STEP)}, got {grain!r}")
    groups = list(group_cols or [])
    bucket = F.date_trunc(grain, F.col(ts_col))
    if grain == "day":
        bucket = bucket.cast("date")

    observed = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*groups, bucket.alias("missing_bucket"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )

    ty = "date" if grain == "day" else "timestamp_ntz"
    lo = (
        F.min(F.lit(start).cast(ty))
        if start is not None
        else F.min("missing_bucket")
    )
    hi = F.max(F.lit(end).cast(ty)) if end is not None else F.max("missing_bucket")
    frontier = observed.agg(lo.alias("__lo"), hi.alias("__hi"))
    calendar = frontier.select(
        F.explode(F.expr(f"sequence(__lo, __hi, {_STEP[grain]})")).alias(
            "missing_bucket"
        )
    )
    if groups:
        expected = observed.select(*groups).distinct().crossJoin(calendar)
    else:
        expected = calendar

    # expected derives from observed — rename the observed side so the
    # join condition can't resolve both sides to one attribute.
    obs = observed.select(
        F.col("missing_bucket").alias("__o_bucket"),
        *[F.col(g).alias(f"__o_{g}") for g in groups],
    )
    on = F.col("missing_bucket") == F.col("__o_bucket")
    for g in groups:
        on = on & F.col(g).eqNullSafe(F.col(f"__o_{g}"))
    missing = expected.join(F.broadcast(obs), on=on, how="left_anti")
    return missing.select(*groups, "missing_bucket").orderBy(*groups, "missing_bucket")
