"""Ingestion-volume anomalies: time buckets whose row count is an outlier.

The drift rules (rules/drift.py) ask whether the DISTRIBUTION of values
moved; this module asks the prior question every ingest pipeline needs
answered first — did the VOLUME move? A half-ingested day, a
double-delivered batch, or a dead producer shows up as a row-count
outlier long before any value-level statistic reacts.

Implementation is deliberately a composition: bucket event time with
``date_trunc`` (day buckets surface as DATE so replays are
timezone-free), count rows per bucket (the only scan of the input — one
partial-aggregated shuffle whose output is #buckets rows, thousands at
most even for years of hourly data), then reuse
``rules/rate.robust_z_outliers`` — the Iglewicz–Hoberg modified z-score
machinery with its exact lower-median order statistics, MAD=0 guard, and
size-probed approx switch — over the tiny bucket-count frame. Counts are
cast to DOUBLE before scoring (small integers, exact in a double) so the
engine and a replaying SQL twin agree on the output type.

Anything not flagged is absent from the output, like the other outlier
rules: the report is the incident list, not the time series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.rules.rate import robust_z_outliers


def volume_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    grain: str = "day",
    z_threshold: float = 3.5,
    approx: bool | None = None,
) -> DataFrame:
    """Time buckets whose row count is a modified-z outlier.

    Columns: ``bucket`` (DATE at day grain, truncated timestamp
    otherwise), ``n_rows`` (double), ``z``. Ordered by bucket.
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    if grain == "day":
        bucket = bucket.cast("date")
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_rows"))
    )
    return robust_z_outliers(
        counts, "n_rows", "bucket", z_threshold=z_threshold, approx=approx
    )
