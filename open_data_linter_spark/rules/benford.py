"""Benford first-significant-digit conformance for numeric columns.

The drift rules (rules/drift.py) compare a batch against a BASELINE
histogram; Benford's law is the distribution check that needs no
baseline at all: for naturally-arising magnitudes spanning several
orders (amounts, durations, populations), the first significant digit d
follows P(d) = log10(1 + 1/d). A fabricated, truncated, unit-mangled or
double-scaled column snaps away from that curve instantly — the classic
forensic screen, and at ingest scale the cheapest
"did an upstream multiply everything by 100" detector.

Output: one row per digit 1–9 with observed count/rate, the Benford
expectation, and the digit's chi-square contribution
(n·(obs−exp)²/exp); ``sum(chi2_contrib)`` against χ²₈ is the caller's
test statistic (same convention as rules/drift.py, which owns the
critical-value table).

Digit extraction is deliberately STRING-based: the first [1-9] character
of the value's decimal rendering (sign, zeros, the point, and — for
scientific notation — everything from the mantissa's first nonzero digit
onward sorted out by the regex) IS the first significant digit in any
standard float formatting, and it sidesteps the log10/pow ulp hazard
where ``floor(log10(x))`` lands differently across engines at exact
powers of ten. Zero / NULL values carry no leading digit and are
excluded (their rates belong to completeness/domain rules).

Plan shape: one projection + one partial-aggregated 9-group aggregate;
the expectation join is a broadcast of nine literal rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def first_significant_digit(col: str) -> F.Column:
    """First [1-9] digit of the value's decimal rendering (NULL if none)."""
    s = F.regexp_replace(F.col(col).cast("string"), "[^1-9]", "")
    return F.nullif(F.substring(s, 1, 1), F.lit("")).cast("int")


def benford_check(df: DataFrame, value_col: str) -> DataFrame:
    """Per-digit Benford conformance report.

    Columns: ``digit``, ``n`` (observed count), ``obs_p``, ``exp_p``,
    ``chi2_contrib`` — all rates/contributions rounded to 6. Digits with
    zero observations still appear (n = 0). Ordered by digit.
    """
    spark = df.sparkSession
    counts = (
        df.select(first_significant_digit(value_col).alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expect = spark.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit int, exp_p double",
    )
    j = expect.join(counts, "digit", "left").select(
        "digit",
        F.coalesce("n", F.lit(0)).alias("n"),
        "exp_p",
    )
    # 9 rows total: the unpartitioned window is a constant-size frame,
    # not a scale hazard
    total = F.sum("n").over(Window.partitionBy())
    obs_p = F.col("n").cast("double") / total.cast("double")
    chi2 = total.cast("double") * F.pow(obs_p - F.col("exp_p"), 2) / F.col("exp_p")
    return j.select(
        "digit",
        "n",
        F.round(obs_p, 6).alias("obs_p"),
        F.round("exp_p", 6).alias("exp_p"),
        F.round(chi2, 6).alias("chi2_contrib"),
    ).orderBy("digit")
