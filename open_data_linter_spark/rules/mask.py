"""Pattern-mask profiling: the shape of a string column's values.

The reference's format rules validate against KNOWN patterns — the six
fixed regexes of regex.py:5-16 (dates, numbers, symbols) each assert one
expected shape. Profiling inverts that: collapse every value to a
character-class mask and count the masks, and the column tells you its
own format contract — the dominant mask IS the de-facto pattern, and the
long tail is the violation candidates (the Potter's Wheel / Trifacta
structure-inference idea reduced to its distributable core).

Mask alphabet (ASCII classes on purpose — Java regex and RE2 agree on
explicit ranges, where predefined classes like ``\\w``/``\\d`` diverge in
Unicode scope; see functions/regexes.py):

- ``A-Z`` → ``A``,  ``a-z`` → ``a``,  ``0-9`` → ``9``
- every other character (punctuation, whitespace, non-ASCII) is kept
  verbatim — it is usually the structural skeleton ("#", "-", "@")
  that distinguishes formats.
- with ``collapse_runs=True`` (default) maximal runs of each class
  collapse to one symbol, so ``Customer#000000042`` →  ``Aa#9`` —
  length-invariant shape, the useful grain for format discovery.
  NULL values keep a NULL mask (their count is the null rate, already
  owned by rules/classifier.py, but hiding them here would skew
  ``frac``).

``mask_profile`` returns the top-k masks per column:
``(column, mask, n, frac, rank)`` — ``frac`` of the column's TOTAL rows
(rounded to 6, the repo's order-independence contract), rank by
``(n desc, mask asc)`` so ties are deterministic.

Plan shape: one ``stack`` unpivot (#cols × rows, still one scan of only
the profiled columns), the mask built by three codegen
``regexp_replace`` chains — no Python crossing — then ONE shuffle: the
``(column, mask)`` count aggregate with map-side partials. Ranking and
totals are windows over the aggregate output, whose size is bounded by
the number of DISTINCT MASKS (format shapes, not values — thousands at
most even for 10^12 rows of messy data), partitioned by column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mask_expr(col, collapse_runs: bool = True):
    """The mask of a string column as a Catalyst expression."""
    m = F.regexp_replace(col, "[A-Z]+" if collapse_runs else "[A-Z]", "A")
    m = F.regexp_replace(m, "[a-z]+" if collapse_runs else "[a-z]", "a")
    m = F.regexp_replace(m, "[0-9]+" if collapse_runs else "[0-9]", "9")
    return m


def mask_profile(
    df: DataFrame,
    cols: list[str],
    top_k: int = 5,
    collapse_runs: bool = True,
) -> DataFrame:
    """Top-k pattern masks per column, ordered by column then rank."""
    stack = F.expr(
        "stack({}, {})".format(
            len(cols), ", ".join(f"'{c}', cast({c} as string)" for c in cols)
        )
    ).alias("column", "__v")
    counts = (
        df.select(stack)
        .select("column", mask_expr(F.col("__v"), collapse_runs).alias("mask"))
        .groupBy("column", "mask")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wcol = Window.partitionBy("column")
    wrank = wcol.orderBy(F.col("n").desc(), F.col("mask").asc_nulls_last())
    return (
        counts.select(
            "column",
            "mask",
            "n",
            F.round(F.col("n") / F.sum("n").over(wcol), 6).alias("frac"),
            F.row_number().over(wrank).alias("rank"),
        )
        .where(F.col("rank") <= top_k)
        .orderBy("column", "rank")
    )
