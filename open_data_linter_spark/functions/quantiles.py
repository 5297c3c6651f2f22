"""Per-group quantile thresholds + quality bucketing (CCNet-style).

CCNet (Wenzek et al., arXiv 1911.00359 §4.3) splits each language's
documents into head/middle/tail by per-language perplexity quantiles and
trains on the head/middle. This module is that stage as a reusable
operator: compute per-group LOWER-quantile thresholds (actual data
elements, no interpolation — the same exactness contract as
rules/rate.py's lower median, so an independent SQL engine agrees
bit-for-bit on doubles), then assign every row a bucket by comparing its
value against its group's thresholds.

Why thresholds, not ranks: bucketing by rank (row_number within group)
needs a per-group global sort — one partition per group, which a single
100 TB language would funnel. Thresholds are ONE small aggregate per
group (the threshold table is O(#groups)) broadcast back across the
corpus — every row is then bucketed by a stateless comparison, embarrassingly
parallel. Ties share a value, so they share a bucket (deterministic,
layout-independent).

Exactness/scale trade (same shape as rules/rate.py): the exact path
buffers each group's values in one aggregation buffer
(``array_sort(collect_list(v))``) — fine for per-batch validation and
oracle parity, an executor OOM when one group holds a 100 TB language.
The DEFAULT (``approx=None``) therefore probes the total row count with a
short-circuiting ``limit(MAX+1).count()`` and auto-switches to mergeable
``percentile_approx`` sketches (bounded memory, map-side partial agg)
above ``EXACT_QUANTILE_MAX_ROWS`` — total rows bound any group's size, so
the probe needs no per-group shuffle. The oracle then becomes a contract
check, not an exact twin; pass ``approx=False`` to force exactness.

The reference (volare-all/open-data-linter) has no quantile ops; this
extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CUTS = (1.0 / 3.0, 2.0 / 3.0)
DEFAULT_LABELS = ("head", "middle", "tail")

# auto mode (approx=None) stays exact up to this many non-null rows in
# TOTAL (an upper bound on every group's collect_list buffer)
EXACT_QUANTILE_MAX_ROWS = 1_000_000


def _k(q: float, n: Column) -> Column:
    """1-based rank of the lower q-quantile element: ceil(q * n).

    Double multiply + ceil on BOTH engines (the oracle mirrors
    ``ceil(CAST(n AS DOUBLE) * q)``) — identical IEEE ops, identical
    result."""
    return F.ceil(F.lit(float(q)) * n.cast("double")).cast("int")


def group_lower_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = DEFAULT_CUTS,
    approx: bool | None = None,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Per-group lower-quantile thresholds: (group_col, n_values, t_1..t_m).

    ``t_j`` is the element at 1-based position ceil(q_j * n) of the
    group's sorted non-null values — an ACTUAL element, so doubles agree
    bit-for-bit with an independent recomputation. NULL values carry no
    signal and are excluded (a group with only NULLs emits no row).
    Groups key NULL like groupBy does (one NULL group, kept).

    ``approx=None`` (default) = auto: exact up to
    ``EXACT_QUANTILE_MAX_ROWS`` total non-null rows, sketches above. The
    size probe runs ONE short job at call time — this function is
    otherwise lazy; pass an explicit bool to keep it fully lazy.
    """
    if not qs:
        raise ValueError("need at least one quantile")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    if list(qs) != sorted(qs):
        raise ValueError(f"quantiles must be ascending, got {qs}")
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull())
    if approx is None:
        approx = (
            vals.limit(EXACT_QUANTILE_MAX_ROWS + 1).count()
            > EXACT_QUANTILE_MAX_ROWS
        )
    if approx:
        agg = vals.groupBy("g").agg(
            F.count("v").alias("n_values"),
            F.percentile_approx("v", list(map(float, qs)), approx_accuracy).alias("ts"),
        )
        picks = [F.element_at("ts", j + 1).alias(f"t_{j + 1}") for j in range(len(qs))]
    else:
        agg = vals.groupBy("g").agg(
            F.count("v").alias("n_values"),
            F.array_sort(F.collect_list("v")).alias("sv"),
        )
        picks = [
            F.element_at("sv", _k(q, F.col("n_values"))).alias(f"t_{j + 1}")
            for j, q in enumerate(qs)
        ]
    return agg.select(F.col("g").alias(group_col), "n_values", *picks)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    group_col: str,
    cuts: tuple[float, ...] = DEFAULT_CUTS,
    labels: tuple[str, ...] = DEFAULT_LABELS,
    approx: bool | None = None,
) -> DataFrame:
    """Row-preserving transform: every input row + a ``bucket`` column.

    ``bucket`` = labels[j] for the first cut j with value <= its group's
    t_j, else the last label; equal values always land in the same bucket
    (ties are value-identified, not rank-identified). Rows with a NULL
    value get a NULL bucket (no signal — filter or impute downstream);
    rows whose group emitted no threshold row (all-NULL group) likewise.

    Plan shape: thresholds are O(#groups) and broadcast — the bucket
    assignment adds NO shuffle to the corpus side.
    """
    if not cuts:
        raise ValueError("need at least one cut")
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels, got {len(cuts)} cuts / {len(labels)} labels"
        )
    reserved = {"bucket", "__g", *(f"t_{j + 1}" for j in range(len(cuts)))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with quantile_buckets internals: {sorted(clash)}"
        )
    thr = group_lower_quantiles(df, value_col, group_col, cuts, approx=approx)
    v = F.col(value_col)
    bucket = F.when(F.lit(False), F.lit(None).cast("string"))
    for j, lab in enumerate(labels[:-1]):
        bucket = bucket.when(v <= F.col(f"t_{j + 1}"), F.lit(lab))
    # the otherwise-branch must still be NULL when v is NULL or the group
    # has no thresholds — guard explicitly rather than relying on when()
    bucket = F.when(
        v.isNotNull() & F.col("t_1").isNotNull(),
        bucket.otherwise(F.lit(labels[-1])),
    )
    # thr derives from df, so joining on same-named attributes would be
    # ambiguous — rename the threshold side's key first
    thr2 = thr.drop("n_values").withColumnRenamed(group_col, "__g")
    return (
        df.join(
            F.broadcast(thr2),
            on=F.col(group_col).eqNullSafe(F.col("__g")),
            how="left",
        )
        .drop("__g")
        .withColumn("bucket", bucket)
        .drop(*[f"t_{j + 1}" for j in range(len(cuts))])
    )
