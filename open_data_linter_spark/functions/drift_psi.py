"""Population Stability Index — per-group distribution drift scoring.

PSI is the standard industry drift metric beside the engine's KS and
chi-square checks (rules/drift.py): for binned distributions p (current)
and q (baseline), PSI = Σ_i (p_i − q_i) · ln(p_i / q_i). The usual
monitoring rule of thumb reads <0.1 as stable, 0.1–0.25 as moderate
shift, >0.25 as action-worthy (Siddiqi, "Credit Risk Scorecards", Wiley
2006, ch. 13 — where the metric was popularized).

Semantics here:

- Bins are EXPLICIT edges supplied by the caller (monitoring needs
  stable bins across runs — deriving them from the data would make the
  score incomparable between snapshots). Values bin by
  ``edges[i] <= v < edges[i+1]`` with two open-ended outer bins, NULLs
  excluded.
- Counts are Laplace-smoothed with ``alpha`` (default 0.5) before
  normalizing — the standard guard that keeps ln() finite on empty bins
  while staying exactly replayable in SQL (no epsilon clamps).
- ``baseline_filter`` selects the baseline population (e.g. one source,
  one time window); when None the WHOLE input is the baseline and each
  group is scored against the global mix.

Scale design: the bin id is one Catalyst CASE chain (a projection), the
per-(group, bin) counts are ONE shuffle with map-side partial agg, and
the baseline histogram is a tiny (bins) aggregate broadcast back — the
same shape as the windowed-drift rules. Bins arrive dense via an
explicit bins×groups frame (crossJoin of two tiny distinct sets on the
POST-aggregation side), so missing bins carry smoothed mass instead of
silently dropping out of the sum.

The reference (volare-all/open-data-linter) has KS/chi² analogs only in
spirit (check 2-x distribution columns); PSI extends the drift family
per the monitoring mandate. Fully deterministic closed form — the
driver oracle is a FULL exact DuckDB twin (6-decimal rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_by_edges(c: Column, edges: list[float]) -> Column:
    """Bin id 0..len(edges): i such that edges[i-1] <= v < edges[i],
    with v < edges[0] -> 0 and v >= edges[-1] -> len(edges)."""
    if not edges or sorted(edges) != list(edges):
        raise ValueError("edges must be non-empty and ascending")
    out = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        out = F.when(c < F.lit(float(edges[i])), F.lit(i)).otherwise(out)
    return out


def psi_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    edges: list[float],
    baseline_filter: Column | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group PSI vs the baseline histogram: (group, n_rows, psi).

    ``n_rows`` is the group's non-null value count; ``psi`` rounds to 6
    decimals. Groups with zero rows simply don't appear (no rows, no
    group key — filter upstream if absence must be reported). Rows with
    a NULL group key are EXCLUDED from both sides: a NULL key carries no
    group identity, and a null-unsafe join would otherwise count such
    rows into the baseline while reporting their "group" as empty —
    a baseline-only smoothing-noise score (code-review finding)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed empty bins diverge)")
    n_bins = len(edges) + 1
    v = F.col(value_col)
    df = df.where(F.col(group_col).isNotNull())
    binned = df.where(v.isNotNull()).select(
        F.col(group_col).alias("grp"), bin_by_edges(v, edges).alias("bin")
    )
    base_src = (
        binned
        if baseline_filter is None
        else df.where(v.isNotNull())
        .where(baseline_filter)
        .select(F.col(group_col).alias("grp"), bin_by_edges(v, edges).alias("bin"))
    )
    base = base_src.groupBy("bin").agg(F.count("*").alias("bc"))
    cur = binned.groupBy("grp", "bin").agg(F.count("*").alias("cc"))

    bins = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    groups = cur.select("grp").distinct()
    dense = (
        groups.crossJoin(F.broadcast(bins))
        .join(cur, ["grp", "bin"], "left")
        .join(F.broadcast(base), ["bin"], "left")
        .select(
            "grp",
            "bin",
            F.coalesce(F.col("cc"), F.lit(0)).alias("cc"),
            F.coalesce(F.col("bc"), F.lit(0)).alias("bc"),
        )
    )
    a = float(alpha)
    return (
        dense.groupBy("grp")
        .agg(
            F.sum("cc").alias("n_rows"),
            F.sum("bc").alias("nb"),
            F.collect_list(F.struct("bin", "cc", "bc")).alias("h"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            F.round(
                F.aggregate(
                    "h",
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (
                        (x["cc"] + a) / (F.col("n_rows") + a * n_bins)
                        - (x["bc"] + a) / (F.col("nb") + a * n_bins)
                    )
                    * F.log(
                        ((x["cc"] + a) / (F.col("n_rows") + a * n_bins))
                        / ((x["bc"] + a) / (F.col("nb") + a * n_bins))
                    ),
                ),
                6,
            ).alias("psi"),
        )
    )
