"""Deterministic sampling for training-data curation.

Three primitives, all seeded and replay-stable (the same rows come back on
every run, resume, or cluster size — unlike ``df.sample``, whose
per-partition RNG changes with the physical layout):

- ``hash_fraction_sample``: keep a row iff ``xxhash64(key, seed)`` lands
  under the fraction threshold. A PURE FILTER — no shuffle, pushes into
  the scan stage, composes with any plan. The at-scale default.
- ``stratified_sample``: EXACTLY ``n`` rows per group (per language, per
  source…), chosen as the top-n of the seeded hash order inside each
  group — balanced corpus construction where proportional sampling would
  drown low-resource groups. One shuffle (window over the group key);
  hash-ordered, so the selection is uniform within the group and
  independent of input order.
- ``mixture_sample``: per-group quotas toward a target mixture (explicit
  weights or temperature p_g ∝ size_g**alpha), selection by the same
  seeded hash order — domain reweighting for corpus construction.

Skew note: a window sorts each group inside one task — fine up to ~10^8
rows per group. Past that, pre-filter with ``hash_fraction_sample`` at a
few× the target rate, then run the exact window on the survivors: the
hash order is THE SAME expression in both steps, so the two-phase result
is identical to the one-phase one as long as the pre-filter keeps ≥ n
rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli(fraction) by key hash — shuffle-free.

    Rows with equal keys are kept or dropped TOGETHER (the hash is over
    the key, not the row), which is what dedup-safe corpus splits want."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # map the signed 64-bit hash onto [0, 1) via its unsigned view
    u = (F.xxhash64(F.col(key_col), F.lit(seed)).cast("double") / F.lit(2.0**64)) + 0.5
    return df.where(u < F.lit(fraction))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total: int,
    weights: dict[str, float] | None = None,
    alpha: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Domain-mixture sampling: per-group quotas toward a target mixture.

    Exactly one of ``weights`` / ``alpha``:

    - ``weights``: explicit target proportions per group value (normalized
      internally); groups absent from the dict get quota 0.
    - ``alpha``: temperature-style reweighting p_g ∝ size_g**alpha (the
      standard multilingual upsampling family — alpha=1 is proportional,
      alpha→0 approaches uniform).

    Each group contributes ``min(size_g, floor(total * p_g))`` rows, chosen
    by the same seeded hash order as ``stratified_sample`` (deterministic,
    layout-independent). When a group saturates (quota > availability) the
    realized mixture deviates toward the available data — by design; the
    per-group quota formula stays exactly recomputable in SQL, which is the
    driver-oracle contract.

    Fully distributed: group sizes, the weight normalizer, and quotas are
    computed as (broadcast) joins — no driver-side collect.
    """
    if (weights is None) == (alpha is None):
        raise ValueError("exactly one of weights / alpha is required")
    if total < 1:
        raise ValueError(f"total must be >= 1, got {total}")
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__s"))
    if weights is not None:
        wsum = float(sum(weights.values()))
        if wsum <= 0:
            raise ValueError("weights must sum to a positive value")
        pairs: list = []
        for k, v in weights.items():
            pairs += [F.lit(k), F.lit(float(v) / wsum)]
        p = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(group_col)), F.lit(0.0)
        )
        quota = sizes.select(
            group_col,
            F.least(
                F.col("__s"),
                F.floor(F.lit(float(total)) * p).cast("long"),
            ).alias("__q"),
        )
    else:
        wnorm = sizes.agg(
            F.sum(F.pow(F.col("__s").cast("double"), F.lit(float(alpha)))).alias(
                "__wsum"
            )
        )
        quota = sizes.crossJoin(F.broadcast(wnorm)).select(
            group_col,
            F.least(
                F.col("__s"),
                F.floor(
                    F.lit(float(total))
                    * F.pow(F.col("__s").cast("double"), F.lit(float(alpha)))
                    / F.col("__wsum")
                ).cast("long"),
            ).alias("__q"),
        )
    w = Window.partitionBy(group_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__odl_rn", F.row_number().over(w))
        .join(F.broadcast(quota), group_col)
        .where(F.col("__odl_rn") <= F.col("__q"))
        .drop("__odl_rn", "__q")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n_per_group, group size) rows per group, uniformly by
    seeded hash order (ties broken by id for full determinism)."""
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    w = Window.partitionBy(group_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__odl_rn", F.row_number().over(w))
        .where(F.col("__odl_rn") <= n_per_group)
        .drop("__odl_rn")
    )
