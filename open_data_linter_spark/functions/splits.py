"""Leakage-safe train/test splits: near-dup clusters never straddle.

Splitting a corpus by document hash leaks: a near-duplicate pair lands on
both sides and the test set silently overlaps training (the contamination
mechanism measured by Lee et al., arXiv 2107.06499 §6.2 — memorized
duplicates inflate eval scores). The leakage-safe construction assigns
whole NEAR-DUP CLUSTERS to one side: the split unit is the connected
component of the near-duplicate pair graph (dedup/cluster.py), and a
document outside every pair is its own singleton unit.

Assignment is the engine's deterministic hash-Bernoulli
(functions/sampling.py semantics) over the UNIT label, not the doc id —
seeded, replay-stable, layout-independent, and by construction every doc
in a cluster shares its cluster's verdict. Expected test mass is
``test_fraction`` of UNITS (clusters count once however large; at
near-dup thresholds clusters are tiny, so unit mass ≈ doc mass).

Plan shape at 100 TB: the pair graph is the expensive part and the
caller already has it (any dedup family produces pairs); labeling is
dedup/cluster.py's pointer-jumping rounds over pairs only. The corpus
side is ONE left join against the O(|pairs|) label table followed by a
stateless hash filter — no corpus shuffle beyond the join.

The reference (volare-all/open-data-linter) has no split tooling; this
extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup.cluster import connected_components


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 42,
) -> DataFrame:
    """Row-preserving: (id_col, unit_id, split) with split in
    {'train','test'}.

    ``unit_id`` is the doc's near-dup component label (minimum member id)
    or its own id when it appears in no pair. Docs sharing a component
    ALWAYS share a split — the no-straddle invariant the oracle checks.
    """
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(
            f"test_fraction must be in [0, 1], got {test_fraction}"
        )
    comp = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("id").alias("__cid"), F.col("comp").alias("unit_id")
    )
    labeled = docs.select(F.col(id_col)).join(
        comp, F.col(id_col) == F.col("__cid"), "left"
    ).select(
        id_col,
        F.coalesce("unit_id", F.col(id_col)).alias("unit_id"),
    )
    # deterministic Bernoulli over the UNIT label (sampling.py semantics:
    # unsigned view of xxhash64 mapped onto [0, 1))
    u = (
        F.xxhash64(F.col("unit_id"), F.lit(seed)).cast("double")
        / F.lit(2.0**64)
    ) + F.lit(0.5)
    return labeled.withColumn(
        "split",
        F.when(u < F.lit(float(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
