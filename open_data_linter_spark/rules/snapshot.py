"""Snapshot diff: schema + stats drift between two versions of a table.

The reference lints ONE file at a time; at warehouse scale the unit of
change is a table VERSION (a new Iceberg snapshot, a re-ingested
partition, an upstream schema migration), and the first validation
question is "what changed?": columns added/removed, types migrated,
null rates moving, cardinality jumps. This module answers it with one
aggregation pass per side and zero driver-side data movement.

Per column of the UNION of both schemas:

- ``in_old`` / ``in_new``       — presence flags (added/removed columns)
- ``type_old`` / ``type_new``   — Catalyst simpleStrings; ``type_changed``
- ``null_rate_old`` / ``null_rate_new`` / ``null_rate_delta`` — rounded
  to 6 places (the repo's partition-order-independence contract); NULL
  where the column or side is absent/empty
- ``distinct_old`` / ``distinct_new`` — exact ``count(DISTINCT)`` by
  default (SQL-replayable); ``approx=True`` switches to HyperLogLog
  ``approx_count_distinct`` for the 10^12-row path (one pass, no expand)

Plan shape: each side contributes ONE aggregate over its own scan; the
two single-row results cross-join (broadcast, trivial) and explode into
the per-column report. Nothing is collected. CAVEAT on the exact path:
multiple ``count(DISTINCT)`` in one agg makes Catalyst plan an Expand —
the scan is still single but its rows multiply by ~(#columns + 1) into
the shuffle and the distinct counters cannot partially aggregate
map-side. Exact is therefore the small-scale / oracle-replay mode; at
10^12 rows use ``approx=True``, whose HLL sketches fuse into one
genuinely map-side-partial aggregate.

Schema facts (presence, types) come from the DataFrame schemas — plan
metadata, no job. Row counts land in every row (``n_old``/``n_new``)
so rate deltas are interpretable without a second query.

Reference seed: the column classifier's per-column counting contract
(column_classifier.py) applied across VERSIONS instead of within one
file; extended per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _side_agg(df: DataFrame, cols: list[str], prefix: str, approx: bool):
    aggs = [F.count(F.lit(1)).alias(f"{prefix}_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"{prefix}_nn_{i}"))
        aggs.append(
            (
                F.approx_count_distinct(F.col(c))
                if approx
                else F.count_distinct(F.col(c))
            ).alias(f"{prefix}_d_{i}")
        )
    return df.agg(*aggs)


def snapshot_diff(
    old: DataFrame, new: DataFrame, approx: bool = False
) -> DataFrame:
    """Per-column schema + stats diff (one row per column of either
    schema, ordered by column name). See the module docstring for the
    exact output contract."""
    types_old = {f.name: f.dataType.simpleString() for f in old.schema}
    types_new = {f.name: f.dataType.simpleString() for f in new.schema}
    union = sorted(set(types_old) | set(types_new))
    cols_old = [c for c in union if c in types_old]
    cols_new = [c for c in union if c in types_new]
    idx_old = {c: i for i, c in enumerate(cols_old)}
    idx_new = {c: i for i, c in enumerate(cols_new)}

    both = _side_agg(old, cols_old, "o", approx).crossJoin(
        F.broadcast(_side_agg(new, cols_new, "n", approx))
    )

    def rate(prefix: str, i: int | None):
        if i is None:
            return F.lit(None).cast("double")
        n = F.col(f"{prefix}_n")
        return F.when(
            n > 0,
            F.round(
                (n - F.col(f"{prefix}_nn_{i}")).cast("double") / n, 6
            ),
        )

    def distinct(prefix: str, i: int | None):
        if i is None:
            return F.lit(None).cast("long")
        return F.col(f"{prefix}_d_{i}").cast("long")

    rows = []
    for c in union:
        io, in_ = idx_old.get(c), idx_new.get(c)
        r_old, r_new = rate("o", io), rate("n", in_)
        t_old, t_new = types_old.get(c), types_new.get(c)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(io is not None).alias("in_old"),
                F.lit(in_ is not None).alias("in_new"),
                F.lit(t_old).cast("string").alias("type_old"),
                F.lit(t_new).cast("string").alias("type_new"),
                F.lit(
                    t_old is not None and t_new is not None and t_old != t_new
                ).alias("type_changed"),
                F.col("o_n").cast("long").alias("n_old"),
                F.col("n_n").cast("long").alias("n_new"),
                r_old.alias("null_rate_old"),
                r_new.alias("null_rate_new"),
                F.round(r_new - r_old, 6).alias("null_rate_delta"),
                distinct("o", io).alias("distinct_old"),
                distinct("n", in_).alias("distinct_new"),
            )
        )
    return both.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
