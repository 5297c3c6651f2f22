"""Functional-dependency conformance: does ``determinant → dependent`` hold?

The reference's cross-field rule (era↔year consistency, csv_linter.py:
187-214) hard-codes ONE pair of columns and ONE consistency predicate. At
warehouse scale the general form of that question is a functional
dependency: "for every value of the determinant column(s), is the
dependent column single-valued?" — the invariant behind surrogate-key
integrity (``clip_id → codec``), denormalized copies (``zip → prefecture``,
the reference's check 1-12 domain), and slowly-changing dimensions that
are not supposed to change. This module measures FD conformance instead
of asserting it, because at 10^12 rows the useful output is "how broken,
and where", not a boolean.

``check_functional_dependency`` returns ONE summary row per dependent:

- ``n_groups`` / ``n_rows``              — determinant cardinality, total rows
- ``violating_groups`` / ``violating_rows`` — groups (and the rows inside
  them) where the dependent takes >1 distinct value
- ``conformance``                        — ``1 − violating_rows/n_rows``,
  rounded to 6 places (the repo's order-independence contract)

NULL semantics are null-safe on BOTH sides, consistent with
``check_group_counts`` (rules/constraints.py): a NULL determinant is a
group like any other (Spark's groupBy already does this), and NULL counts
as a distinct dependent value — ``ndv = count(DISTINCT x) + max(x IS
NULL)``, a formulation every SQL engine replays verbatim.

Plan shape: ONE shuffle — the determinant groupBy with partial (map-side)
aggregation — followed by a single-row global aggregate and a ``stack``
unpivot; nothing is collected. Round 6: the exact summary path decides
ndv>1 from min/max/counts (see the inline derivation), so even k>1
dependents plan NO Expand and every aggregate keeps map-side combining;
``approx=True`` keeps the mergeable HyperLogLog shape for dependents
whose type is not orderable. ``fd_violating_groups`` still reports ndv
VALUES, so its single count(DISTINCT) (and its Expand with the
coexisting min/max evidence aggs) remains — the drill-down runs on one
already-identified FD, not the screening sweep.

``fd_violating_groups`` is the drill-down: the violating determinant
groups themselves with their distinct-dependent counts and the
min/max dependent values (bounded evidence — no ``collect_set`` of an
unbounded value list; the conflicting RANGE is enough to start a triage).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ndv(col: str, approx: bool) -> F.Column:
    """Null-safe distinct-value count: NULL is a value."""
    base = (
        F.approx_count_distinct(F.col(col))
        if approx
        else F.countDistinct(F.col(col))
    )
    return base + F.max(F.col(col).isNull().cast("int"))


def check_functional_dependency(
    df: DataFrame,
    determinant: Sequence[str],
    dependents: Sequence[str],
    approx: bool = False,
) -> DataFrame:
    """Per-dependent FD conformance summary for ``determinant → dep``.

    Columns: ``determinant`` (comma-joined), ``dependent``, ``n_groups``,
    ``n_rows``, ``violating_groups``, ``violating_rows``, ``conformance``.
    """
    if not determinant or not dependents:
        raise ValueError("determinant and dependents must be non-empty")
    overlap = set(determinant) & set(dependents)
    if overlap:
        raise ValueError(f"columns on both sides of the FD: {sorted(overlap)}")

    # Round 6 (optimization): the summary only consumes ndv through
    # "> 1", and ndv >= 2 (null-safe: NULL is a value) is decidable from
    # min/max/counts alone —
    #   ndv_nonnull >= 2            <=> min(c) != max(c)
    #   ndv_nonnull = 1 AND has-null <=> 0 < count(c) < count(*)
    # — so the exact path needs NO count(DISTINCT): with k dependents the
    # former k-distinct aggregate planned an Expand (shuffle rows x ~k+1,
    # and the distinct counters lose map-side combining); min/max/count
    # are plain partial-aggregable functions (guide §2.3 "aggregate
    # before you shuffle"). min/max require an orderable dependent type —
    # the same types countDistinct-based grouping supported in practice.
    # approx=True keeps the mergeable HLL shape unchanged.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in dependents:
        if approx:
            aggs.append(_ndv(c, True).alias(f"__ndv_{c}"))
        else:
            aggs.extend(
                [
                    F.count(F.col(c)).alias(f"__cnt_{c}"),
                    F.min(F.col(c)).alias(f"__min_{c}"),
                    F.max(F.col(c)).alias(f"__max_{c}"),
                ]
            )
    g = df.groupBy(*[F.col(c) for c in determinant]).agg(*aggs)

    met = [
        F.count(F.lit(1)).alias("__groups"),
        F.sum("__n").alias("__rows"),
    ]
    for c in dependents:
        if approx:
            viol = F.col(f"__ndv_{c}") > 1
        else:
            viol = F.coalesce(
                F.col(f"__min_{c}") != F.col(f"__max_{c}"), F.lit(False)
            ) | (
                (F.col(f"__cnt_{c}") > 0) & (F.col(f"__cnt_{c}") < F.col("__n"))
            )
        met.append(F.sum(viol.cast("long")).alias(f"__vg_{c}"))
        met.append(
            F.sum(F.when(viol, F.col("__n")).otherwise(F.lit(0))).alias(
                f"__vr_{c}"
            )
        )
    tot = g.agg(*met)

    stack_args = ", ".join(
        f"'{c}', `__vg_{c}`, `__vr_{c}`" for c in dependents
    )
    out = tot.selectExpr(
        "__groups",
        "__rows",
        f"stack({len(dependents)}, {stack_args})"
        " as (dependent, violating_groups, violating_rows)",
    )
    return out.select(
        F.lit(",".join(determinant)).alias("determinant"),
        "dependent",
        F.col("__groups").alias("n_groups"),
        F.col("__rows").alias("n_rows"),
        "violating_groups",
        "violating_rows",
        F.round(
            F.lit(1.0)
            - F.col("violating_rows").cast("double")
            / F.col("__rows").cast("double"),
            6,
        ).alias("conformance"),
    )


def fd_violating_groups(
    df: DataFrame,
    determinant: Sequence[str],
    dependent: str,
    approx: bool = False,
) -> DataFrame:
    """The violating determinant groups for one FD, with bounded evidence.

    Columns: the determinant columns, ``n_rows``, ``ndv``, ``min_<dep>``,
    ``max_<dep>``. Ordered by the determinant (a deterministic total
    order — the determinant is the group key).
    """
    if dependent in set(determinant):
        raise ValueError(f"dependent {dependent!r} is part of the determinant")
    g = (
        df.groupBy(*[F.col(c) for c in determinant])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _ndv(dependent, approx).alias("ndv"),
            F.min(dependent).alias(f"min_{dependent}"),
            F.max(dependent).alias(f"max_{dependent}"),
        )
        .where(F.col("ndv") > 1)
    )
    return g.orderBy(*determinant)
