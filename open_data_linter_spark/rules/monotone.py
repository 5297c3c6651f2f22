"""Order conformance: a column that must be monotone within each group.

The reference's cross-field rule (era↔year consistency,
csv_linter.py:187-214) asserts agreement between two columns of one
row; the warehouse-scale sibling asserts agreement between two ORDERS —
"when the rows of a group are laid out by their sequence column, the
value column must not go backwards". That is the invariant behind
event-time vs ingest-order (late data detection), version counters vs
update timestamps, and accumulating snapshots (lifetime totals must not
shrink). Like rules/fd.py, the check REPORTS violations instead of
asserting: at 10^12 rows the useful output is which adjacent pairs
regressed and by how much.

``check_monotonic`` returns one row per violating ADJACENT pair:
``(group…, prev_<order>, <order>, prev_<value>, <value>)`` — the first
row of each group has no predecessor and cannot violate. ``strict=True``
also flags plateaus (equal adjacent values); ``decreasing=True`` flips
the expected direction. A NULL value never violates and never serves as
the comparison baseline: the predecessor is the last NON-NULL value
(``lag`` over an ignore-nulls window would skip the row entirely;
instead we use ``last(value, ignorenulls)`` over the preceding frame so
NULL rows are transparent to their successors).

DETERMINISM CONTRACT: ``order_col`` must be unique within each group
(a line number, a dense event id). With ties the lag pairing is
physical-order-dependent and the report is not reproducible — the same
contract every ordered-window oracle in this repo carries.

Plan shape: ONE shuffle — the group-key window (partition size = group
size); the comparison is codegen column arithmetic on the windowed
frame. Nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def check_monotonic(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    strict: bool = False,
    decreasing: bool = False,
) -> DataFrame:
    """Adjacent pairs where ``value_col`` regresses along ``order_col``."""
    groups = list(group_cols)
    w = Window.partitionBy(*groups).orderBy(order_col)
    frame = w.rowsBetween(Window.unboundedPreceding, -1)
    nn = F.col(value_col).isNotNull()
    prev_o = F.last(F.when(nn, F.col(order_col)), ignorenulls=True).over(frame)
    prev_v = F.last(value_col, ignorenulls=True).over(frame)

    cur, prv = F.col(value_col), F.col("__prev_v")
    if decreasing:
        cur, prv = prv, cur
    bad = (cur <= prv) if strict else (cur < prv)

    return (
        df.select(
            *groups,
            F.col(order_col),
            F.col(value_col),
            prev_o.alias("__prev_o"),
            prev_v.alias("__prev_v"),
        )
        .where(F.col(value_col).isNotNull() & F.col("__prev_v").isNotNull() & bad)
        .select(
            *groups,
            F.col("__prev_o").alias(f"prev_{order_col}"),
            F.col(order_col),
            F.col("__prev_v").alias(f"prev_{value_col}"),
            F.col(value_col),
        )
        .orderBy(*groups, order_col)
    )
