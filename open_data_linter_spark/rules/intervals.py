"""Interval integrity: overlaps, gaps, and inverted validity ranges
per key — the SCD2 / booking-table invariant.

The reference validates point values only (``csv_linter.py`` checks are
cell-local; the closest it gets to ranges is the era↔year consistency
pair, ``csv_linter.py:495-530``). Slowly-changing-dimension tables,
bookings, and sensor-coverage logs instead carry ``[start, end)``
validity ranges whose contract is per-key mutual exclusion (no row's
range overlaps another's) and, optionally, seamless coverage (no gap
between consecutive ranges). This is dbt-utils'
``mutually_exclusive_ranges`` / Deequ-class territory, absent from both.

Semantics (half-open ``[start, end)`` convention):

- ``inverted``: ``end < start`` (zero-length ``end == start`` is legal).
- ``overlap``: the row's start is strictly before the running MAX end
  of all earlier rows in its key (ordered by start, end). The running
  max — not ``lag(end)`` — catches containment by an earlier long
  interval that a neighbor-only check misses.
- ``gap``: the row's start is strictly after the running max end — the
  coverage frontier — so a row bridging past a contained interval is
  not a gap; adjacency ``start == frontier`` is seamless.
- NULL ``end`` = open interval (extends to +infinity): every later row
  in the key overlaps it (the reported frontier then shows the
  9999-12-31 sentinel). NULL ``start`` rows are excluded — a
  boundary-less range belongs to the null-rate rules, not here.

Plan shape: ONE hash Exchange on the key for the two window frames
(both share the same partition/order, Catalyst fuses them into one
Window node). Violations project directly off the window row — linear,
no joins, no Python.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INF = "9999-12-31 23:59:59.999999"


def check_interval_integrity(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    report_gaps: bool = True,
) -> DataFrame:
    """One row per violating interval:
    ``(*keys, start, end, frontier, kind)`` with ``kind`` in
    ``inverted | overlap | gap`` and ``frontier`` the running max end
    of all earlier intervals in the key, ordered by key and start."""
    s, e = F.col(start_col), F.col(end_col)
    # open intervals sort/compare as +inf so the running max carries them
    e_eff = F.coalesce(e, F.lit(_INF).cast("timestamp"))

    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max = F.max(e_eff).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )

    kind = (
        F.when(e.isNotNull() & (e < s), F.lit("inverted"))
        .when(prev_max.isNotNull() & (s < prev_max), F.lit("overlap"))
        .when(
            F.lit(report_gaps) & prev_max.isNotNull() & (s > prev_max),
            F.lit("gap"),
        )
    )
    return (
        df.where(s.isNotNull())
        .select(
            *key_cols,
            s.alias("start"),
            e.alias("end"),
            prev_max.alias("frontier"),
            kind.alias("kind"),
        )
        .where(F.col("kind").isNotNull())
        .orderBy(*key_cols, "start", "end")
    )
