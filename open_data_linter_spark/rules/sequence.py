"""Sequence continuity: gaps in an integer sequence that should be dense.

The reference's completeness rule (check 1-6, csv_linter.py:216-232)
asks whether cells that should be filled are empty; at warehouse scale
the same question is asked of ROWS — an ingest that assigns dense ids
(event ids, shard offsets, per-group line numbers) and then silently
drops a batch leaves no NULL behind, only a hole in the sequence. This
module reports every hole as a closed range, the gaps-and-islands
problem turned into a violation report.

``check_sequence`` returns one row per gap:

- grouped mode (``group_cols`` given): ``(group…, gap_start, gap_end,
  n_missing)`` — the sequence is expected dense WITHIN each group
  (line numbers within an order, chunk indices within a clip).
- global mode (``group_cols=None``): ``(gap_start, gap_end, n_missing)``
  over the whole table.

Duplicates are not gaps (adjacent equal values diff 0 and are skipped);
NULL sequence values are ignored (they are the completeness rule's
business, not this one's). Values must be integral; the report casts
its coordinates to BIGINT.

Plan shape — the scale design is the point:

- Grouped mode is ONE shuffle: a window partitioned by the group key
  (``lag`` over the per-group sort). Partition size is the group size,
  never the table.
- Global mode NEVER sorts the table globally. Rows are bucketed by
  ``seq div bucket_size``; intra-bucket holes come from the same
  per-partition window machinery (partition size ≤ occupancy of one
  bucket), and CROSS-bucket holes — including whole missing buckets —
  come from a ``lag`` over the bucket-frontier frame (one row per
  non-empty bucket: at 10^12 rows and the default 2^20 bucket this is
  ~10^6 rows, a driver-irrelevant single window partition that is the
  price of a total order over bucket ids, not over rows).

The two piles union to exactly the gap list a global sort would have
produced — every hole is either interior to one bucket or spans a
bucket boundary, never both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def check_sequence(
    df: DataFrame,
    seq_col: str,
    group_cols: list[str] | None = None,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Gaps (missing closed ranges) in an expected-dense integer sequence.

    Ordered by group then ``gap_start`` (grouped mode) or ``gap_start``
    (global mode).
    """
    seq = F.col(seq_col).cast("bigint")
    rows = df.where(F.col(seq_col).isNotNull()).select(
        *(group_cols or []), seq.alias("__seq")
    )

    def _gaps(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w = Window.partitionBy(*[F.col(c) for c in part_cols]).orderBy("__seq")
        prev = F.lag("__seq").over(w)
        return (
            frame.select(*part_cols, "__seq", prev.alias("__prev"))
            .where(F.col("__prev").isNotNull() & (F.col("__seq") - F.col("__prev") > 1))
            .select(
                *part_cols,
                (F.col("__prev") + 1).alias("gap_start"),
                (F.col("__seq") - 1).alias("gap_end"),
                (F.col("__seq") - F.col("__prev") - 1).alias("n_missing"),
            )
        )

    if group_cols:
        return _gaps(rows, list(group_cols)).orderBy(*group_cols, "gap_start")

    # Global mode: bucket, find intra-bucket holes per bucket partition,
    # then stitch bucket boundaries on the tiny frontier frame.
    bucketed = rows.withColumn("__b", F.floor(F.col("__seq") / F.lit(int(bucket_size))))
    intra = _gaps(bucketed, ["__b"]).drop("__b")
    frontier = bucketed.groupBy("__b").agg(
        F.min("__seq").alias("__lo"), F.max("__seq").alias("__hi")
    )
    wb = Window.orderBy("__b")
    inter = (
        frontier.select("__b", "__lo", F.lag("__hi").over(wb).alias("__prev_hi"))
        .where(
            F.col("__prev_hi").isNotNull() & (F.col("__lo") - F.col("__prev_hi") > 1)
        )
        .select(
            (F.col("__prev_hi") + 1).alias("gap_start"),
            (F.col("__lo") - 1).alias("gap_end"),
            (F.col("__lo") - F.col("__prev_hi") - 1).alias("n_missing"),
        )
    )
    return intra.unionByName(inter).orderBy("gap_start")
