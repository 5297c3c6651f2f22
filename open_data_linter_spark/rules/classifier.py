"""Column classification + profiling: the reference's inferred schema as a
single-pass conditional aggregation.

Reference (column_classifier.py:50-115): per column, count cells matching
each of 8 ``ColumnType``s, then a priority-ordered vote with a 0.8 dominance
threshold. The counting loop is O(rows × cols × types) Python; here it is ONE
``df.agg`` of ``sum(when(pred, 1))`` expressions — one job, map-side partial
aggregation, the shuffle carries a single row of 8×ncols longs.

Parity quirks preserved (SURVEY.md §2.3):
- overlapping counts: a prefecture-code cell also counts as christian-era and
  other-number (column_classifier.py:69-78); a prefecture-name cell also
  counts as other-string (:81-83);
- the vote uses strict ``>`` both for the argmax tie-break (earlier priority
  wins, :107-110) and the 0.8 dominance test (:112-115);
- an all-empty column is NONE_CATEGORY (:95-96).

The same fused pass also computes the north-rule column stats:
min / max / null-count / approx-distinct (HyperLogLog++), generalizing the
classifier pass into the profiling deliverable (SURVEY.md §2.6).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions import predicates as P


class ColumnType(Enum):
    # priority order = reference's vote order (column_classifier.py:98-103)
    PREFECTURE_CODE = "prefecture_code"
    PREFECTURE_NAME = "prefecture_name"
    CHRISTIAN_ERA = "christian_era"
    DATETIME_CODE = "datetime_code"
    JP_CALENDAR_YEAR = "jp_calendar_year"
    OTHER_NUMBER = "other_number"
    OTHER_STRING = "other_string"
    NONE_CATEGORY = "none_category"

    def is_number(self) -> bool:
        # column_classifier.py:24-28
        return self in (
            ColumnType.PREFECTURE_CODE,
            ColumnType.CHRISTIAN_ERA,
            ColumnType.DATETIME_CODE,
            ColumnType.OTHER_NUMBER,
        )


PRIORITY = [
    ColumnType.PREFECTURE_CODE,
    ColumnType.PREFECTURE_NAME,
    ColumnType.CHRISTIAN_ERA,
    ColumnType.DATETIME_CODE,
    ColumnType.JP_CALENDAR_YEAR,
    ColumnType.OTHER_NUMBER,
    ColumnType.OTHER_STRING,
]


def _type_predicates(c: Column) -> dict[ColumnType, Column]:
    """Overlapping per-cell predicates (column_classifier.py:56-91)."""
    pref_code = P.is_prefecture_code(c)
    pref_name = P.is_prefecture_name(c)
    # christian era: 1-4 digit integers; prefecture codes qualify too (:69-75)
    christian = P.is_christian_era(c) | pref_code
    datetime_code = P.is_datetime_code(c)
    jp_year = P.is_jp_calendar_year(c)
    number = P.is_number(c)  # any numeric cell (:76-78 umbrella)
    other_string = P.is_string(c) | pref_name  # names are strings too (:81-83)
    return {
        ColumnType.PREFECTURE_CODE: pref_code,
        ColumnType.PREFECTURE_NAME: pref_name,
        ColumnType.CHRISTIAN_ERA: christian,
        ColumnType.DATETIME_CODE: datetime_code,
        ColumnType.JP_CALENDAR_YEAR: jp_year,
        ColumnType.OTHER_NUMBER: number,
        ColumnType.OTHER_STRING: other_string,
    }


@dataclass
class ColumnProfile:
    column: str
    inferred_type: ColumnType
    type_counts: dict[str, int]
    rows: int
    empties: int
    nulls: int
    null_rate: float
    approx_distinct: int
    min_value: object
    max_value: object


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    dominance_rate: float = 0.8,
    rsd: float = 0.05,
) -> dict[str, ColumnProfile]:
    """One fused aggregation job: classification counts + stats per column."""
    columns = columns or [f.name for f in df.schema.fields if f.dataType.simpleString() != "binary"]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for col in columns:
        s = F.col(col).cast("string")
        for t, pred in _type_predicates(s).items():
            aggs.append(F.sum(pred.cast("long")).alias(f"{col}{t.value}"))
        aggs.append(F.sum(P.is_empty(s).cast("long")).alias(f"{col}empty"))
        aggs.append(F.sum(F.col(col).isNull().cast("long")).alias(f"{col}null"))
        aggs.append(F.approx_count_distinct(col, rsd).alias(f"{col}hll"))
        aggs.append(F.min(col).alias(f"{col}min"))
        aggs.append(F.max(col).alias(f"{col}max"))
    row = df.agg(*aggs).collect()[0].asDict()
    rows = int(row["__rows"])

    out: dict[str, ColumnProfile] = {}
    for col in columns:
        counts = {t.value: int(row[f"{col}{t.value}"] or 0) for t in PRIORITY}
        empties = int(row[f"{col}empty"] or 0)
        nulls = int(row[f"{col}null"] or 0)
        out[col] = ColumnProfile(
            column=col,
            inferred_type=_vote(counts, rows, empties, dominance_rate),
            type_counts=counts,
            rows=rows,
            empties=empties,
            nulls=nulls,
            null_rate=(nulls / rows) if rows else 0.0,
            approx_distinct=int(row[f"{col}hll"] or 0),
            min_value=row[f"{col}min"],
            max_value=row[f"{col}max"],
        )
    return out


def _vote(
    counts: dict[str, int], rows: int, empties: int, dominance_rate: float
) -> ColumnType:
    """Priority-ordered argmax + dominance threshold
    (column_classifier.py:93-115, strict inequalities preserved)."""
    denom = rows - empties
    if denom <= 0:
        return ColumnType.NONE_CATEGORY
    best, best_count = None, -1
    for t in PRIORITY:  # earlier priority wins ties (strict >, :107-110)
        if counts[t.value] > best_count:
            best, best_count = t, counts[t.value]
    if best is None or not (best_count / denom > dominance_rate):  # strict > (:112-115)
        return ColumnType.NONE_CATEGORY
    return best
