"""Column classification parity tests (column_classifier.py semantics) +
profiling stats."""

import pytest

from open_data_linter_spark.rules.classifier import (
    ColumnType,
    _vote,
    profile_columns,
)


# ---- driver-side vote logic (pure, no Spark) ------------------------------


def counts(**kw):
    base = {t.value: 0 for t in ColumnType if t != ColumnType.NONE_CATEGORY}
    base.update(kw)
    return base


def test_vote_priority_tiebreak():
    # equal counts: earlier priority wins (strict >, column_classifier.py:107-110)
    c = counts(prefecture_code=10, christian_era=10, other_number=10)
    assert _vote(c, 10, 0, 0.8) == ColumnType.PREFECTURE_CODE


def test_vote_dominance_strict():
    # exactly 0.8 is NOT enough (strict >, column_classifier.py:112-115)
    c = counts(other_number=8)
    assert _vote(c, 10, 0, 0.8) == ColumnType.NONE_CATEGORY
    c = counts(other_number=9)
    assert _vote(c, 10, 0, 0.8) == ColumnType.OTHER_NUMBER


def test_vote_empty_column():
    assert _vote(counts(), 10, 10, 0.8) == ColumnType.NONE_CATEGORY


def test_vote_empties_reduce_denominator():
    # 8 matches of 10 rows with 2 empties -> 8/8 > 0.8
    c = counts(other_string=8)
    assert _vote(c, 10, 2, 0.8) == ColumnType.OTHER_STRING


# ---- fused Spark profiling pass -------------------------------------------


@pytest.fixture(scope="module")
def sample_df(spark):
    # era strings carry digits: the reference's elif chain sends digit-free
    # era strings (平成元年) to OTHER_STRING before the era test is reached
    # (column_classifier.py:84-88) — faithful engine does the same
    rows = [
        ("1", "北海道", "2021", "令和3年", "hello world", None),
        ("2", "青森", "1999", "平成9年", "foo bar", None),
        ("13", "東京都", "800", "昭和50年", "baz qux", None),
        ("47", "沖縄県", "2024", "大正3年", "quux corge", None),
        ("21", "京都府", "1868", "明治2年", "grault", None),
    ]
    return spark.createDataFrame(
        rows, "code string, pref string, year string, era string, words string, empty string"
    )


def test_profile_types(sample_df):
    prof = profile_columns(sample_df)
    assert prof["code"].inferred_type == ColumnType.PREFECTURE_CODE
    assert prof["pref"].inferred_type == ColumnType.PREFECTURE_NAME
    assert prof["year"].inferred_type == ColumnType.CHRISTIAN_ERA
    assert prof["era"].inferred_type == ColumnType.JP_CALENDAR_YEAR
    assert prof["words"].inferred_type == ColumnType.OTHER_STRING
    assert prof["empty"].inferred_type == ColumnType.NONE_CATEGORY


def test_profile_overlapping_counts(sample_df):
    prof = profile_columns(sample_df)
    # prefecture codes also count as christian_era and other_number
    # (column_classifier.py:69-78)
    assert prof["code"].type_counts["prefecture_code"] == 5
    assert prof["code"].type_counts["christian_era"] == 5
    assert prof["code"].type_counts["other_number"] == 5
    # prefecture names also count as other_string (:81-83)
    assert prof["pref"].type_counts["other_string"] == 5


def test_profile_stats(sample_df):
    prof = profile_columns(sample_df)
    assert prof["empty"].null_rate == 1.0
    assert prof["code"].nulls == 0
    assert prof["code"].rows == 5
    assert prof["code"].approx_distinct >= 4  # HLL estimate of 5
    assert prof["code"].min_value == "1"  # string min


def test_era_conversion(spark):
    from pyspark.sql import functions as F

    from open_data_linter_spark.functions.predicates import jp_era_to_western

    df = spark.createDataFrame(
        [("令和3年",), ("平成元年",), ("昭和50年",), ("明治元年",), ("nonsense",), ("令和元年",)],
        "s string",
    )
    got = [r[0] for r in df.select(jp_era_to_western(F.col("s"))).collect()]
    assert got == [2021, 1989, 1975, 1868, None, 2019]
