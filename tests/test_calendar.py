"""Calendar-bucket completeness (rules/calendar.py)."""

import datetime

import pytest

from open_data_linter_spark.rules.calendar import check_calendar_completeness


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, ts string").selectExpr(
        "g", "try_cast(ts AS timestamp_ntz) AS ts"
    )


def test_missing_days_per_group_against_global_frontier(spark):
    rows = [("a", f"2024-03-{d:02d} 10:00:00") for d in (1, 2, 3, 4, 5)]
    rows += [("b", f"2024-03-{d:02d} 11:30:00") for d in (2, 4)]  # late + holey
    rows += [("a", None)]  # NULL ts ignored
    out = check_calendar_completeness(_mk(spark, rows), "ts", ["g"]).collect()
    d = datetime.date
    assert [tuple(r) for r in out] == [
        ("b", d(2024, 3, 1)), ("b", d(2024, 3, 3)), ("b", d(2024, 3, 5)),
    ]
    assert out[0].__fields__ == ["g", "missing_bucket"]


def test_global_mode_and_explicit_window(spark):
    rows = [("x", f"2024-03-{d:02d} 00:10:00") for d in (10, 12)]
    df = _mk(spark, rows)
    out = check_calendar_completeness(df, "ts").collect()
    assert [r.missing_bucket for r in out] == [datetime.date(2024, 3, 11)]
    # explicit start/end widen the expected range beyond the observed one
    out2 = check_calendar_completeness(
        df, "ts", start="2024-03-09", end="2024-03-13"
    ).collect()
    assert [r.missing_bucket for r in out2] == [
        datetime.date(2024, 3, 9), datetime.date(2024, 3, 11),
        datetime.date(2024, 3, 13),
    ]


def test_hour_grain_keeps_timestamp_and_null_group_is_a_group(spark):
    rows = [(None, "2024-03-01 00:05:00"), (None, "2024-03-01 02:05:00"),
            ("a", "2024-03-01 00:59:59"), ("a", "2024-03-01 01:00:00"),
            ("a", "2024-03-01 02:00:00")]
    out = check_calendar_completeness(
        _mk(spark, rows), "ts", ["g"], grain="hour"
    )
    assert out.schema["missing_bucket"].dataType.simpleString().startswith(
        "timestamp"
    )
    got = [(r.g, r.missing_bucket) for r in out.collect()]
    assert got == [(None, datetime.datetime(2024, 3, 1, 1))]


def test_unknown_grain_raises(spark):
    with pytest.raises(ValueError):
        check_calendar_completeness(_mk(spark, []), "ts", grain="week")
