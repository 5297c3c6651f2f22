"""Per-group order conformance (rules/monotone.py)."""

from open_data_linter_spark.rules.monotone import check_monotonic


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, o int, v int")


def test_flags_adjacent_regressions_only(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 15), ("a", 4, 15),
            ("b", 1, 5), ("b", 2, 7)]
    out = check_monotonic(_mk(spark, rows), ["g"], "o", "v").collect()
    # plateau (15,15) is fine without strict; only 20 -> 15 violates
    assert [tuple(r) for r in out] == [("a", 2, 3, 20, 15)]
    assert out[0].__fields__ == ["g", "prev_o", "o", "prev_v", "v"]


def test_strict_flags_plateaus(spark):
    rows = [("a", 1, 10), ("a", 2, 10)]
    out = check_monotonic(_mk(spark, rows), ["g"], "o", "v", strict=True)
    assert [tuple(r) for r in out.collect()] == [("a", 1, 2, 10, 10)]


def test_decreasing_direction(spark):
    rows = [("a", 1, 9), ("a", 2, 9), ("a", 3, 11)]
    out = check_monotonic(_mk(spark, rows), ["g"], "o", "v", decreasing=True)
    assert [tuple(r) for r in out.collect()] == [("a", 2, 3, 9, 11)]


def test_nulls_are_transparent_not_baselines(spark):
    # NULL at o=2 never violates; o=3 compares against o=1's value
    rows = [("a", 1, 10), ("a", 2, None), ("a", 3, 8), ("a", 4, 9)]
    out = check_monotonic(_mk(spark, rows), ["g"], "o", "v").collect()
    assert [tuple(r) for r in out] == [("a", 1, 3, 10, 8)]


def test_first_row_never_violates_across_groups(spark):
    rows = [("a", 1, 100), ("b", 1, 1), ("b", 2, 0)]
    out = check_monotonic(_mk(spark, rows), ["g"], "o", "v").collect()
    assert [tuple(r) for r in out] == [("b", 1, 2, 1, 0)]
