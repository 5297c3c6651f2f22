"""Reference parity: run the engine's tabular mode on the reference's OWN
sample files and assert the reference's OWN golden cell sets
(/root/reference/tests/test_csv_linter.py, test_column_classifier.py).

The samples are used as test INPUTS (public fixtures); all engine code is
original (SURVEY.md; no reference code copied).
"""

import os

import pytest

SAMPLES = "/root/reference/tests/samples"

ALL_CHECKS = ["1_1", "1_2", "1_3", "1_4", "1_5", "1_6", "1_7",
              "1_10", "1_11", "1_12", "1_13", "2_x"]


def gen_linter(spark, name):
    from open_data_linter_spark.rules.tabular import TabularLinter

    path = os.path.join(SAMPLES, name)
    with open(path, "rb") as f:
        data = f.read()
    return TabularLinter(spark, data, name)


def cells(result, content_index=0):
    return set(map(tuple, result.invalid_contents[content_index].invalid_cells))


@pytest.fixture(scope="module")
def perfect(spark):
    return gen_linter(spark, "perfect.csv")


def test_perfect_all_checks_valid(perfect):
    # analog of tests/util.py:26-36 over perfect.csv
    for name in ALL_CHECKS:
        res = getattr(perfect, f"check_{name}")()
        assert res.is_valid, f"check_{name} failed on perfect.csv: {res.to_dict()}"


def test_all_num_headerless(spark):
    # test_csv_linter.py:16-18: header-less numeric file passes everything
    linter = gen_linter(spark, "all_num.csv")
    for name in ALL_CHECKS:
        assert getattr(linter, f"check_{name}")().is_valid, name


def test_check_1_1(spark):
    # test_csv_linter.py:21-27
    assert gen_linter(spark, "nb01h0013.csv").check_1_1().is_valid
    assert not gen_linter(spark, "text.txt").check_1_1().is_valid


def test_check_1_2(spark):
    # golden: test_csv_linter.py:30-40
    assert gen_linter(spark, "nb01h0013.csv").check_1_2().is_valid
    res = gen_linter(spark, "check_1_2.csv").check_1_2()
    assert not res.is_valid
    all_cells = set()
    for ic in res.invalid_contents:
        all_cells.update(map(tuple, ic.invalid_cells))
    assert all_cells == {(1, 1), (2, 1), (3, 1), (1, 3), (2, 3), (3, 3), (4, 3), (5, 3)}


def test_check_1_3(spark):
    # golden: test_csv_linter.py:43-51
    res = gen_linter(spark, "check_1_3.csv").check_1_3()
    assert cells(res, 0) == {(7, 1), (8, 1)}
    assert cells(res, 1) == {(None, 2), (None, 3)}


def test_check_1_5(spark):
    # golden: test_csv_linter.py:54-60
    res = gen_linter(spark, "check_1_5.csv").check_1_5()
    assert cells(res) == {(0, 2), (1, 1), (1, 2), (2, 0), (2, 1)}


def test_check_1_6(spark):
    # golden: test_csv_linter.py:63-71
    res = gen_linter(spark, "check_1_6.csv").check_1_6()
    assert cells(res) == {(2, 0), (2, 3), (2, 4), (2, 6), (2, 7), (2, 9),
                          (2, 10), (2, 12), (2, 13), (2, 14), (2, 16),
                          (2, 17), (2, 18), (3, 0), (3, 18), (2, 19)}


def test_check_1_10_encoding_matrix(spark):
    # golden: test_csv_linter.py:74-86 — only the CP932 variant trips,
    # with exactly cell (4, 0)
    assert gen_linter(spark, "nb01h0013.csv").check_1_10().is_valid
    assert gen_linter(spark, "nb01h0013_sjis.csv").check_1_10().is_valid
    res = gen_linter(spark, "nb01h0013_cp932.csv").check_1_10()
    assert not res.is_valid
    assert len(res.invalid_contents) == 1
    assert res.invalid_contents[0].invalid_cells == [(4, 0)]


def test_check_1_11(spark):
    # golden: test_csv_linter.py:89-95
    res = gen_linter(spark, "check_1_11.csv").check_1_11()
    assert cells(res) == {(None, 2), (None, 5)}


def test_check_1_12(spark):
    # golden: test_csv_linter.py:98-104
    res = gen_linter(spark, "check_1_12.csv").check_1_12()
    assert cells(res, 0) == {(3, 5), (4, 5), (5, 5), (7, 5)}
    assert cells(res, 1) == {(None, 8)}


def test_check_1_13(spark):
    # golden: test_csv_linter.py:107-112 (includes the blank cell (5,0))
    res = gen_linter(spark, "check_1_13.csv").check_1_13()
    assert cells(res) == {(2, 0), (4, 0), (5, 0)}


def test_check_2_x(spark):
    # golden: test_csv_linter.py:115-119
    assert not gen_linter(spark, "check_2_1.csv").check_2_x().is_valid


def test_blocked_cascade(spark):
    # before_check_1_1 semantics (funcs.py:98-106): unreadable file blocks
    # every downstream check with is_valid=None
    linter = gen_linter(spark, "text.txt")
    assert linter.check_1_2().is_valid is None
    assert linter.check_2_x().is_valid is None


@pytest.mark.parametrize(("column", "expected"), [
    (0, "prefecture_code"),
    (2, "prefecture_name"),
    (4, "christian_era"),
    (6, "datetime_code"),
    (8, "jp_calendar_year"),
    (10, "other_number"),
    (12, "other_string"),
    (14, "none_category"),
])
def test_classify_sample_parity(spark, column, expected):
    # golden: tests/test_column_classifier.py:9-27 (header=0 -> the sample's
    # first line is a header; the linter's structure analyzer finds the same
    # split, so classification applies to the same content rows)
    linter = gen_linter(spark, "classify_sample.csv")
    assert linter.column_classify[column].value == expected
