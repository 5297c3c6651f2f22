"""Excel-path parity against the reference's own xlsx goldens
(reference tests/test_excel_linter.py:13-30), running on the stdlib
mini-reader backend (openpyxl absent in this environment)."""

import os

import pytest

SAMPLES = "/root/reference/tests/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not present"
)


def gen_excel_linter(spark, fname):
    from open_data_linter_spark.sources.excel import ExcelLinter

    with open(os.path.join(SAMPLES, fname), "rb") as f:
        return ExcelLinter(spark, f.read(), fname)


def test_check_1_1_visitor_arrivals(spark):
    linter = gen_excel_linter(spark, "since2003_visitor_arrivals.xlsx")
    res = linter.check_1_1()
    assert res.is_valid
    assert len(res.invalid_contents) == 0


def test_check_1_4_merged_cells_golden(spark):
    # reference golden: merged ranges rows 4-18 and 22-57 of column A,
    # reported by top-left 0-based (test_excel_linter.py:13-22)
    linter = gen_excel_linter(spark, "since2003_visitor_arrivals.xlsx")
    res = linter.check_1_4()
    assert not res.is_valid
    expected = {(i, 0) for i in range(3, 18)} | {(i, 0) for i in range(21, 57)}
    assert set(res.invalid_contents[0].invalid_cells) == expected


def test_check_1_7_formula_cells_golden(spark):
    # reference golden: formula cells at (1,2),(2,0),(2,2)
    linter = gen_excel_linter(spark, "expression.xlsx")
    res = linter.check_1_7()
    assert set(res.invalid_contents[0].invalid_cells) == {(1, 2), (2, 0), (2, 2)}


def test_date_xlsx_all_checks_valid(spark):
    # reference golden: date normalization (serial → epoch numbers) makes
    # every check pass on date.xlsx (test_excel_linter.py:28-30 +
    # tests/util.py assert_all_excel_check_is_valid)
    linter = gen_excel_linter(spark, "date.xlsx")
    for check in ("1_1", "1_2", "1_3", "1_4", "1_5", "1_6", "1_7",
                  "1_10", "1_11", "1_12", "1_13", "2_x"):
        res = getattr(linter, f"check_{check}")()
        assert res.is_valid, f"check_{check} failed: {res.invalid_contents}"
        assert len(res.invalid_contents) == 0, check


def test_facade_dispatches_xlsx(spark):
    from open_data_linter_spark.sources.excel import ExcelLinter, open_data_linter

    with open(os.path.join(SAMPLES, "expression.xlsx"), "rb") as f:
        linter = open_data_linter(spark, f.read(), "expression.xlsx")
    assert isinstance(linter, ExcelLinter)
