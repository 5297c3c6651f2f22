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


def _mini_xlsx(sheet_xml: str, shared_xml: str | None = None) -> bytes:
    """Assemble a minimal in-memory xlsx from raw sheet XML."""
    import io
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rels_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {ns} xmlns:r="{rels_ns}">'
            '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rels_ns}/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", f"<worksheet {ns}>{sheet_xml}</worksheet>")
        if shared_xml is not None:
            z.writestr("xl/sharedStrings.xml", f"<sst {ns}>{shared_xml}</sst>")
    return buf.getvalue()


def test_xlsx_mini_skips_phonetic_runs():
    """Excel stores furigana as <rPh> runs next to the display text; the
    reader must yield only the display text (openpyxl behavior) — a
    descendant <t> scan would corrupt every phonetic-annotated Japanese
    cell. Also covers rich-text <r> runs and inlineStr with <rPh>."""
    from open_data_linter_spark.sources.xlsx_mini import load_workbook_mini

    shared = (
        "<si><t>東京</t><rPh sb=\"0\" eb=\"2\"><t>トウキョウ</t></rPh></si>"
        "<si><r><t>大</t></r><r><t>阪</t></r><rPh sb=\"0\" eb=\"2\"><t>オオサカ</t></rPh></si>"
    )
    sheet = (
        '<sheetData><row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>京都</t><rPh sb="0" eb="2"><t>キョウト</t></rPh></is></c>'
        "</row></sheetData>"
    )
    ws = load_workbook_mini(_mini_xlsx(sheet, shared))["S1"]
    row = next(ws.iter_rows(values_only=True))
    assert row == ("東京", "大阪", "京都")


def test_xlsx_mini_iso_date_cells():
    """t=\"d\" cells (strict OOXML) parse as datetime, not a float crash."""
    import datetime

    from open_data_linter_spark.sources.xlsx_mini import load_workbook_mini

    sheet = (
        '<sheetData><row r="1">'
        '<c r="A1" t="d"><v>2021-01-02T03:04:05</v></c>'
        "</row></sheetData>"
    )
    ws = load_workbook_mini(_mini_xlsx(sheet))["S1"]
    (val,) = next(ws.iter_rows(values_only=True))
    assert val == datetime.datetime(2021, 1, 2, 3, 4, 5)


def test_xlsx_mini_rows_and_cells_without_refs():
    """Streaming writers may omit the optional r attribute on rows AND
    cells: position = next row down / next cell right, in O(1)."""
    from open_data_linter_spark.sources.xlsx_mini import load_workbook_mini

    sheet = (
        "<sheetData>"
        "<row><c><v>1</v></c><c><v>2</v></c></row>"
        "<row><c><v>3</v></c><c r=\"C2\"><v>4</v></c><c><v>5</v></c></row>"
        "</sheetData>"
    )
    ws = load_workbook_mini(_mini_xlsx(sheet))["S1"]
    rows = list(ws.iter_rows(values_only=True))
    assert rows[0][:2] == (1, 2)
    assert rows[1] == (3, None, 4, 5)
