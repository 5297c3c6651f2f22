"""Excel ingestion (reference ExcelLinter analog, S3/S4 in SURVEY.md §2.1).

The reference (excel_linter.py:13-57) loads the FIRST worksheet with
openpyxl, normalizes dates/times to epoch numbers, re-serializes to CSV
text, and re-enters the CSV lint path; it overrides only 1-4 (merged cells)
and 1-7 (formulas). This module reproduces that structure on top of
``TabularLinter``.

Workbook loading prefers openpyxl when installed; otherwise it falls back
to the stdlib mini-reader (``sources/xlsx_mini.py`` — zipfile +
xml.etree), which exposes the same surface this module consumes
(iter_rows, merged_cells.ranges, typed values incl. date-styled serials
and formula text). The reference's Excel goldens
(tests/test_excel_linter.py:13-30) pass through either backend.
"""

from __future__ import annotations

import csv
import datetime
import io
from typing import Any, Optional

from pyspark.sql import SparkSession

from open_data_linter_spark.core.model import InvalidContent, LintResult
from open_data_linter_spark.rules.tabular import TabularLinter

try:  # preferred backend when present
    import openpyxl  # type: ignore

    HAS_OPENPYXL = True
except ImportError:
    openpyxl = None
    HAS_OPENPYXL = False


def cell_to_value(value: Any) -> Any:
    """Excel date/time normalization (excel_linter.py:21-31 semantics).

    datetime → epoch seconds; date → epoch seconds at midnight (the
    reference DROPS the return on this branch — a bug its tests never hit,
    SURVEY.md §7; we implement the intended behavior); time → seconds of
    day. Everything else passes through.
    """
    if isinstance(value, datetime.datetime):
        return value.timestamp()
    if isinstance(value, datetime.date):
        return datetime.datetime(value.year, value.month, value.day).timestamp()
    if isinstance(value, datetime.time):
        return value.hour * 3600 + value.minute * 60 + value.second
    return value


def ws2csv(ws) -> str:
    """First-worksheet → CSV text (excel_linter.py:13-18)."""
    buf = io.StringIO()
    writer = csv.writer(buf)
    for row in ws.iter_rows(values_only=True):
        writer.writerow(["" if v is None else cell_to_value(v) for v in row])
    return buf.getvalue()


class ExcelLinter:
    """ExcelLinter analog: first sheet → CSV text → TabularLinter, with
    merged-cell (1-4) and formula (1-7) checks from the workbook itself."""

    def __init__(
        self,
        spark: SparkSession,
        data: bytes,
        filename: str,
        title_line_num: Optional[int] = None,
        header_line_num: Optional[int] = None,
    ) -> None:
        if HAS_OPENPYXL:
            wb = openpyxl.load_workbook(io.BytesIO(data))
        else:
            from open_data_linter_spark.sources.xlsx_mini import MiniWorkbook

            wb = MiniWorkbook(data)
        self.ws = wb[wb.sheetnames[0]]  # first sheet only (excel_linter.py:48-51)
        text = ws2csv(self.ws)
        self._csv = TabularLinter(
            spark, text.encode(), "from_excel.csv", title_line_num, header_line_num
        )

    def __getattr__(self, name: str):
        # delegate every other check to the CSV path (excel_linter.py:35-36)
        return getattr(self._csv, name)

    def check_1_4(self) -> LintResult:
        """Merged cells (excel_linter.py:59-68): report each range's
        top-left, 0-based."""
        cells = [
            (rng.min_row - 1, rng.min_col - 1) for rng in self.ws.merged_cells.ranges
        ]
        if not cells:
            return LintResult(True, [])
        return LintResult(False, [InvalidContent("セルが結合されています。", cells)])

    def check_1_7(self) -> LintResult:
        """Formulas (excel_linter.py:70-83): cells whose value starts '='."""
        cells = []
        for i, row in enumerate(self.ws.iter_rows()):
            for j, cell in enumerate(row):
                if isinstance(cell.value, str) and cell.value.startswith("="):
                    cells.append((i, j))
        if not cells:
            return LintResult(True, [])
        return LintResult(False, [InvalidContent("数式が含まれています。", cells)])


def open_data_linter(spark: SparkSession, data: bytes, filename: str, **kw):
    """Facade: extension-based dispatch (open_data_linter.py:7-21)."""
    if filename.endswith((".xls", ".xlsx", ".xlsm", ".xlsb", ".xlsxm")):
        return ExcelLinter(spark, data, filename, **kw)
    return TabularLinter(spark, data, filename, **kw)
