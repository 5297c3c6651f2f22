"""Minimal stdlib xlsx reader (zipfile + xml.etree) — un-gates the Excel
path in environments without openpyxl.

Exposes exactly the openpyxl surface ``sources/excel.py`` consumes
(reference excel_linter.py:13-83):

- ``MiniWorkbook(data).sheetnames`` / ``wb[name]`` → first-worksheet access,
  resolving sheet order through workbook.xml + its .rels (sheet1.xml is NOT
  necessarily the first sheet);
- ``ws.iter_rows(values_only=True)`` → padded value tuples (numbers typed
  int/float, shared/inline strings resolved, booleans, date-styled serials
  converted to datetime/time, formula cells surfaced as ``"=<formula>"``
  like openpyxl's default data_only=False load);
- ``ws.merged_cells.ranges`` → objects with min_row/min_col (1-based, as
  openpyxl) for check 1-4.

Date detection mirrors openpyxl's is_date_format: builtin numFmtIds plus
custom format codes containing d/m/h/y/s tokens outside quoted/bracketed
sections. Serial→datetime uses the 1899-12-30 epoch (1904 workbooks
honored via workbookPr@date1904).
"""

from __future__ import annotations

import datetime
import io
import re
import zipfile
from dataclasses import dataclass
from xml.etree import ElementTree as ET

_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(
    range(50, 59)
)
_EPOCH_1900 = datetime.datetime(1899, 12, 30)
_EPOCH_1904 = datetime.datetime(1904, 1, 1)


def _is_date_format_code(code: str) -> bool:
    # strip quoted literals, [..] sections, and backslash-escaped chars
    stripped = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
    return bool(re.search(r"[dmhysDMHYS]", stripped))


def _col_to_idx(ref: str) -> int:
    """'A'→1, 'AB'→28 (1-based, openpyxl convention)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n


def _split_ref(ref: str) -> tuple[int, int]:
    m = re.match(r"([A-Za-z]+)(\d+)", ref)
    return int(m.group(2)), _col_to_idx(m.group(1))  # (row, col), 1-based


@dataclass
class MergedRange:
    min_row: int
    min_col: int
    max_row: int
    max_col: int


class _MergedCells:
    def __init__(self, ranges: list[MergedRange]):
        self.ranges = ranges


@dataclass
class MiniCell:
    value: object


class MiniSheet:
    def __init__(self, cells: dict[tuple[int, int], object], merged: list[MergedRange]):
        self._cells = cells
        self.merged_cells = _MergedCells(merged)
        self.max_row = max((r for r, _ in cells), default=0)
        self.max_col = max((c for _, c in cells), default=0)

    def iter_rows(self, values_only: bool = False):
        for r in range(1, self.max_row + 1):
            vals = [self._cells.get((r, c)) for c in range(1, self.max_col + 1)]
            yield tuple(vals) if values_only else tuple(MiniCell(v) for v in vals)


def _serial_to_dt(serial: float, date1904: bool):
    epoch = _EPOCH_1904 if date1904 else _EPOCH_1900
    if 0 <= serial < 1 and not date1904:
        secs = round(serial * 86400)
        return datetime.time(secs // 3600, (secs % 3600) // 60, secs % 60)
    # round to ms: serials are stored as decimal doubles
    dt = epoch + datetime.timedelta(days=serial)
    return dt - datetime.timedelta(microseconds=dt.microsecond % 1000)


def _rich_text(el) -> str:
    """Cell text from an <si> or <is> element, in document order.

    Takes the plain <t> child and each rich-text run's <r>/<t>, and SKIPS
    <rPh> phonetic (furigana) runs — Excel stores Japanese reading hints as
    <rPh><t>トウキョウ</t></rPh> next to <t>東京</t>; a descendant scan
    would concatenate both (openpyxl reads only the display runs).
    """
    parts = []
    for child in el:
        tag = child.tag.rsplit("}", 1)[-1]
        if tag == "t":
            parts.append(child.text or "")
        elif tag == "r":
            parts.extend(t.text or "" for t in child.findall("{*}t"))
    return "".join(parts)


class MiniWorkbook:
    def __init__(self, data: bytes):
        zf = zipfile.ZipFile(io.BytesIO(data))
        self._zf = zf

        wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
        pr = wb_root.find("{*}workbookPr")
        self._date1904 = (pr is not None) and pr.get("date1904", "0") in ("1", "true")

        rels_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.get("Id"): rel.get("Target")
            for rel in rels_root.findall(".//" + "{*}Relationship")
        }
        self.sheetnames: list[str] = []
        self._sheet_paths: dict[str, str] = {}
        for sheet in wb_root.findall(".//" + "{*}sheet"):
            name = sheet.get("name")
            rid = next(
                (v for k, v in sheet.attrib.items() if k.endswith("}id")), None
            )
            target = rid_to_target.get(rid, "")
            if target.startswith("/"):
                path = target.lstrip("/")
            else:
                path = "xl/" + target
            self.sheetnames.append(name)
            self._sheet_paths[name] = path

        self._shared = self._read_shared_strings()
        self._date_styles = self._read_date_styles()

    # -------------------------------------------------------------- parts

    def _read_shared_strings(self) -> list[str]:
        try:
            root = ET.fromstring(self._zf.read("xl/sharedStrings.xml"))
        except KeyError:
            return []
        return [_rich_text(si) for si in root.findall(".//" + "{*}si")]

    def _read_date_styles(self) -> set[int]:
        """Indices into cellXfs whose numFmtId is date-like."""
        try:
            root = ET.fromstring(self._zf.read("xl/styles.xml"))
        except KeyError:
            return set()
        custom_date_ids = {
            int(nf.get("numFmtId"))
            for nf in root.findall(".//" + "{*}numFmt")
            if _is_date_format_code(nf.get("formatCode") or "")
        }
        date_styles = set()
        cellxfs = root.find("{*}cellXfs")
        if cellxfs is None:
            return set()
        for i, xf in enumerate(cellxfs.findall("{*}xf")):
            fmt = int(xf.get("numFmtId", "0"))
            if fmt in _BUILTIN_DATE_FMTS or fmt in custom_date_ids:
                date_styles.add(i)
        return date_styles

    # -------------------------------------------------------------- sheets

    def __getitem__(self, name: str) -> MiniSheet:
        root = ET.fromstring(self._zf.read(self._sheet_paths[name]))
        cells: dict[tuple[int, int], object] = {}
        # the r attribute is OPTIONAL on both <row> and <c> (streaming
        # writers omit it): track the implied position — next row below the
        # previous one, next cell right of the previous one — in O(1)
        cur_row = 0
        for row in root.findall(".//" + "{*}row"):
            r_attr = row.get("r")
            cur_row = int(r_attr) if r_attr is not None else cur_row + 1
            next_col = 1
            for c in row.findall(".//" + "{*}c"):
                ref = c.get("r")
                if ref:
                    rr, cc = _split_ref(ref)
                else:
                    rr, cc = cur_row, next_col
                next_col = cc + 1
                cells[(rr, cc)] = self._cell_value(c)
        merged = []
        for mc in root.findall(".//" + "{*}mergeCell"):
            a, b = mc.get("ref").split(":")
            r1, c1 = _split_ref(a)
            r2, c2 = _split_ref(b)
            merged.append(MergedRange(r1, c1, r2, c2))
        return MiniSheet(cells, merged)

    def _cell_value(self, c) -> object:
        t = c.get("t", "n")
        f = c.find("{*}f")
        if f is not None and t != "s":
            # openpyxl (data_only=False) surfaces the formula text
            return "=" + (f.text or "")
        v = c.find("{*}v")
        if t == "inlineStr":
            is_el = c.find("{*}is")
            return _rich_text(is_el) if is_el is not None else None
        if v is None or v.text is None:
            return None
        text = v.text
        if t == "s":
            return self._shared[int(text)]
        if t == "str" or t == "e":
            return text
        if t == "b":
            return text in ("1", "true")
        if t == "d":  # ISO-8601 date cell (strict-conformance producers)
            try:
                return datetime.datetime.fromisoformat(text.rstrip("Z"))
            except ValueError:
                return text
        # numeric; date-styled numerics become datetime/time
        num = int(text) if re.fullmatch(r"-?\d+", text) else float(text)
        style = int(c.get("s", "-1"))
        if style in self._date_styles:
            return _serial_to_dt(float(num), self._date1904)
        return num


def load_workbook_mini(data: bytes) -> MiniWorkbook:
    return MiniWorkbook(data)
