"""Worker-local tabular rule kernel: the 12 reference checks in pure
Python, no SparkSession.

This is the fleet-at-scale evaluation path (plans/fleet.py
``lint_files_distributed``): one million small files means one million
rule evaluations, and per-file Spark jobs cost ~100ms of scheduling each
— so past O(10^4) files the rules must run WORKER-SIDE, one pandas/python
evaluation per ``binaryFile`` row inside mapInPandas, with no driver
round-trip per file. That requires the rule semantics to exist outside
Catalyst; this module is that implementation.

Parity contract: ``KernelLinter`` must produce the same verdicts, cell
sets, and messages as ``rules/tabular.py::TabularLinter`` (which is
itself pinned to the reference's CSVLinter, csv_linter.py:43-525, via the
reference's own sample goldens). ``tests/test_fleet_kernel_parity.py``
asserts kernel == TabularLinter over the full reference sample corpus and
the differential corpus generators — the "parity wall" the round-2
verdict required before shipping this path.

Implementation notes:
- scalar predicates use PYTHON semantics directly (float() accepts
  full-width digits, re is Unicode-aware) — this is the REFERENCE's own
  runtime (funcs.py), which the Catalyst predicates in
  functions/predicates.py emulate with (?U) flags and translate() calls;
- patterns shared with the engine come from functions/regexes.py with the
  Java-only ``(?U)`` flag stripped (Python str regex is Unicode by
  default); pandas-dtype emulation regexes compile with re.ASCII because
  pandas' C tokenizer accepts ASCII digits/space only (the same reason
  rules/tabular.py uses Java \\d for them);
- per-file row loops are deliberate: fleet files are SMALL (the
  reference's unit of work); parallelism comes from files-per-partition,
  not vectorization inside one file.
"""

from __future__ import annotations

import csv
import io
import re
from typing import Optional

from open_data_linter_spark.core.model import InvalidContent, LintResult
from open_data_linter_spark.functions import regexes as rx
from open_data_linter_spark.rules.classifier import (
    ColumnType,
    _vote,
    counts_from_branch_counts,
)
from open_data_linter_spark.rules.tabular import (
    BLOCKED,
    CHECK_NAMES,
    HeaderEstimateError,
    _PD_NA_TOKENS,
    detect_and_decode,
    estimate_structure,
)


def _py(pattern: str) -> "re.Pattern[str]":
    """Compile an engine pattern for Python re: strip the Java-only (?U)
    (Python str patterns are Unicode-class by default)."""
    return re.compile(pattern.replace("(?U)", ""))


_EMPTY_RE = _py(rx.EMPTY_PATTERN)
_WS_RE = _py(rx.SPACES_AND_LINE_BREAK)
_DATETIME_RE = _py(rx.DATETIME_CODE)
_CHRISTIAN_RE = _py(rx.CHRISTIAN_ERA)
_NUM_BRACKETS_RE = _py(rx.NUM_WITH_BRACKETS)
_NUM_NUM_RE = _py(rx.NUM_WITH_NUM)
_NUMBER_STRING_RE = _py(rx.NUMBER_STRING)
_ANY_DIGIT_RE = _py(rx.ANY_DIGIT)
_SPLIT_1_2_RE = re.compile("[、,]")

# pandas-dtype emulation (rules/tabular.py:206-211): ASCII \d/\s like the
# Java regex engine / pandas' C tokenizer
_PD_FLOAT_RE = re.compile(r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$", re.ASCII)
_PD_INT_RE = re.compile(r"^\s*[+-]?\d+\s*$", re.ASCII)
_PD_INF_RE = re.compile(r"^[ \t]*[+-]?(?i:inf(?:inity)?)[ \t]*$")
_PD_NAN_RE = re.compile(r"^[ \t]*[+-]?(?i:nan)[ \t]*$")
_PD_INFNAN_RE = re.compile(r"^[ \t]*[+-]?(?i:inf(?:inity)?|nan)[ \t]*$")

_PD_NA_SET = frozenset(_PD_NA_TOKENS)

# functions/predicates.py:140 — Java \d (ASCII): full-width era-year
# digits do NOT convert, matching the engine
_ERA_RE = re.compile(r"^(明治|大正|昭和|平成|令和)(元|\d{1,2})年?$", re.ASCII)
_JP_ERA_BASE = dict(rx.JP_ERAS)

_FULL_PREF = frozenset(rx.VALID_PREFECTURE_NAMES)
_ABBREV_PREF = frozenset(rx.ABBREVIATED_PREFECTURE_NAMES)
_ASCII_INT_RE = re.compile(r"^\d+$", re.ASCII)  # rules/tabular.py:565

_FW_DIGITS = str.maketrans("０１２３４５６７８９", "0123456789")


# ---------------------------------------------------------------- scalars
# Python-semantics twins of functions/predicates.py (= reference funcs.py)


def _cell_null(v: Optional[str]) -> bool:
    """rules/tabular.py::_cell_null — what pd.read_csv parses to NaN."""
    return v is None or v in _PD_NA_SET


def _is_empty(v: Optional[str]) -> bool:
    return v is None or _EMPTY_RE.search(v) is not None


# Numeric acceptance = the Python float() grammar, identical to the engine's
# _PY_FLOAT_GATE (functions/predicates.py). Round 4's Hypothesis property
# gate found the old translate+bare-try_cast grammar was Java's — it accepted
# '1d'/'0x1p3' float() rejects and rejected PEP-515 '1_0' float() accepts —
# so BOTH sides now gate behind the float() grammar before casting. Remaining
# documented divergences from bare float(): exotic Unicode digit families
# (e.g. Arabic-Indic) are not translated, and Spark casts signed 'nan'
# strings to NULL — _as_double mirrors that residual (None) while the
# gate-based _is_number still counts them, exactly like the engine.
_FW_NUM_TRANS = str.maketrans("０１２３４５６７８９　\u00a0", "0123456789  ")
# Java's default \s class, which is also exactly what float() strips
_JWS = "[ \t\n\x0b\f\r]*"
_PY_FLOAT_GATE_RE = re.compile(
    _JWS + r"[+-]?(([0-9](_?[0-9])*(\.([0-9](_?[0-9])*)?)?|\.[0-9](_?[0-9])*)"
    r"([eE][+-]?[0-9](_?[0-9])*)?|(?i:inf(inity)?|nan))" + _JWS,
    re.ASCII,
)


def _as_double(v: Optional[str]):
    """functions/predicates.py::_as_double twin: parsed value or None."""
    if v is None:
        return None
    s = v.translate(_FW_NUM_TRANS)
    if _PY_FLOAT_GATE_RE.fullmatch(s) is None:
        return None
    t = s.replace("_", "").strip(" \t\n\x0b\f\r")
    if t.lower() in ("-nan", "+nan"):
        return None  # Spark try_cast NULLs signed nan; gate still accepts
    return float(t)


def _is_number(v: Optional[str]) -> bool:
    """Gate-based like the engine's is_number (signed nan counts)."""
    if v is None:
        return False
    return _PY_FLOAT_GATE_RE.fullmatch(v.translate(_FW_NUM_TRANS)) is not None


def _is_include_number(v: Optional[str]) -> bool:
    return v is not None and _ANY_DIGIT_RE.search(v) is not None


def _is_string(v: Optional[str]) -> bool:
    return not _is_empty(v) and not _is_include_number(v)


def _is_integer(v: Optional[str]) -> bool:
    d = _as_double(v)
    if d is None:
        return False
    return d == d and d not in (float("inf"), float("-inf")) and d.is_integer()


def _is_prefecture_code(v: Optional[str]) -> bool:
    if not _is_integer(v):
        return False
    d = _as_double(v)
    return 1 <= d <= 47


def _is_datetime_code(v: Optional[str]) -> bool:
    return v is not None and _DATETIME_RE.search(v) is not None


def _is_christian_era(v: Optional[str]) -> bool:
    return v is not None and _CHRISTIAN_RE.search(v) is not None


def _jp_era_to_western(v: Optional[str]) -> Optional[int]:
    if v is None:
        return None
    m = _ERA_RE.match(v)
    if not m:
        return None
    n = 1 if m.group(2) == "元" else int(m.group(2))
    return _JP_ERA_BASE[m.group(1)] + n - 1


def _is_jp_calendar_year(v: Optional[str]) -> bool:
    return _jp_era_to_western(v) is not None


def _classify_branch(v: Optional[str]) -> int:
    """rules/classifier.py::classify_branch — the reference's elif chain
    (column_classifier.py:65-91) as branch ids 0..8."""
    if _is_empty(v):
        return 0
    if _is_prefecture_code(v):
        return 1
    if _is_christian_era(v):
        return 2
    if _is_datetime_code(v):
        return 3
    if _is_number(v):
        return 4
    if v in _FULL_PREF or v in _ABBREV_PREF:
        return 5
    if _is_string(v):
        return 6
    if _is_jp_calendar_year(v):
        return 7
    return 8


def _pd_numeric_cell(v: Optional[str]) -> bool:
    return (
        _cell_null(v)
        or _PD_FLOAT_RE.search(v) is not None
        or _PD_INFNAN_RE.search(v) is not None
    )


def _trim(v: str) -> str:
    """Spark F.trim: strips SPACE characters only."""
    return v.strip(" ")


# ---------------------------------------------------------------- linter


class KernelLinter:
    """TabularLinter twin evaluated entirely in-process (no Spark).

    Same constructor contract and check_* surface as
    rules/tabular.py::TabularLinter; cell coordinates are absolute
    0-based (row, col), column-level findings are (None, col).
    """

    def __init__(
        self,
        data: bytes,
        filename: str,
        title_line_num: Optional[int] = None,
        header_line_num: Optional[int] = None,
    ) -> None:
        self.cache: dict[str, LintResult] = {}
        self.encoding: Optional[str] = None
        self.n_cols = 0

        if not filename.endswith((".csv", ".CSV")):
            self.cache["1-1"] = LintResult.simple_error(
                "ファイルが読み込めませんでした。CSVファイルをアップロードしてください。"
            )
            return
        try:
            text, self.encoding = detect_and_decode(data)
        except UnicodeDecodeError:
            self.cache["1-1"] = LintResult.simple_error("文字コードが読み取れませんでした。")
            return
        try:
            rows = list(csv.reader(io.StringIO(text)))
            t, h, end = estimate_structure(rows)
            self.title_line_num = t if title_line_num is None else title_line_num
            self.header_line_num = h if header_line_num is None else header_line_num
        except HeaderEstimateError:
            self.cache["1-1"] = LintResult.simple_error("ヘッダーの推定に失敗しました。")
            return
        except Exception:
            self.cache["1-1"] = LintResult.simple_error("ファイルの読み込みに失敗しました。")
            return

        # slicing pinned to the ANALYZER's estimate; overrides move only
        # the coordinate offsets (rules/tabular.py:178-188)
        self.n_cols = len(rows[t]) if end > t else 0
        self.content = self._pad(rows[t + h:end])
        self.header = self._pad(rows[t:t + h])
        self.content_offset = self.title_line_num + self.header_line_num
        self.header_offset = self.title_line_num
        self.column_classify = self._classify()

    # ------------------------------------------------------------ plumbing

    def _pad(self, rows: list[list[str]]) -> list[list[Optional[str]]]:
        """Pad/truncate every row to n_cols (rules/tabular.py:198-201)."""
        return [
            [(r[j] if j < len(r) else None) for j in range(self.n_cols)]
            for r in rows
        ]

    def _pandas_dtypes(self, rows: list[list[Optional[str]]]) -> tuple[list[bool], list[bool]]:
        """(pd_numeric, pd_int) per column — min()-over-rows semantics:
        an empty frame is NOT numeric (Spark min over zero rows is NULL)."""
        if not rows:
            return [False] * self.n_cols, [False] * self.n_cols
        numeric, isint = [], []
        for j in range(self.n_cols):
            col = [r[j] for r in rows]
            numeric.append(all(_pd_numeric_cell(v) for v in col))
            isint.append(all(
                not _cell_null(v) and _PD_INT_RE.search(v) is not None for v in col
            ))
        return numeric, isint

    def _pandas_render(self, v: Optional[str], pd_numeric: bool, pd_int: bool) -> Optional[str]:
        """str() of the pandas-PARSED cell (rules/tabular.py:230-260)."""
        if not pd_numeric:
            # per-cell na_values: NA tokens are NaN (empty) even in
            # object columns — same fix as the engine (round-3 cross
            # corpus differential)
            return None if _cell_null(v) else v
        if pd_int:
            try:
                n = int(_trim(v))
            except (ValueError, TypeError):
                return None
            # engine renders via try_cast("long"): int64 overflow is NULL
            if not (-(1 << 63) <= n < (1 << 63)):
                return None
            return str(n)
        if _cell_null(v) or _PD_NAN_RE.search(v):
            return None
        if _PD_INF_RE.search(v):
            return "-inf" if _trim(v).startswith("-") else "inf"
        try:
            return str(float(_trim(v)))
        except ValueError:
            return None

    def _classify(self) -> list[ColumnType]:
        if self.n_cols == 0:
            return []
        numeric, isint = self._pandas_dtypes(self.content)
        rows_n = len(self.content)
        out = []
        for j in range(self.n_cols):
            branch_counts: dict[int, int] = {}
            for r in self.content:
                b = _classify_branch(self._pandas_render(r[j], numeric[j], isint[j]))
                branch_counts[b] = branch_counts.get(b, 0) + 1
            counts = counts_from_branch_counts(branch_counts)
            out.append(_vote(counts, rows_n, branch_counts.get(0, 0), 0.8))
        return out

    def _gate(self) -> Optional[LintResult]:
        if "1-1" in self.cache and not self.cache["1-1"].is_valid:
            return LintResult.simple_error(BLOCKED, is_valid=None)
        return None

    @staticmethod
    def _single_message_result(message: str, cells: list) -> LintResult:
        if not cells:
            return LintResult(True, [])
        return LintResult(False, [InvalidContent(message, cells)])

    # -------------------------------------------------------------- checks

    def check_1_1(self) -> LintResult:
        if "1-1" in self.cache:
            return self.cache["1-1"]
        return LintResult(True, [])

    def check_1_2(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        comma_cells, whole_cells = [], []
        for i, r in enumerate(self.content):
            for j in range(self.n_cols):
                c = r[j]
                if c is None:
                    continue
                parts = _SPLIT_1_2_RE.split(c)
                if len(parts) > 1:
                    if any(_NUM_BRACKETS_RE.search(_trim(p)) for p in parts):
                        comma_cells.append((i + self.content_offset, j))
                elif (
                    _NUM_BRACKETS_RE.search(_trim(c))
                    or _NUM_NUM_RE.search(_trim(c))
                ):
                    whole_cells.append((i + self.content_offset, j))
        contents = []
        if comma_cells:
            contents.append(InvalidContent("句点によりデータが分割されています。", comma_cells))
        if whole_cells:
            contents.append(InvalidContent("括弧によりデータが分割されています。", whole_cells))
        return LintResult(not contents, contents)

    def check_1_3(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        cells, columns = [], []
        for j in range(self.n_cols):
            if self.column_classify[j].is_number():
                for i, r in enumerate(self.content):
                    c = r[j]
                    if not _is_number(c) and _is_include_number(c):
                        cells.append((i + self.content_offset, j))
            if self.column_classify[j] == ColumnType.NONE_CATEGORY:
                # parsed-NaN quirk kept (rules/tabular.py:370-377)
                qualifying = sum(
                    1 for r in self.content
                    if _cell_null(r[j]) or _is_empty(r[j])
                    or (not _is_empty(r[j]) and _NUMBER_STRING_RE.search(r[j]))
                )
                if qualifying == len(self.content):  # 0 == 0 counts, like Spark
                    columns.append((None, j))
        # cells come out column-major here but row-major in TabularLinter's
        # single collect — order is normalized by the comparison (sets)
        contents = []
        if cells:
            contents.append(InvalidContent("数値データに文字や空欄が含まれています。", cells))
        if columns:
            contents.append(
                InvalidContent("数値データの列に単位などの文字が含まれている可能性があります。", columns)
            )
        return LintResult(not contents, contents)

    def check_1_4(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        return LintResult(True, [])

    def check_1_5(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        cells = []
        for rows, offset in [(self.header, self.header_offset),
                             (self.content, self.content_offset)]:
            numeric, _ = self._pandas_dtypes(rows)
            for i, r in enumerate(rows):
                for j in range(self.n_cols):
                    if numeric[j]:
                        continue  # pandas-parsed numeric cells carry no ws
                    c = r[j]
                    if c is not None and _WS_RE.search(c):
                        cells.append((i + offset, j))
        return self._single_message_result("スペースや改⾏が含まれています。", cells)

    def check_1_6(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        cells = [
            (i + self.header_offset, j)
            for i, r in enumerate(self.header)
            for j in range(self.n_cols)
            if _cell_null(r[j])
        ]
        return self._single_message_result("ヘッダーに空欄があります。", cells)

    def check_1_7(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        return LintResult(True, [])

    def check_1_10(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        if self.encoding != "CP932":
            return LintResult(True, [])

        def bad(v: Optional[str]) -> bool:
            if v is None:
                return False
            try:
                v.encode("CP932").decode("shift_jis")
                return False
            except UnicodeDecodeError:
                return True
            except UnicodeEncodeError:
                return False

        cells = []
        for rows, offset in [(self.header, self.header_offset),
                             (self.content, self.content_offset)]:
            for i, r in enumerate(rows):
                for j in range(self.n_cols):
                    if bad(r[j]):
                        cells.append((i + offset, j))
        return self._single_message_result("機種依存⽂字が含まれています。", cells)

    def _adjacent_ok(self, j: int, conditions: list) -> bool:
        """Left/right neighbor of type T satisfying the predicate on EVERY
        row (rules/tabular.py:487-502). A predicate may return None to mean
        "this row is NULL in the engine's plan" — the engine aggregates with
        F.min, which IGNORES NULL rows, so None rows are skipped here; if
        every row is None (or content is empty) the min is NULL => not ok."""
        if not self.content:
            return False
        for adj in (j - 1, j + 1):
            if not (0 <= adj < self.n_cols):
                continue
            for ctype, pred in conditions:
                if self.column_classify[adj] != ctype:
                    continue
                vals = [pred(r[j], r[adj]) for r in self.content]
                non_null = [v for v in vals if v is not None]
                if non_null and all(non_null):
                    return True
        return False

    def check_1_11(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b

        def era_vs(regex: "re.Pattern[str]"):
            def pred(target: Optional[str], adjacent: Optional[str]) -> bool:
                year = _jp_era_to_western(target)
                if year is None:
                    return True  # unconvertible cells pass
                m = regex.search(adjacent or "")
                extracted = m.group(1) if m else ""
                if extracted == "":
                    return False
                try:
                    return int(extracted.translate(_FW_DIGITS)) == year
                except ValueError:
                    # engine parity: try_cast yields NULL for an unparseable
                    # extraction and F.min IGNORES the NULL row — skip, don't
                    # fail (rules/tabular.py:524-529). Unreachable while the
                    # capture groups are digit-only, but pinned to the
                    # engine's semantics rather than an assumption.
                    return None
            return pred

        conditions = [
            (ColumnType.DATETIME_CODE, era_vs(_DATETIME_RE)),
            (ColumnType.CHRISTIAN_ERA, era_vs(_CHRISTIAN_RE)),
        ]
        invalid_columns = [
            (None, j)
            for j in range(self.n_cols)
            if self.column_classify[j] == ColumnType.JP_CALENDAR_YEAR
            and not self._adjacent_ok(j, conditions)
        ]
        return self._single_message_result(
            "和暦に適切な時間軸コードまたは⻄暦が併記されていません。", invalid_columns
        )

    def check_1_12(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        pref_cols = [
            j for j in range(self.n_cols)
            if self.column_classify[j] == ColumnType.PREFECTURE_NAME
        ]
        if not pref_cols:
            return LintResult(True, [])
        invalid_cells: list[tuple[Optional[int], int]] = []
        invalid_columns: list[tuple[None, int]] = []

        def name_code_ok(name: Optional[str], number: Optional[str]) -> bool:
            # isinstance(number, int) parity (rules/tabular.py:563-571)
            if number is None or _ASCII_INT_RE.search(number) is None:
                return False
            if _is_empty(name):
                return True
            if name == "北海道":
                return number == "1"
            code = rx.ABBREV_TO_CODE.get(name)
            return code is not None and code == int(number)

        for j in pref_cols:
            col = [r[j] for r in self.content]
            all_full = bool(col) and all(
                _is_empty(v) or v not in _ABBREV_PREF for v in col
            )
            if all_full:
                continue  # entirely full names -> valid
            all_abbrev = bool(col) and all(
                v == "北海道" or _is_empty(v) or v not in _FULL_PREF for v in col
            )
            if not all_abbrev:
                # mixed: flag each abbreviated cell
                invalid_cells.extend(
                    (i + self.content_offset, j)
                    for i, v in enumerate(col)
                    if not _is_empty(v) and v in _ABBREV_PREF
                )
                continue
            if not self._adjacent_ok(
                j, [(ColumnType.PREFECTURE_CODE, name_code_ok)]
            ):
                invalid_columns.append((None, j))

        contents = []
        if invalid_cells:
            contents.append(
                InvalidContent("都道府県名は「都・道・府・県」まで正しく記入してください。", invalid_cells)
            )
        if invalid_columns:
            contents.append(
                InvalidContent(
                    "都道府県コードを隣の列に併記する。もしくは、「都・道・府・県」まで正しく記入してください。",
                    invalid_columns,
                )
            )
        return LintResult(not contents, contents)

    def check_1_13(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        cells = []
        for j in range(self.n_cols):
            if not self.column_classify[j].is_number():
                continue
            for i, r in enumerate(self.content):
                c = r[j]
                not_masked = True if _cell_null(c) else c not in ("***", "X", "0")
                if not _is_include_number(c) and not_masked:
                    cells.append((i + self.content_offset, j))
        return self._single_message_result(
            "数値データの列の空欄には'***','X','0'のいずれかを適切に入力してください。", cells
        )

    def check_2_x(self) -> LintResult:
        if (b := self._gate()) is not None:
            return b
        if self.n_cols == 0:
            return LintResult(True, [])
        null_rows = sum(
            1 for r in self.content if all(_cell_null(v) for v in r)
        )
        # all() over zero rows is True: an empty content block counts every
        # column empty — same as Spark's sum-over-zero-rows NULL -> 0 path
        empty_cols = sum(
            1 for j in range(self.n_cols)
            if all(_cell_null(r[j]) for r in self.content)
        )
        if null_rows + empty_cols > 0:
            return LintResult.simple_error(
                "データのない列や行が含まれている、もしくは複数の表が含まれています。"
            )
        return LintResult(True, [])

    def check_all(self) -> dict[str, LintResult]:
        return {name: getattr(self, f"check_{name}")() for name in CHECK_NAMES}
