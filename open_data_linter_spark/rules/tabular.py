"""Tabular (CSV) lint mode: the reference's own rule set over Spark frames.

This is the compatibility surface proving rule parity: every ``check_*`` of
the reference's ``CSVLinter`` (csv_linter.py:43-525) re-expressed over a
Spark DataFrame of positional string columns, validated against the
reference's OWN sample files and golden cell sets
(tests/test_csv_linter.py). Coordinates are absolute file coordinates,
0-based, exactly like the reference's ``InvalidCellFactory``
(csv_linter.py:64-67).

Scale positioning: this mode lints ONE file per linter instance (the
reference's unit of work); the checks run as Spark jobs over the parsed
frame, and fleet linting parallelizes across files (plans/fleet.py
``lint_files``: concurrent linters over one session). The 10^12-row
path is the fixed-schema audio table engine (rules/audio_rules.py) — this
module exists for semantic parity and for schemaless text ingestion.

Semantics notes (pandas-parity):
- the reference re-parses content through ``pd.read_csv`` so empty cells
  AND pandas na_values tokens ('nan', 'NULL', 'N/A', …) become NaN; here
  cells stay strings and ``_cell_null`` reproduces that NaN set where the
  reference tests isnull (checks 1-6, 1-13, 2-x) or iterates parsed values
  (classification, 1-3 unit columns, numeric-dtype emulation);
- encoding detection: chardet is not in this environment, so detection is
  try-decode in order utf-8 → shift_jis → cp932 → euc_jp — reproducing the
  chardet labels the golden encoding tests depend on
  (tests/test_csv_linter.py:74-86);
- classification chain + vote: rules/classifier.py (exact reproduction).
"""

from __future__ import annotations

import csv
import io
from functools import wraps
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_linter_spark.core.model import InvalidContent, LintResult
from open_data_linter_spark.functions import predicates as P
from open_data_linter_spark.functions import regexes as rx
from open_data_linter_spark.rules.classifier import (
    ColumnType,
    _vote,
    classify_branch,
    counts_from_branch_counts,
)

BLOCKED = "ファイルが読み込めなかったため、チェックできませんでした。"

# the reference's 12 checks, canonical order — shared by TabularLinter,
# the worker-local kernel (rules/kernel.py), and the fleet paths
# (plans/fleet.py); one list so a new check can't be half-wired
CHECK_NAMES = ["1_1", "1_2", "1_3", "1_4", "1_5", "1_6", "1_7",
               "1_10", "1_11", "1_12", "1_13", "2_x"]


def detect_and_decode(data: bytes) -> tuple[str, str]:
    """(text, encoding-label). Try-decode ladder standing in for chardet
    (csv_linter.py:489-492); labels match what the golden tests rely on.

    Tiebreak decisions vs chardet (tests/test_encoding_detection.py pins
    them):
    - bytes decodable as BOTH shift_jis and cp932 label SHIFT_JIS (cp932 is
      a superset; chardet's SJIS prober does the same), so check 1-10 stays
      silent — matching the reference's nb01h0013_sjis golden;
    - bytes containing CP932-only extensions (NEC/IBM rows: ①, 髙, …) fail
      strict shift_jis and label CP932 — 1-10 then fires exactly on the
      cells whose CP932→shift_jis roundtrip fails, matching the
      nb01h0013_cp932 golden (cell (4,0));
    - KNOWN DIVERGENCE: a byte stream valid under BOTH shift_jis and
      euc_jp (practically: EUC SS2 halfwidth-kana runs, 0x8E 0xA1-0xDF —
      ordinary kanji/hiragana text fails strict cross-decoding) is labeled
      SHIFT_JIS here, where chardet's statistical model may answer EUC-JP.
      Deterministic-first beats model-replication for a linter: the label
      (and therefore 1-10's trigger) never depends on byte frequencies.
    """
    if data.startswith(b"\xef\xbb\xbf"):
        return data.decode("utf-8-sig"), "UTF-8-SIG"
    for codec, label in [
        ("utf-8", "utf-8"),
        ("shift_jis", "SHIFT_JIS"),
        ("cp932", "CP932"),
        ("euc_jp", "EUC-JP"),
    ]:
        try:
            return data.decode(codec), label
        except UnicodeDecodeError:
            continue
    raise UnicodeDecodeError("unknown", data, 0, 1, "no codec matched")


def estimate_structure(rows: list[list[str]]) -> tuple[int, int, int]:
    """(title_line_num, header_line_num, content_end) — exact reproduction
    of CSVStructureAnalyzer (csv_structure_analyzer.py:36-69): longest
    (first on tie) run of equal field counts = content block; first line in
    the block containing a float()-parsable cell starts the data."""
    counts = [len(r) for r in rows]
    runs: list[tuple[int, int]] = []  # (start, length)
    start = 0
    for i in range(1, len(counts) + 1):
        if i == len(counts) or counts[i] != counts[i - 1]:
            runs.append((start, i - start))
            start = i
    if not runs:
        raise HeaderEstimateError("empty file")
    best_start, best_len = max(runs, key=lambda r: (r[1], -r[0]))

    def _is_num(e: str) -> bool:
        try:
            float(e)
            return True
        except ValueError:
            return False

    for i, row in enumerate(rows[best_start:best_start + best_len]):
        if any(_is_num(e) for e in row):
            return best_start, i, best_start + best_len
    raise HeaderEstimateError("no numeric row in content block")


class HeaderEstimateError(ValueError):
    """errors.py:1-2 analog."""


# pandas default na_values: pd.read_csv parses these tokens to NaN in ANY
# column (empirically pinned); a whitespace-only cell ' ' is NOT NaN
_PD_NA_TOKENS = [
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
]


def _cell_null(c: Column) -> Column:
    """Cell the reference's pd.read_csv parses to NaN (df.isnull() is the
    emptiness the reference's 1-6/2-x checks test — NOT funcs.is_empty,
    which additionally matches '-'/'ー'/'なし' prefixes)."""
    return c.isNull() | c.isin(_PD_NA_TOKENS)


class TabularLinter:
    """CSVLinter-equivalent over Spark DataFrames (csv_linter.py:43-93)."""

    def __init__(
        self,
        spark: SparkSession,
        data: bytes,
        filename: str,
        title_line_num: Optional[int] = None,
        header_line_num: Optional[int] = None,
    ) -> None:
        self.spark = spark
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

        # row slicing stays pinned to the ANALYZER's estimate; caller
        # overrides move only the violation-coordinate offsets — exactly the
        # reference's InvalidCellFactory semantics (csv_linter.py:62-70:
        # gen_header_df/gen_rows_df use the analyzer's own line numbers)
        content_rows = rows[t + h:end]
        header_rows = rows[t:t + h]
        self.n_cols = len(rows[t]) if end > t else 0
        self.header_df = self._to_df(header_rows)
        self.df = self._to_df(content_rows)
        self.content_offset = self.title_line_num + self.header_line_num
        self.header_offset = self.title_line_num
        self.column_classify = self._classify()

    # ----------------------------------------------------------- plumbing

    def _to_df(self, rows: list[list[str]]) -> DataFrame:
        schema = T.StructType(
            [T.StructField("row_idx", T.IntegerType())]
            + [T.StructField(f"c{j}", T.StringType()) for j in range(self.n_cols)]
        )
        data = [
            tuple([i] + [(r[j] if j < len(r) else None) for j in range(self.n_cols)])
            for i, r in enumerate(rows)
        ]
        return self.spark.createDataFrame(data, schema)

    # what pandas' C parser accepts as numeric (ASCII only — full-width
    # digits stay object dtype, unlike Python float())
    _PD_FLOAT_RE = r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$"
    _PD_INT_RE = r"^\s*[+-]?\d+\s*$"
    # pandas C-parser also parses inf/nan spellings into float64
    _PD_INF_RE = r"^[ \t]*[+-]?(?i:inf(?:inity)?)[ \t]*$"
    _PD_NAN_RE = r"^[ \t]*[+-]?(?i:nan)[ \t]*$"
    _PD_INFNAN_RE = r"^[ \t]*[+-]?(?i:inf(?:inity)?|nan)[ \t]*$"
    _PD_NA_TOKENS = _PD_NA_TOKENS  # module-level list (see _cell_null)

    def _pd_numeric_cell(self, c: Column) -> Column:
        """Cell compatible with a pandas-numeric column dtype.

        Java \\d and \\s here are ASCII — pandas' C tokenizer accepts only
        ASCII digits and space/tab padding, so full-width digits (which
        Python float() ACCEPTS, functions/predicates.is_number) correctly
        force object dtype. Using is_number here once skipped check 1-5 on
        a column mixing '１２３' with ' 1262 ' (found by differential fuzz
        vs the reference, tests/test_differential_reference.py).
        """
        return (
            _cell_null(c)
            | c.rlike(self._PD_FLOAT_RE)
            | c.rlike(self._PD_INFNAN_RE)
        )

    def _pandas_render(self, j: int, pd_numeric: bool, pd_int: bool) -> Column:
        """Emulate str() of the pandas-PARSED cell (column_classifier.py sees
        parsed values, not raw tokens): an all-int column with empties
        becomes float64 — '2021' renders '2021.0' and stops matching
        CHRISTIAN_ERA/DATETIME_CODE; a pure-int column stays int64 and
        renders unchanged; non-numeric columns keep raw strings."""
        c = F.col(f"c{j}")
        if not pd_numeric:
            # pd.read_csv applies na_values PER CELL: 'nan'/'NULL'/'<NA>'…
            # become NaN even inside object-dtype columns, and the
            # reference's classifier counts NaN empty (funcs.py:68-77
            # pd.isnull first). Found by the round-3 cross-corpus
            # differential ('nan' amid era strings diluted the vote).
            return F.when(_cell_null(c), F.lit(None).cast("string")).otherwise(c)
        if pd_int:
            return F.trim(c).try_cast("long").cast("string")
        # NA tokens and nan spellings parse to NaN: pd.isnull is True, so
        # the reference's classifier counts them EMPTY — render NULL, never
        # the string 'NaN' (Spark's NaN-double→string). inf spellings stay
        # numbers: str(float('inf')) == 'inf' (sign preserved).
        return (
            F.when(
                _cell_null(c) | c.rlike(self._PD_NAN_RE),
                F.lit(None).cast("string"),
            )
            .when(
                c.rlike(self._PD_INF_RE),
                F.when(F.trim(c).startswith("-"), F.lit("-inf")).otherwise(F.lit("inf")),
            )
            .otherwise(F.trim(c).try_cast("double").cast("string"))
        )

    def _classify(self) -> list[ColumnType]:
        """One fused counting pass + driver vote (ColumnClassifier parity).
        Branch ids computed once per cell in a projection (linear plan).

        Cells are classified from the pandas-dtype RENDERING of the column
        (see _pandas_render): the reference classifies str() of the parsed
        DataFrame cell, so mixed int+empty columns classify as OTHER_NUMBER
        ('2021.0'), not CHRISTIAN_ERA — reproduced here."""
        if self.n_cols == 0:
            return []
        # one tiny agg deciding each column's pandas dtype
        dt_aggs = []
        for j in range(self.n_cols):
            c = F.col(f"c{j}")
            empty = _cell_null(c)
            dt_aggs.append(
                F.min(self._pd_numeric_cell(c).cast("int")).alias(f"num{j}")
            )
            dt_aggs.append(
                F.min((~empty & c.rlike(self._PD_INT_RE)).cast("int")).alias(f"int{j}")
            )
        dt_row = self.df.agg(*dt_aggs).collect()[0]
        renders = [
            self._pandas_render(
                j,
                pd_numeric=int(dt_row[f"num{j}"] or 0) == 1,
                pd_int=int(dt_row[f"int{j}"] or 0) == 1,
            )
            for j in range(self.n_cols)
        ]
        proj = self.df.select(
            *[classify_branch(renders[j]).alias(f"b{j}") for j in range(self.n_cols)]
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for j in range(self.n_cols):
            for k in range(9):
                aggs.append(
                    F.sum((F.col(f"b{j}") == k).cast("long")).alias(f"{j}__k{k}")
                )
        row = proj.agg(*aggs).collect()[0].asDict()
        rows_n = int(row["__rows"])
        out = []
        for j in range(self.n_cols):
            branch_counts = {k: int(row[f"{j}__k{k}"] or 0) for k in range(9)}
            counts = counts_from_branch_counts(branch_counts)
            out.append(_vote(counts, rows_n, branch_counts.get(0, 0), 0.8))
        return out

    def _collect_cells(
        self, df: DataFrame, flags: list[tuple[int, Column]], offset: int
    ) -> list[tuple[int, int]]:
        """Collect absolute (row, col) for every true flag — ONE job for all
        columns of a check (the reference rescans per cell, we don't)."""
        if not flags:
            return []
        structs = [
            F.struct(F.lit(j).alias("j"), flag.alias("f")) for j, flag in flags
        ]
        hits = F.filter(F.array(*structs), lambda s: F.coalesce(s["f"], F.lit(False)))
        rows = (
            df.select("row_idx", F.explode(hits).alias("h"))
            .select("row_idx", F.col("h.j").alias("j"))
            .collect()
        )
        return [(int(r["row_idx"]) + offset, int(r["j"])) for r in rows]

    def _gate(self) -> Optional[LintResult]:
        if "1-1" in self.cache and not self.cache["1-1"].is_valid:
            return LintResult.simple_error(BLOCKED, is_valid=None)
        return None

    # -------------------------------------------------------------- checks

    def check_1_1(self) -> LintResult:
        if "1-1" in self.cache:
            return self.cache["1-1"]
        return LintResult(True, [])

    def check_1_2(self) -> LintResult:
        """One datum per cell (csv_linter.py:95-131)."""
        if (b := self._gate()) is not None:
            return b
        comma_flags, whole_flags = [], []
        for j in range(self.n_cols):
            c = F.col(f"c{j}")
            parts = F.split(c, "[、,]")
            comma = (F.size(parts) > 1) & F.exists(
                parts, lambda p: F.trim(p).rlike(rx.NUM_WITH_BRACKETS)
            )
            whole = (F.size(parts) <= 1) & (
                F.trim(c).rlike(rx.NUM_WITH_BRACKETS) | F.trim(c).rlike(rx.NUM_WITH_NUM)
            )
            comma_flags.append((j, c.isNotNull() & comma))
            whole_flags.append((j, c.isNotNull() & whole))
        comma_cells = self._collect_cells(self.df, comma_flags, self.content_offset)
        whole_cells = self._collect_cells(self.df, whole_flags, self.content_offset)
        contents = []
        if comma_cells:
            contents.append(InvalidContent("句点によりデータが分割されています。", comma_cells))
        if whole_cells:
            contents.append(InvalidContent("括弧によりデータが分割されています。", whole_cells))
        return LintResult(not contents, contents)

    def check_1_3(self) -> LintResult:
        """Numeric columns numeric; unit-suffix columns (csv_linter.py:133-185)."""
        if (b := self._gate()) is not None:
            return b
        cell_flags = []
        col_aggs = {}
        for j in range(self.n_cols):
            c = F.col(f"c{j}")
            if self.column_classify[j].is_number():
                cell_flags.append((j, ~P.is_number(c) & P.is_include_number(c)))
            if self.column_classify[j] == ColumnType.NONE_CATEGORY:
                # parsed-NaN cells (NA tokens) are is_empty(NaN)=True in the
                # reference's loop over the PARSED column — e.g. an all-'nan'
                # column trips the unit-column flag (quirk kept for parity)
                qualifying = _cell_null(c) | P.is_empty(c) | (
                    ~P.is_empty(c) & c.rlike(rx.NUMBER_STRING)
                )
                col_aggs[j] = F.sum(qualifying.cast("long"))
        cells = self._collect_cells(self.df, cell_flags, self.content_offset)
        columns = []
        if col_aggs:
            row = self.df.agg(
                F.count(F.lit(1)).alias("__n"),
                *[v.alias(f"q{j}") for j, v in col_aggs.items()],
            ).collect()[0]
            for j in col_aggs:
                if int(row[f"q{j}"] or 0) == int(row["__n"]):
                    columns.append((None, j))
        contents = []
        if cells:
            contents.append(InvalidContent("数値データに文字や空欄が含まれています。", cells))
        if columns:
            contents.append(
                InvalidContent("数値データの列に単位などの文字が含まれている可能性があります。", columns)
            )
        return LintResult(not contents, contents)

    def check_1_4(self) -> LintResult:
        """Merged cells — Excel only; CSV trivially valid (csv_linter.py:187-191)."""
        if (b := self._gate()) is not None:
            return b
        return LintResult(True, [])

    def _pandas_numeric_cols(self, df: DataFrame) -> list[bool]:
        """pandas-dtype emulation: pd.read_csv turns an all-numeric column
        into numbers, so ' 2' loses its whitespace before any check sees it
        (the reference lints str(cell) of the PARSED value). A column is
        'numeric' when every cell is empty-as-NaN or float()-parsable."""
        key = "_pnum_header" if df is self.header_df else "_pnum_content"
        cached = getattr(self, key, None)
        if cached is not None:
            return cached
        if self.n_cols == 0:
            return []
        aggs = [
            F.min(self._pd_numeric_cell(F.col(f"c{j}")).cast("int")).alias(f"n{j}")
            for j in range(self.n_cols)
        ]
        row = df.agg(*aggs).collect()[0]
        out = [int(row[f"n{j}"] or 0) == 1 for j in range(self.n_cols)]
        setattr(self, key, out)
        return out

    def check_1_5(self) -> LintResult:
        """No whitespace formatting (csv_linter.py:193-213)."""
        if (b := self._gate()) is not None:
            return b
        cells = []
        for df, offset in [(self.header_df, self.header_offset),
                           (self.df, self.content_offset)]:
            numeric = self._pandas_numeric_cols(df)
            flags = [
                (j, F.col(f"c{j}").isNotNull()
                 & F.col(f"c{j}").rlike(rx.SPACES_AND_LINE_BREAK))
                for j in range(self.n_cols)
                if not numeric[j]  # pandas-parsed numeric cells carry no ws
            ]
            cells.extend(self._collect_cells(df, flags, offset))
        return self._single_message_result("スペースや改⾏が含まれています。", cells)

    def check_1_6(self) -> LintResult:
        """No omitted headers (csv_linter.py:215-226)."""
        if (b := self._gate()) is not None:
            return b
        flags = [(j, _cell_null(F.col(f"c{j}"))) for j in range(self.n_cols)]
        cells = self._collect_cells(self.header_df, flags, self.header_offset)
        return self._single_message_result("ヘッダーに空欄があります。", cells)

    def check_1_7(self) -> LintResult:
        """Formulas — Excel only; CSV trivially valid (csv_linter.py:228-232)."""
        if (b := self._gate()) is not None:
            return b
        return LintResult(True, [])

    def check_1_10(self) -> LintResult:
        """Platform-dependent chars under CP932 (csv_linter.py:234-265).

        The CP932→shift_jis roundtrip is not expressible in Catalyst → one
        Arrow-vectorized pandas UDF (SURVEY.md §2.4 F9).
        """
        if (b := self._gate()) is not None:
            return b
        if self.encoding != "CP932":
            return LintResult(True, [])

        @F.pandas_udf("boolean")
        def bad_cp932(s: pd.Series) -> pd.Series:
            def bad(v):
                if v is None:
                    return False
                try:
                    str(v).encode("CP932").decode("shift_jis")
                    return False
                except UnicodeDecodeError:
                    return True
                except UnicodeEncodeError:
                    return False

            return s.map(bad)

        cells = []
        for df, offset in [(self.header_df, self.header_offset),
                           (self.df, self.content_offset)]:
            flags = [(j, bad_cp932(F.col(f"c{j}"))) for j in range(self.n_cols)]
            cells.extend(self._collect_cells(df, flags, offset))
        return self._single_message_result("機種依存⽂字が含まれています。", cells)

    def _adjacent_ok(self, j: int, conditions: list[tuple[ColumnType, Column]]) -> bool:
        """csv_linter.py:494-525: left/right neighbor of type T satisfying the
        row-wise predicate on EVERY row. One agg job over all candidates."""
        aggs = {}
        for adj in (j - 1, j + 1):
            if not (0 <= adj < self.n_cols):
                continue
            for k, (ctype, pred_builder) in enumerate(conditions):
                if self.column_classify[adj] != ctype:
                    continue
                pred = pred_builder(F.col(f"c{j}"), F.col(f"c{adj}"))
                aggs[f"a{adj}_{k}"] = F.min(pred.cast("int"))
        if not aggs:
            return False
        row = self.df.agg(*[v.alias(k) for k, v in aggs.items()]).collect()[0]
        return any(int(row[k] or 0) == 1 for k in aggs)

    def check_1_11(self) -> LintResult:
        """Era ↔ western-year adjacency (csv_linter.py:267-310)."""
        if (b := self._gate()) is not None:
            return b

        def era_vs(regex: str):
            def pred(target: Column, adjacent: Column) -> Column:
                year = P.jp_era_to_western(target)
                extracted = F.regexp_extract(F.coalesce(adjacent, F.lit("")), regex, 1)
                as_int = F.translate(
                    extracted, "０１２３４５６７８９", "0123456789"
                ).try_cast("int")  # Python int() accepts full-width digits
                matches = F.when(extracted != "", as_int == year).otherwise(F.lit(False))
                # unconvertible cells pass (j2w raises first, csv_linter.py:277-281)
                return F.when(year.isNull(), F.lit(True)).otherwise(matches)
            return pred

        conditions = [
            (ColumnType.DATETIME_CODE, era_vs(rx.DATETIME_CODE)),
            (ColumnType.CHRISTIAN_ERA, era_vs(rx.CHRISTIAN_ERA)),
        ]
        invalid_columns = []
        for j in range(self.n_cols):
            if self.column_classify[j] != ColumnType.JP_CALENDAR_YEAR:
                continue
            if not self._adjacent_ok(j, conditions):
                invalid_columns.append((None, j))
        return self._single_message_result(
            "和暦に適切な時間軸コードまたは⻄暦が併記されていません。", invalid_columns
        )

    def check_1_12(self) -> LintResult:
        """Prefecture completeness + code consistency (csv_linter.py:312-448)."""
        if (b := self._gate()) is not None:
            return b
        pref_cols = [
            j for j in range(self.n_cols)
            if self.column_classify[j] == ColumnType.PREFECTURE_NAME
        ]
        invalid_cells: list[tuple[Optional[int], int]] = []
        invalid_columns: list[tuple[None, int]] = []
        if not pref_cols:
            return LintResult(True, [])

        # one agg pass: per prefecture column, all-full? all-abbreviated?
        aggs = {}
        for j in pref_cols:
            c = F.col(f"c{j}")
            not_abbrev = P.is_empty(c) | ~P.is_abbreviated_prefecture_name(c)
            aggs[f"full{j}"] = F.min(not_abbrev.cast("int"))
            no_full_except_hokkaido = (
                (c == "北海道") | P.is_empty(c) | ~P.is_full_prefecture_name(c)
            )
            aggs[f"abbr{j}"] = F.min(no_full_except_hokkaido.cast("int"))
        row = self.df.agg(*[v.alias(k) for k, v in aggs.items()]).collect()[0]

        code_entries = [(F.lit(k), F.lit(v)) for k, v in rx.ABBREV_TO_CODE.items()]
        code_map = F.create_map(*[x for pair in code_entries for x in pair])

        def name_code_ok(name: Column, number: Column) -> Column:
            # isinstance(number, int) parity: integer-literal string
            is_int = F.coalesce(number.rlike(r"^\d+$"), F.lit(False))
            ok = (
                P.is_empty(name)
                | ((name == "北海道") & (number == "1"))
                | (code_map[name] == number.try_cast("int"))
            )
            return is_int & F.coalesce(ok, F.lit(False))

        conditions = [(ColumnType.PREFECTURE_CODE, name_code_ok)]
        for j in pref_cols:
            c = F.col(f"c{j}")
            if int(row[f"full{j}"] or 0) == 1:
                continue  # entirely full names -> valid (csv_linter.py:372-379)
            if int(row[f"abbr{j}"] or 0) != 1:
                # mixed: flag each abbreviated cell (csv_linter.py:427-433)
                cells = self._collect_cells(
                    self.df,
                    [(j, ~P.is_empty(c) & P.is_abbreviated_prefecture_name(c))],
                    self.content_offset,
                )
                invalid_cells.extend(cells)
                continue
            # all-abbreviated: need adjacent code column (csv_linter.py:435-437)
            if not self._adjacent_ok(j, conditions):
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
        """Masked-value domain in numeric columns (csv_linter.py:450-471)."""
        if (b := self._gate()) is not None:
            return b
        flags = []
        for j in range(self.n_cols):
            if not self.column_classify[j].is_number():
                continue
            c = F.col(f"c{j}")
            not_masked = F.when(
                _cell_null(c), F.lit(True)  # NaN not in list -> flagged
            ).otherwise(~c.isin("***", "X", "0"))
            flags.append((j, ~P.is_include_number(c) & not_masked))
        cells = self._collect_cells(self.df, flags, self.content_offset)
        return self._single_message_result(
            "数値データの列の空欄には'***','X','0'のいずれかを適切に入力してください。", cells
        )

    def check_2_x(self) -> LintResult:
        """No empty rows/columns (csv_linter.py:473-487)."""
        if (b := self._gate()) is not None:
            return b
        if self.n_cols == 0:
            return LintResult(True, [])
        all_null_row = F.lit(True)
        aggs = []
        for j in range(self.n_cols):
            c = F.col(f"c{j}")
            all_null_row = all_null_row & _cell_null(c)
            aggs.append(F.sum((~_cell_null(c)).cast("long")).alias(f"nn{j}"))
        row = self.df.agg(
            F.sum(all_null_row.cast("long")).alias("null_rows"), *aggs
        ).collect()[0]
        empty_cols = sum(1 for j in range(self.n_cols) if int(row[f"nn{j}"] or 0) == 0)
        if int(row["null_rows"] or 0) + empty_cols > 0:
            return LintResult.simple_error(
                "データのない列や行が含まれている、もしくは複数の表が含まれています。"
            )
        return LintResult(True, [])

    # -------------------------------------------------------------- helpers

    @staticmethod
    def _single_message_result(message: str, cells: list) -> LintResult:
        # vo.py gen_single_error_message_result parity
        if not cells:
            return LintResult(True, [])
        return LintResult(False, [InvalidContent(message, cells)])

    def check_all(self) -> dict[str, LintResult]:
        return {name: getattr(self, f"check_{name}")() for name in CHECK_NAMES}
