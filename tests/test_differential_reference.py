"""Differential fuzz: OUR TabularLinter vs the REFERENCE linter itself.

The golden-sample parity tests pin the reference's own fixtures; this goes
further and runs BOTH linters on seeded randomized CSVs, comparing every
check's verdict and violation cells. The reference package imports from
/root/reference (read-only, used as an executable spec — no code copied);
its two absent dependencies are shimmed:

- ``chardet``: answers with the engine's own try-decode ladder label
  (utf-8 → SHIFT_JIS → CP932 → EUC-JP, BOM first). Both linters therefore
  decode through the SAME encoding answer, so the differential compares
  every downstream check (including 1-10's CP932 roundtrip) across
  non-UTF-8 corpora; statistical chardet-vs-ladder divergence itself is
  pinned separately in test_encoding_detection.py;
- ``jeraconv``: 5-era arithmetic matching jeraconv's documented behavior
  (the same table our Catalyst CASE uses — era parity itself is pinned by
  the reference goldens, not by this test).
"""

import csv
import io
import re
import sys
import types

import numpy as np
import pytest

from _diffsize import diff_trials

CHECKS = ["1_1", "1_2", "1_3", "1_4", "1_5", "1_6", "1_7",
          "1_10", "1_11", "1_12", "1_13", "2_x"]


@pytest.fixture
def reference_linter():
    """Import the reference CSVLinter under dependency shims, then REMOVE
    the shims and the reference modules from sys.modules — the fake
    openpyxl must not leak into tests that gate on a real import
    (sources/excel.py falls back to xlsx_mini when openpyxl is absent)."""
    added = _install_reference_shims()
    try:
        from opendatalinter.csv_linter import CSVLinter

        yield CSVLinter
    finally:
        for mod in added + [m for m in list(sys.modules) if m.startswith("opendatalinter")]:
            sys.modules.pop(mod, None)
        if "/root/reference" in sys.path:
            sys.path.remove("/root/reference")


def _install_reference_shims():
    added = []
    if "chardet" not in sys.modules:
        chardet = types.ModuleType("chardet")

        def _detect(data):
            if data.startswith(b"\xef\xbb\xbf"):
                return {"encoding": "UTF-8-SIG", "confidence": 0.99}
            for codec, label in [("utf-8", "utf-8"), ("shift_jis", "SHIFT_JIS"),
                                 ("cp932", "CP932"), ("euc_jp", "EUC-JP")]:
                try:
                    data.decode(codec)
                    return {"encoding": label, "confidence": 0.99}
                except UnicodeDecodeError:
                    continue
            return {"encoding": None, "confidence": 0.0}

        chardet.detect = _detect
        sys.modules["chardet"] = chardet
        added.append("chardet")
    if "jeraconv" not in sys.modules:
        pkg = types.ModuleType("jeraconv")
        mod = types.ModuleType("jeraconv.jeraconv")
        eras = {"明治": 1868, "大正": 1912, "昭和": 1926, "平成": 1989, "令和": 2019}
        pat = re.compile(r"^(明治|大正|昭和|平成|令和)(元|\d{1,2})年?$")

        class J2W:
            def convert(self, s):
                m = pat.match(str(s))
                if not m:
                    raise ValueError(s)
                n = 1 if m.group(2) == "元" else int(m.group(2))
                return eras[m.group(1)] + n - 1

        mod.J2W = J2W
        pkg.jeraconv = mod
        sys.modules["jeraconv"] = pkg
        sys.modules["jeraconv.jeraconv"] = mod
        added += ["jeraconv", "jeraconv.jeraconv"]
    if "openpyxl" not in sys.modules:
        # the reference package __init__ imports its ExcelLinter; we only
        # exercise the CSV linter, so the import just needs to succeed
        op = types.ModuleType("openpyxl")
        op.load_workbook = None
        cell = types.ModuleType("openpyxl.cell")
        cell.Cell = type("Cell", (), {})
        op.cell = cell
        sys.modules["openpyxl"] = op
        sys.modules["openpyxl.cell"] = cell
        added += ["openpyxl", "openpyxl.cell"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return added


PREFS = ["北海道", "東京都", "大阪府", "京都府", "愛知県", "沖縄県"]
BAD_PREFS = ["東京", "大阪", "愛知"]


def _gen_csv(rng) -> bytes:
    """Realistic open-data-ish table with seeded defect injection."""
    n_rows = int(rng.integers(3, 12))
    cols = []
    header = []
    kinds = rng.choice(
        ["int", "str", "pref", "year", "era", "money", "mixed"],
        size=int(rng.integers(2, 6)),
    )
    for j, kind in enumerate(kinds):
        header.append(f"列{j}")
        vals = []
        for i in range(n_rows):
            r = rng.random()
            if kind == "int":
                v = str(int(rng.integers(0, 5000)))
                if r < 0.08:
                    v = f" {v} "          # 1-5 whitespace
                elif r < 0.12:
                    v = f"{v}円"          # 1-3 unit in cell
                elif r < 0.16:
                    v = "１２３"          # full-width
                elif r < 0.22:            # float()-grammar edges (round 4:
                    # Java d/f suffixes vs PEP-515 underscores — engine must
                    # match the reference's float() on every one of these)
                    v = str(rng.choice([
                        "120d", "3f", "1.5F", "0x1p3", "1_0", "1_2_3",
                        "1__0", "1_", "-nan", "inf", "1.", ".5",
                    ]))
            elif kind == "str":
                v = str(rng.choice(["備考", "テスト", "abc", "na"]))
                if r < 0.1:
                    v = ""
            elif kind == "pref":
                v = str(rng.choice(PREFS if r > 0.15 else BAD_PREFS))
            elif kind == "year":
                v = str(int(rng.integers(1980, 2026)))
            elif kind == "era":
                v = f"平成{int(rng.integers(1, 31))}年"
                if r < 0.1:
                    v = "平成99年"
            elif kind == "money":
                v = str(int(rng.integers(0, 10**6)))
                if r < 0.1:
                    v = "***"             # 1-13 masked
                elif r < 0.15:
                    v = "1,234"           # 1-2 multiple data / formatted
            else:  # mixed: numbers with stray strings
                v = str(int(rng.integers(0, 100))) if r > 0.2 else "不明"
            vals.append(v)
        cols.append(vals)
    rows = [header] + [[c[i] for c in cols] for i in range(n_rows)]
    if rng.random() < 0.3:                # title line before the header
        rows.insert(0, ["統計表", *[""] * (len(cols) - 1)])
    if rng.random() < 0.2:                # 2-x empty row
        rows.insert(int(rng.integers(1, len(rows))), [""] * len(cols))
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerows(rows)
    return buf.getvalue().encode("utf-8")


def _norm(result) -> tuple:
    cells = set()
    for ic in result.invalid_contents:
        cells.update(tuple(c) for c in ic.invalid_cells)
    return (result.is_valid, frozenset(cells))


def test_differential_vs_reference(spark, reference_linter):
    RefLinter = reference_linter

    from open_data_linter_spark.rules.tabular import TabularLinter

    rng = np.random.default_rng(20260817)
    mismatches = []
    for trial in range(diff_trials(10, 25)):
        data = _gen_csv(rng)
        ref = RefLinter(data, "t.csv")
        ours = TabularLinter(spark, data, "t.csv")
        for name in CHECKS:
            r = _norm(getattr(ref, f"check_{name}")())
            o = _norm(getattr(ours, f"check_{name}")())
            if r != o:
                mismatches.append(
                    (trial, name, r, o, data.decode("utf-8")[:300])
                )
    assert not mismatches, "\n\n".join(map(repr, mismatches[:5]))


def _gen_adjacency_csv(rng) -> bytes:
    """Corpus slanted at the reference's trickiest logic: the 1-11/1-12
    cross-column adjacency checks (era years need an adjacent western
    year/datetime-code column; prefecture codes need the matching name
    adjacent) plus datetime codes and bracketed numbers."""
    n_rows = int(rng.integers(4, 10))
    layout = rng.choice(["era_west", "era_alone", "code_name", "code_wrongname",
                         "code_alone", "dtcode", "brackets"])
    cols, header = [], []

    def col(name, gen):
        header.append(name)
        cols.append([gen(i) for i in range(n_rows)])

    prefs_by_code = {1: "北海道", 13: "東京都", 27: "大阪府", 26: "京都府",
                     23: "愛知県", 47: "沖縄県"}
    codes = list(prefs_by_code)
    if layout == "era_west":
        years = [int(rng.integers(1, 31)) for _ in range(n_rows)]
        col("和暦", lambda i: f"平成{years[i]}年")
        col("西暦", lambda i: str(1988 + years[i] + (0 if rng.random() > 0.2 else 1)))
    elif layout == "era_alone":
        col("和暦", lambda i: f"令和{int(rng.integers(1, 8))}年")
        col("値", lambda i: str(int(rng.integers(0, 100))))
    elif layout in ("code_name", "code_wrongname"):
        picked = [int(rng.choice(codes)) for _ in range(n_rows)]
        col("コード", lambda i: str(picked[i]))
        if layout == "code_name":
            col("都道府県", lambda i: prefs_by_code[picked[i]])
        else:
            col("都道府県", lambda i: str(rng.choice(list(prefs_by_code.values()))))
    elif layout == "code_alone":
        col("コード", lambda i: str(int(rng.choice(codes))))
        col("備考", lambda i: "x")
    elif layout == "dtcode":
        col("年度", lambda i: str(rng.choice(["2021", "202104", "2021年度", "令和3年度"])))
        col("値", lambda i: str(int(rng.integers(0, 9999))))
    else:  # brackets / mixed-number forms (check 1-2)
        col("件数", lambda i: str(rng.choice(["12(3)", "12", "45(6)", "7個", "8.5"])))
        col("比", lambda i: str(rng.choice(["1:2", "3-4", "5", "6/7"])))
    if rng.random() < 0.4:  # extra plain column on the far side
        col("合計", lambda i: str(int(rng.integers(0, 10**5))))
    rows = [header] + [[c[i] for c in cols] for i in range(n_rows)]
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerows(rows)
    return buf.getvalue().encode("utf-8")


def test_differential_adjacency_vs_reference(spark, reference_linter):
    RefLinter = reference_linter

    from open_data_linter_spark.rules.tabular import TabularLinter

    rng = np.random.default_rng(77)
    mismatches = []
    for trial in range(diff_trials(8, 21)):
        data = _gen_adjacency_csv(rng)
        ref = RefLinter(data, "t.csv")
        ours = TabularLinter(spark, data, "t.csv")
        for name in CHECKS:
            r = _norm(getattr(ref, f"check_{name}")())
            o = _norm(getattr(ours, f"check_{name}")())
            if r != o:
                mismatches.append((trial, name, r, o, data.decode("utf-8")[:300]))
    assert not mismatches, "\n\n".join(map(repr, mismatches[:5]))


_NA_POOL = ["nan", "NaN", "NULL", "N/A", "<NA>", "None", "-nan", ""]
_CP932_ONLY = ["①", "②", "髙", "㈱"]  # NEC/IBM extensions: CP932 yes, strict shift_jis no


def _gen_cross_csv(rng) -> bytes:
    """Encoding × structure-quirk × NA-token cross corpus (VERDICT r2 #8).

    - encoding: utf-8 / shift_jis-safe / cp932 (with CP932-only chars that
      trip the 1-10 roundtrip), decoded by BOTH linters through the same
      ladder answer (chardet shim);
    - structure: 0-2 title lines, ragged rows, injected empty rows,
      optional UTF-8 BOM;
    - cells: NA-token sprinkle across int / string / prefecture / era /
      datetime-code columns.
    """
    enc = str(rng.choice(["utf-8", "shift_jis", "cp932"]))
    n_rows = int(rng.integers(3, 9))
    kinds = rng.choice(["int", "str", "pref", "era", "money", "dt", "mixed"],
                       size=int(rng.integers(2, 5)))
    header, cols = [], []
    for j, kind in enumerate(kinds):
        header.append(f"項目{j}")
        vals = []
        for i in range(n_rows):
            r = rng.random()
            if r < 0.15:
                v = str(rng.choice(_NA_POOL))
            elif kind == "int":
                v = str(int(rng.integers(0, 3000)))
                if r < 0.25:
                    v = f"{v} "  # 1-5-ish padding (numeric col: pandas eats it)
            elif kind == "str":
                v = str(rng.choice(["データ", "名称", "合計", "備考"]))
                if enc == "cp932" and r < 0.3:
                    v = v + str(rng.choice(_CP932_ONLY))  # 1-10 trigger
            elif kind == "pref":
                v = str(rng.choice(PREFS if r > 0.2 else BAD_PREFS))
            elif kind == "era":
                v = f"昭和{int(rng.integers(1, 60))}年"
            elif kind == "money":
                v = str(rng.choice(["***", "X", "0", str(int(rng.integers(0, 10**5)))]))
            elif kind == "dt":
                v = str(rng.choice(["202101", "20210100", "2021004000"]))
            else:  # mixed
                v = str(rng.choice(["12(3)", "4 5", "六", "7.5", "8"]))
            vals.append(v)
        cols.append(vals)
    rows = [header] + [[c[i] for c in cols] for i in range(n_rows)]
    for _ in range(int(rng.integers(0, 3))):  # title lines
        rows.insert(0, [str(rng.choice(["統計調査", "令和3年度"])), *[""] * (len(cols) - 1)])
    if rng.random() < 0.25:  # ragged row: drop trailing fields
        k = int(rng.integers(1, len(rows)))
        rows[k] = rows[k][: max(1, len(cols) - 1)]
    if rng.random() < 0.2:  # empty row
        rows.insert(int(rng.integers(1, len(rows))), [""] * len(cols))
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerows(rows)
    text = buf.getvalue()
    try:
        data = text.encode(enc)
    except UnicodeEncodeError:
        data = text.encode("utf-8")
    if enc == "utf-8" and rng.random() < 0.2:
        data = b"\xef\xbb\xbf" + data  # BOM
    return data


def test_differential_cross_corpus(spark, reference_linter):
    """Encoding × quirk × NA cross-product, 50 seeded cases — raises the
    total differential corpus past 100 cases (VERDICT r2 #8)."""
    RefLinter = reference_linter

    from open_data_linter_spark.rules.tabular import TabularLinter

    rng = np.random.default_rng(40260817)
    mismatches = []
    for trial in range(diff_trials(16, 50)):
        data = _gen_cross_csv(rng)
        ref = RefLinter(data, "t.csv")
        ours = TabularLinter(spark, data, "t.csv")
        for name in CHECKS:
            r = _norm(getattr(ref, f"check_{name}")())
            o = _norm(getattr(ours, f"check_{name}")())
            if r != o:
                mismatches.append((trial, name, r, o, data[:300]))
    assert not mismatches, "\n\n".join(map(repr, mismatches[:5]))


def test_differential_nan_na_cells(spark, reference_linter):
    """pandas NA spellings parse to NaN (reference counts them EMPTY in
    classification); the render must yield NULL, not the string 'NaN' —
    the review's scenario: ['13','nan'] must classify PREFECTURE_CODE at
    rate 1.0 and trip 1-12 in BOTH linters."""
    RefLinter = reference_linter

    from open_data_linter_spark.rules.tabular import TabularLinter

    csvs = [
        "コード,値\n13,7\nnan,8\n27,9\n",          # nan among pref codes
        "a,b\nnan,x\nNaN,y\nNULL,z\n",             # all-NA numeric column
        "年,件\n2021,5\nN/A,6\n2023,7\n",          # NA token in int column
        "コード,県\n13,東京都\nnan,東京都\n",       # NA + adjacency
        'a,b\n"x\ny",2\n"v,w",3\nplain,4\n',      # quoted newline + comma cells
        'id,メモ\n1,"行1\n行2"\n2,ok\n3,ok\n',     # 1-5 must flag the \n cell
    ]
    mismatches = []
    for i, text in enumerate(csvs):
        data = text.encode("utf-8")
        ref = RefLinter(data, "t.csv")
        ours = TabularLinter(spark, data, "t.csv")
        for name in CHECKS:
            r = _norm(getattr(ref, f"check_{name}")())
            o = _norm(getattr(ours, f"check_{name}")())
            if r != o:
                mismatches.append((i, name, r, o, text))
    assert not mismatches, "\n\n".join(map(repr, mismatches))


def test_differential_kernel_vs_reference_direct(reference_linter):
    """VERDICT r3 #7: close the transitive loop one hop shorter. Kernel
    parity was previously proven kernel == TabularLinter == reference; this
    runs the SAME differential generators (fresh seeds) with the reference
    CSVLinter on one side and the worker-local KernelLinter (the
    million-file fleet path) DIRECTLY on the other — no Spark engine in
    the loop at all."""
    RefLinter = reference_linter

    from open_data_linter_spark.rules.kernel import KernelLinter

    rng = np.random.default_rng(42604)
    corpora = (
        [_gen_csv(rng) for _ in range(10)]
        + [_gen_adjacency_csv(rng) for _ in range(8)]
        + [_gen_cross_csv(rng) for _ in range(12)]
        + [
            "コード,値\n13,7\nnan,8\n27,9\n".encode("utf-8"),
            "a,b\nnan,x\nNaN,y\nNULL,z\n".encode("utf-8"),
            'id,メモ\n1,"行1\n行2"\n2,ok\n3,ok\n'.encode("utf-8"),
        ]
    )
    mismatches = []
    for trial, data in enumerate(corpora):
        ref = RefLinter(data, "t.csv")
        kern = KernelLinter(data, "t.csv")
        for name in CHECKS:
            r = _norm(getattr(ref, f"check_{name}")())
            k = _norm(getattr(kern, f"check_{name}")())
            if r != k:
                mismatches.append((trial, name, r, k, data[:300]))
    assert not mismatches, "\n\n".join(map(repr, mismatches[:5]))
