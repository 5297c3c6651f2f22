"""Catalyst Column predicates mirroring the reference's scalar functions.

Each function here is the vectorized, JVM-side (whole-stage codegen)
equivalent of one Python helper in the reference (funcs.py:15-95) or one
compiled regex (regex.py:3-11). No UDFs: everything stays inside Catalyst so
the expressions fuse into the single validation scan.

Semantics notes (parity with the reference, verified by tests):
- is_number == "float() accepts it": Spark's try_cast to double returns NULL
  on failure (ANSI-safe), which matches float()'s ValueError;
  whitespace-padded numbers are accepted by both. NaN literal: float("nan") succeeds in Python but
  pd.isnull guards it upstream — we treat the *string* "nan"/"NaN" as a
  number, same as the reference does for string cells.
- all predicates take a string-typed column; numeric columns should be cast
  to string first if the original dynamic-typed semantics are needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from open_data_linter_spark.functions import regexes as rx


def is_empty(c: Column) -> Column:
    """Empty-cell test (funcs.py:68-77, regex.py:3-4).

    NULL, whitespace-only, or prefix-matching one of '-', 'ー', 'なし'
    (re.match semantics: '-foo' is empty too).
    """
    return c.isNull() | c.rlike(rx.EMPTY_PATTERN)


def _as_double(c: Column) -> Column:
    """Python-float()-compatible numeric cast.

    Python float() accepts full-width digits (０-９) and strips Unicode
    whitespace; SQL try_cast accepts neither — translate first, then
    try_cast (NULL on malformed; ANSI-safe). Exotic digit families (e.g.
    Arabic-Indic) are out of the reference's domain and not translated.
    """
    return F.translate(c, "０１２３４５６７８９　", "0123456789 ").try_cast("double")


def is_number(c: Column) -> Column:
    """float()-accepts test (funcs.py:15-25): normalized try_cast succeeds.

    try_cast (NULL on malformed), not cast: Spark 4 runs ANSI mode by
    default, where a plain cast THROWS on 'abc' — try_cast restores the
    reference's float()-raises->False semantics."""
    return c.isNotNull() & _as_double(c).isNotNull()


def is_include_number(c: Column) -> Column:
    """Any digit char, incl. full-width ０-９ (funcs.py:80-87)."""
    return c.isNotNull() & c.rlike(rx.ANY_DIGIT)


def is_string(c: Column) -> Column:
    """Non-empty and digit-free (funcs.py:28-38)."""
    return ~is_empty(c) & ~is_include_number(c)


def is_integer(c: Column) -> Column:
    """Number with no fractional part (funcs.py:41-48).

    Infinity guard: float('inf').is_integer() is False in Python, but
    floor(inf)==inf in SQL — excluded explicitly for parity."""
    d = _as_double(c)
    finite = ~F.isnan(d) & (d != F.lit(float("inf"))) & (d != F.lit(float("-inf")))
    return is_number(c) & finite & (d == F.floor(d))


def is_prefecture_code(c: Column) -> Column:
    """Integer in (0, 47] (funcs.py:51-58)."""
    return is_integer(c) & _as_double(c).between(F.lit(1), F.lit(47))


def is_prefecture_name(c: Column) -> Column:
    """Membership in 47 full + 46 abbreviated names (funcs.py:61-65)."""
    return c.isin(*(rx.VALID_PREFECTURE_NAMES + rx.ABBREVIATED_PREFECTURE_NAMES))


def is_full_prefecture_name(c: Column) -> Column:
    return c.isin(*rx.VALID_PREFECTURE_NAMES)


def is_abbreviated_prefecture_name(c: Column) -> Column:
    return c.isin(*rx.ABBREVIATED_PREFECTURE_NAMES)


def has_whitespace(c: Column) -> Column:
    """Any whitespace/newline anywhere (regex.py:6, rule 1-5)."""
    return c.isNotNull() & c.rlike(rx.SPACES_AND_LINE_BREAK)


def is_datetime_code(c: Column) -> Column:
    """e-Stat time-axis code (regex.py:7)."""
    return c.isNotNull() & c.rlike(rx.DATETIME_CODE)


def datetime_code_year(c: Column) -> Column:
    """Captured YYYY of a datetime code, as int (NULL when not matching).

    Full-width digits normalized before the cast (Python int() accepts
    them; the (?U) pattern can capture them)."""
    y = F.regexp_extract(c, rx.DATETIME_CODE, 1)
    return F.when(y != "", F.translate(y, "０１２３４５６７８９", "0123456789").try_cast("int"))


def is_christian_era(c: Column) -> Column:
    """1-4 digit integer (regex.py:8)."""
    return c.isNotNull() & c.rlike(rx.CHRISTIAN_ERA)


def is_num_with_brackets(c: Column) -> Column:
    """'123(note)' pattern (regex.py:9, rule 1-2)."""
    return c.isNotNull() & c.rlike(rx.NUM_WITH_BRACKETS)


def is_num_with_num(c: Column) -> Column:
    """'123 456' whitespace-joined numbers (regex.py:10, rule 1-2)."""
    return c.isNotNull() & c.rlike(rx.NUM_WITH_NUM)


def is_number_string(c: Column) -> Column:
    """Number + unit suffix, e.g. '1000円' (regex.py:11, rule 1-3)."""
    return c.isNotNull() & c.rlike(rx.NUMBER_STRING)


# --- Japanese era conversion (replaces the jeraconv dependency) -----------
#
# jeraconv.J2W converts strings like 令和3年 / 平成元年 → western year.
# The era table is 5 rows (regexes.JP_ERAS), so the conversion is a
# regexp_extract + CASE expression — pure Catalyst, no library, no UDF
# (reference rebuilds a J2W per column, column_classifier.py:65 — an
# anti-pattern we hoist into a constant-folded expression).

_ERA_PATTERN = r"^(明治|大正|昭和|平成|令和)(元|\d{1,2})年?$"


def jp_era_to_western(c: Column) -> Column:
    """Western year for a JP era string, NULL when not parseable."""
    era = F.regexp_extract(c, _ERA_PATTERN, 1)
    num_s = F.regexp_extract(c, _ERA_PATTERN, 2)
    n = F.when(num_s == "元", F.lit(1)).otherwise(num_s.try_cast("int"))
    base = F.lit(None).cast("int")
    for name, first_year in rx.JP_ERAS:
        base = F.when(era == name, F.lit(first_year)).otherwise(base)
    return F.when(era != "", base + n - F.lit(1))


def is_jp_calendar_year(c: Column) -> Column:
    """jeraconv-convertible era string (funcs.py:90-95)."""
    return jp_era_to_western(c).isNotNull()
