"""Randomized parity: Catalyst predicates vs the reference's Python
semantics (funcs.py:15-95), property-tested with hypothesis.

The Python oracles below are the reference's documented cell semantics
re-stated directly (float() acceptance, str.isdigit, re.match prefix
anchoring with Unicode \\s). Each example batch becomes ONE Spark job
evaluating every predicate at once.

No generation filters: since the round-4 `'0d'` counterexample, the engine
gates its numeric cast behind the Python float() grammar
(functions/predicates._PY_FLOAT_GATE), so Java-suffix tokens ('0d'/'1f'),
PEP-515 underscores ('1_0'), and inf/nan literals are all in-domain — the
alphabet deliberately includes '_', 'n', 'i', 'f' to keep generating them.
"""

import re

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from open_data_linter_spark.functions import predicates as P
from open_data_linter_spark.functions import regexes as rx

ALPHABET = (
    "0123456789０１２３４５６７８９"
    "abcdefinzXYZ_"
    " \t　"
    ".,-+eE%円年度（）()、ーなし北海道青森県こんにちは"
)

cell = st.one_of(
    st.none(),
    st.text(alphabet=ALPHABET, min_size=0, max_size=12),
)

EMPTY_PATTERNS = [re.compile(p) for p in [r"^\s*$", "-", "ー", "なし"]]


def ref_is_empty(s):
    if s is None:
        return True
    return any(p.match(s) is not None for p in EMPTY_PATTERNS)


def ref_is_number(s):
    if s is None:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def ref_is_include_number(s):
    if s is None:
        return False
    return any(ch.isdigit() for ch in s)


def ref_is_string(s):
    return not ref_is_empty(s) and not ref_is_include_number(s)


def ref_is_integer(s):
    if not ref_is_number(s):
        return False
    return float(s).is_integer()


def ref_is_prefecture_code(s):
    if not ref_is_integer(s):
        return False
    return 0 < int(float(s)) <= 47


def ref_has_whitespace(s):
    if s is None:
        return False
    return re.search(r"\s", s) is not None


ORACLES = {
    "empty": (P.is_empty, ref_is_empty),
    "number": (P.is_number, ref_is_number),
    "incl_num": (P.is_include_number, ref_is_include_number),
    "string": (P.is_string, ref_is_string),
    "integer": (P.is_integer, ref_is_integer),
    "pref_code": (P.is_prefecture_code, ref_is_prefecture_code),
    "whitespace": (P.has_whitespace, ref_has_whitespace),
    "num_string": (
        P.is_number_string,
        # strip the Java-only (?U) flag; Python \d/\s are Unicode by default
        lambda s: s is not None
        and re.match(rx.NUMBER_STRING.replace("(?U)", ""), s) is not None,
    ),
}


@pytest.fixture(scope="module")
def predicate_eval(spark):
    def run(values):
        df = spark.createDataFrame(list(enumerate(values)), "i long, s string")
        rows = df.select(
            "i", *[fn(F.col("s")).alias(name) for name, (fn, _) in ORACLES.items()]
        ).collect()
        return [r for r in sorted(rows, key=lambda r: r["i"])]

    return run


@settings(max_examples=8, deadline=None)
@given(st.lists(cell, min_size=1, max_size=120))
# the round-4 live counterexample ('0d') and its grammar neighborhood,
# pinned permanently (VERDICT r4 task 1)
@example(
    values=[
        "0d", "1f", "1.5F", "1D", "0x1p3",          # Java-only literals
        "1_0", "1_0.2_5e1_0", "1e1_0",              # PEP-515 accepts
        "1__0", "1_", "_1", "1._5", "1_.5", "1e_5",  # PEP-515 rejects
        "inf", "-Infinity", "nan", "-nan", "+nan", "NAN",
        "1.", ".5", ".", "１２３", "  5 ", "+1", "- 1", "1e", "e5",
    ]
)
def test_predicates_match_reference_semantics(predicate_eval, values):
    got_rows = predicate_eval(values)
    assert len(got_rows) == len(values)
    for v, got in zip(values, got_rows):
        for name, (_fn, oracle) in ORACLES.items():
            expected = bool(oracle(v))
            actual = bool(got[name]) if got[name] is not None else False
            assert actual == expected, (
                f"{name} diverges on {v!r}: spark={actual} python={expected}"
            )
