"""Text normalization (functions/normalize.py)."""

import unicodedata

from open_data_linter_spark.functions.normalize import normalize_text


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _run(spark, texts, **kw):
    out = normalize_text(_df(spark, texts), **kw).orderBy("doc_id").collect()
    return [r["text_norm"] for r in out]


def test_nfc_composes_combining_sequences(spark):
    decomposed = "café Å"
    got = _run(spark, [decomposed])
    assert got == ["café Å"]
    assert got[0] == unicodedata.normalize("NFC", decomposed)


def test_nfc_does_not_fold_compatibility_forms(spark):
    # NFKC would turn these into "fi" / "123" — NFC must NOT
    assert _run(spark, ["ﬁ １２３"]) == ["ﬁ １２３"]


def test_control_strip_keeps_tab_newline_cr(spark):
    got = _run(spark, ["a\x00b\x01c\x7fd\nkeep\tme\rok"], collapse_ws=False)
    assert got == ["abcd\nkeep\tme\rok"]


def test_whitespace_collapse_explicit_class(spark):
    # runs of space/tab/VT/FF collapse; newlines survive; edges trim
    got = _run(spark, ["  a\t\tb\x0bc\x0cd  \n e "], strip_controls=False)
    assert got == ["a b c d \n e"]


def test_null_and_ascii_fast_path(spark):
    got = _run(spark, [None, "plain ascii stays"])
    assert got == [None, "plain ascii stays"]


def test_pure_catalyst_path_has_no_python_stage(spark):
    out = normalize_text(_df(spark, ["x  y"]), nfc=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_nfc_path_is_one_arrow_stage(spark):
    out = normalize_text(_df(spark, ["x"]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
