"""Pattern-mask profiling (rules/mask.py)."""

import pytest

from open_data_linter_spark.rules.mask import mask_profile


def test_masks_collapse_runs_and_keep_skeleton(spark):
    rows = [("Customer#000042",), ("Customer#000107",), ("ACME-7b",), (None,)]
    out = mask_profile(
        spark.createDataFrame(rows, "v string"), ["v"], top_k=10
    ).collect()
    got = {r.mask: (r.n, r.frac, r.rank) for r in out}
    assert got == {
        "Aa#9": (2, 0.5, 1),
        "A-9a": (1, 0.25, 2),
        None: (1, 0.25, 3),  # NULLs keep a NULL mask, ranked last on ties
    }


def test_no_collapse_keeps_lengths(spark):
    rows = [("Ab12",)]
    out = mask_profile(
        spark.createDataFrame(rows, "v string"), ["v"], collapse_runs=False
    ).collect()
    assert out[0].mask == "Aa99"


def test_top_k_and_deterministic_tie_break(spark):
    rows = [("aa",)] * 3 + [("11",)] * 2 + [("BB",)] * 2 + [("!?",)]
    out = mask_profile(
        spark.createDataFrame(rows, "v string"), ["v"], top_k=3
    ).collect()
    # ties (n=2) break on mask asc: '9' before 'A'
    assert [(r.mask, r.n, r.rank) for r in out] == [
        ("a", 3, 1), ("9", 2, 2), ("A", 2, 3)
    ]
    assert sum(r.frac for r in out) == pytest.approx(7 / 8)


def test_multi_column_melt_and_non_ascii_kept(spark):
    rows = [("x1", "こんにちはWorld",)]
    out = mask_profile(
        spark.createDataFrame(rows, "a string, b string"), ["a", "b"]
    ).collect()
    got = {(r.column, r.mask) for r in out}
    assert got == {("a", "a9"), ("b", "こんにちはAa")}
