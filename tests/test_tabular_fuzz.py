"""Crash-freedom fuzz: a linter must VERDICT arbitrary input, never raise.

The reference wraps its pipeline per-file; the Spark engine's contract is
the same — any byte blob through TabularLinter.check_all() yields a
LintResult per rule (is_valid ∈ {True, False, None}), with pathological
inputs landing in the 1-1 error channel rather than an exception.
"""

import numpy as np
import pytest

from _diffsize import diff_trials


def _random_blob(rng) -> tuple[bytes, str]:
    kind = rng.integers(0, 6)
    if kind == 0:  # raw random bytes
        return bytes(rng.integers(0, 256, size=int(rng.integers(0, 400)), dtype=np.uint8)), "f.csv"
    if kind == 1:  # empty / whitespace
        return rng.choice([b"", b"\n\n\n", b" ", b"\r\n"]), "f.csv"
    if kind == 2:  # wrong extension
        return b"a,b\n1,2\n", "f.txt"
    if kind == 3:  # ragged / quote-broken csv
        cells = ['"unterminated', "a,,b", ",", '","', "x" * 100, "1,2,3,4,5"]
        n = int(rng.integers(1, 8))
        body = "\n".join(str(rng.choice(cells)) for _ in range(n))
        return body.encode("utf-8"), "f.csv"
    if kind == 4:  # multi-encoding japanese-ish content
        text = "列1,列2\n東京,１２３\n大阪,45\n"
        enc = str(rng.choice(["utf-8", "cp932", "utf-16", "euc_jp"]))
        return text.encode(enc, errors="ignore"), "f.csv"
    # plausible csv with junk prelude rows
    body = "メモ\n\nid,名前,年度\n" + "\n".join(
        f"{i},名{i},{1990 + int(rng.integers(0, 40))}" for i in range(int(rng.integers(1, 10)))
    )
    return body.encode("utf-8"), "f.csv"


def test_tabular_linter_never_raises(spark):
    from open_data_linter_spark.rules.tabular import TabularLinter

    rng = np.random.default_rng(42)
    # seeded prefix: the fast set is the first 30 blobs of the same stream
    # (tests/_diffsize.py); SPARK_GRAFT_FULL_DIFF=1 restores all 60
    for trial in range(diff_trials(30, 60)):
        data, fname = _random_blob(rng)
        linter = TabularLinter(spark, data, fname)
        results = linter.check_all()
        assert results, (trial, data[:50])
        for rid, res in results.items():
            assert res.is_valid in (True, False, None), (trial, rid, data[:50])
