"""Edit-distance fuzzy join (functions/fuzzy_join.py)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.fuzzy_join import fuzzy_join


def _mk(spark, vals, col="s"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


def _pairs(df):
    return sorted(
        (r[0], r[1], r[2]) for r in df.select("s", "t", "distance").collect()
    )


def test_basic_typo_linkage(spark):
    left = _mk(spark, ["golden lace", "goldn lace", "copper wheat", "zzz"])
    right = _mk(spark, ["golden lace", "copper wheat"], col="t")
    got = _pairs(fuzzy_join(left, right, "s", "t"))
    assert got == [
        ("copper wheat", "copper wheat", 0),
        ("golden lace", "golden lace", 0),
        ("goldn lace", "golden lace", 1),
    ]


def test_row_level_join_keeps_duplicates_and_payload(spark):
    left = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abd")], "id int, s string"
    )
    right = spark.createDataFrame([("abc", 9.0)], "t string, w double")
    out = fuzzy_join(left, right, "s", "t").orderBy("id").collect()
    assert [(r["id"], r["t"], r["w"], r["distance"]) for r in out] == [
        (1, "abc", 9.0, 0),
        (2, "abc", 9.0, 0),
        (3, "abc", 9.0, 1),
    ]


def test_collision_suffix(spark):
    left = spark.createDataFrame([(1, "x")], "id int, s string")
    right = spark.createDataFrame([(7, "x")], "id int, s string")
    out = fuzzy_join(left, right, "s", "s")
    assert set(out.columns) == {"id", "s", "id_r", "s_r", "distance"}


def test_short_strings_and_empty(spark):
    left = _mk(spark, ["", "a", "ab", "abc"])
    right = _mk(spark, ["", "b", "ab"], col="t")
    got = _pairs(fuzzy_join(left, right, "s", "t"))
    assert got == [
        ("", "", 0),
        ("", "b", 1),
        ("a", "", 1),
        ("a", "ab", 1),
        ("a", "b", 1),
        ("ab", "ab", 0),
        ("ab", "b", 1),
        ("abc", "ab", 1),
    ]


@pytest.mark.parametrize("d", [1, 2])
def test_lossless_vs_brute_force(spark, d):
    # collision-rich corpus over a 3-letter alphabet, lengths 0..6
    import itertools
    import random

    rng = random.Random(42 + d)
    vocab = ["".join(rng.choices("abc", k=rng.randint(0, 6))) for _ in range(80)]
    lefts, rights = vocab[:40], vocab[40:]
    got = _pairs(
        fuzzy_join(
            _mk(spark, lefts), _mk(spark, rights, col="t"), "s", "t", d
        ).select("s", "t", "distance").distinct()
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = sorted(
        {
            (a, b, lev(a, b))
            for a, b in itertools.product(set(lefts), set(rights))
            if lev(a, b) <= d
        }
    )
    assert got == want


def test_validation(spark):
    df = _mk(spark, ["x"])
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df, "s", "s", 0)
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df, "s", "s", 4)


def test_plan_hash_join_on_segments_not_cartesian(spark, tmp_path):
    import contextlib
    import io

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    _mk(spark, ["golden lace"]).write.parquet(lp)
    _mk(spark, ["golden lace"], col="t").write.parquet(rp)
    out = fuzzy_join(
        spark.read.parquet(lp), spark.read.parquet(rp), "s", "t"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # candidate generation is an equi-join on (sub, i, L) — broadcast
    # here on the toy input, hash-partitioned at scale, never a scan of
    # the cross space; the only nested-loop is the broadcast
    # short-block (alphabet-bounded tiny by construction)
    import re

    assert re.search(r"(SortMerge|ShuffledHash|BroadcastHash)Join \[sub", plan), plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
