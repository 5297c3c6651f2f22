"""Text-analysis expression tests."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions import text as TX


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "the quick brown fox is on the hill"),
        (2, "el gato en la casa es de madrid"),
        (3, "これは日本語のテキストです"),
        (4, ""),
        (5, None),
        (6, "word"),
        (7, "Hello, world! How are you?"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _col(df, expr, alias="v"):
    return {r.id: r[alias] for r in df.select("id", expr.alias(alias)).collect()}


def test_token_count(tdf):
    got = _col(tdf, TX.token_count(F.col("text")))
    assert got[1] == 8 and got[4] == 0 and got[5] == 0 and got[6] == 1


def test_lang_id(tdf):
    got = _col(tdf, TX.lang_id(F.col("text")))
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "ja"
    assert got[4] == "unknown" and got[5] == "unknown"


def test_stopword_and_punct(tdf):
    sw = _col(tdf, TX.stopword_ratio(F.col("text")))
    assert sw[1] > 0.3  # 'the' x2, 'is', 'on' of 8
    assert sw[4] == 0.0
    pr = _col(tdf, TX.punct_ratio(F.col("text")))
    assert pr[7] > 0 and pr[1] == 0.0


def test_quality_score_ordering(tdf):
    q = _col(tdf, TX.quality_score(F.col("text")))
    assert q[1] > q[4]  # real sentence beats empty
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    got = _col(df, TX.normalized_fingerprint(F.col("text")))
    assert got[1] == got[2] != got[3]


def test_shingles_and_rolling_hashes(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b"), (3, "x")], "id long, text string")
    sh = _col(df, TX.shingles(F.col("text"), 3))
    assert sorted(sh[1]) == ["a b c", "b c d"]
    assert sh[2] == ["a b"]  # shorter than k -> whole text
    assert sh[3] == ["x"]
    rh = _col(df, TX.rolling_hashes(F.col("text"), 3))
    assert len(rh[1]) == 2 and all(isinstance(x, int) for x in rh[1])


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello world 42!"), (2, "日本語abc")], "id long, text string")
    got = _col(df, TX.bpe_ish_token_count(F.col("text")))
    # hello, world, 4, 2, ! -> 5 ; 日,本,語,abc -> 4
    assert got[1] == 5 and got[2] == 4
