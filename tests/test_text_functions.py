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


# ---------------------------------------------------------------------------
# ws_tokens — THE tokenize contract, pinned across all three engines
# ---------------------------------------------------------------------------

NASTY = [
    (0, "alpha beta"),          # plain
    (1, "alpha beta\n"),        # trailing newline (F.trim strips spaces only)
    (2, "\talpha  beta\r\n"),   # leading tab, interior run, CRLF tail
    (3, "a\x0bb c"),            # vertical tab: Java \s splits, RE2 \s does NOT
    (4, "  "),                  # whitespace-only -> []
    (5, ""),                    # empty -> []
    (6, None),                  # NULL -> []
    (7, "x y"),            # NBSP is NOT ASCII whitespace: one token
    (8, "MiXeD Case\fz"),       # lower + form feed
]


def test_ws_tokens_matches_python_twin(spark):
    """Executor ws_tokens == driver java_ws_tokens byte-for-byte, including
    the edge-whitespace shapes that used to leak phantom '' tokens."""
    df = spark.createDataFrame(NASTY, "i long, s string")
    got = {
        r.i: r.t
        for r in df.select("i", TX.ws_tokens(F.col("s")).alias("t")).collect()
    }
    for i, s in NASTY:
        assert got[i] == TX.java_ws_tokens(s), (i, s, got[i])
    assert got[1] == ["alpha", "beta"]      # no phantom trailing ''
    assert got[3] == ["a", "b", "c"]        # \x0B splits
    assert got[4] == [] and got[5] == [] and got[6] == []
    assert got[7] == ["x y"]           # NBSP kept inside the token


def test_ws_tokens_matches_duckdb_oracle_form(spark):
    """The explicit-class SQL form the driver oracles use tokenizes
    identically to the engine — including \\x0B, where RE2's \\s and
    Java's \\s disagree (the reason the class is spelled out)."""
    import duckdb

    df = spark.createDataFrame(NASTY, "i long, s string")
    got = {
        r.i: r.t
        for r in df.select("i", TX.ws_tokens(F.col("s")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in NASTY:
        want = con.execute(
            r"SELECT list_filter(string_split_regex(lower(coalesce(?, '')),"
            r" '[ \t\n\x0b\f\r]+'), x -> x <> '')",
            [s],
        ).fetchone()[0]
        assert got[i] == want, (i, s, got[i], want)


def test_token_count_ignores_edge_whitespace(spark):
    df = spark.createDataFrame(NASTY, "i long, s string")
    got = {
        r.i: r.n
        for r in df.select("i", TX.token_count(F.col("s")).alias("n")).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2, 3: 3, 4: 0, 5: 0, 6: 0, 7: 1, 8: 3}


def test_transcript_cer_char_level_and_normalization(spark):
    """CER is char-level (a CJK substitution costs 1, not its UTF-8
    bytes), whitespace/case drift is free, and a NULL hypothesis scores
    as a full deletion."""
    from open_data_linter_spark.functions.text import transcript_cer

    rows = [
        ("exact", "hello world", "hello world"),
        ("ws", "  Hello\tworld \n", "hello world"),   # normalization free
        ("sub", "kitten", "sitting"),                 # classic distance 3
        ("cjk", "平成 data", "令和 data"),             # 2 char subs, not 6
        ("null", None, "hello world"),                # full deletion
        ("both_blank", "   ", None),                  # 0 edits, cer 0
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string,"
                                     " transcript_ref string")
    got = {r.clip_id: r for r in transcript_cer(df).collect()}
    assert (got["exact"].edit_distance, got["exact"].cer) == (0, 0.0)
    assert (got["ws"].edit_distance, got["ws"].cer) == (0, 0.0)
    assert got["sub"].edit_distance == 3
    assert got["sub"].cer == 3 / 7
    assert got["cjk"].edit_distance == 2
    assert got["null"].edit_distance == 11
    assert got["null"].cer == 1.0
    assert (got["both_blank"].n_ref_chars, got["both_blank"].cer) == (0, 0.0)
    # pure projection: no shuffle anywhere in the plan
    plan = transcript_cer(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
