"""PII detection/redaction: Python-re parity on the common subset, edges."""

import re

import pytest

from open_data_linter_spark.functions.pii import (
    PII_PATTERNS,
    pii_screen,
    redact_pii,
)

CASES = [
    (0, "reach me at jane.doe+spam@sub.example.co.uk thanks"),
    (1, "server 192.168.0.1 and 10.0.0.255 up"),
    (2, "call +1-555-123-4567 or +44-201-555-0199"),
    (3, "card 4111-1111-1111-1111 exp 12/26"),
    (4, "card 4111 1111 1111 1111 spaced"),
    (5, "no pii here just words"),
    (6, "a@b.co tiny email and trailing ip 1.2.3.4"),
    (7, "not-an-ip 1234.5.6.7 overlong first octet"),
    (8, "two mails x@y.io z@w.ai and ip 8.8.8.8"),
    (9, ""),
    (10, None),
    (11, "email inside ip? 1.2.3.4@example.com weird"),
]


def _py_counts(text):
    s = text or ""
    return {
        f"n_{name}": len(re.findall(pat, s)) for name, pat, _ in PII_PATTERNS
    }


def _py_redact(text):
    if text is None:
        return None
    out = text
    for _, pat, token in PII_PATTERNS:
        out = re.sub(pat, token, out)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


def test_counts_match_python_re(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in pii_screen(docs).collect()}
    for doc_id, text in CASES:
        want = _py_counts(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id], want)
        assert got[doc_id]["has_pii"] == (sum(want.values()) > 0)
        assert got[doc_id]["redacted_n_chars"] == len(_py_redact(text or ""))


def test_redaction_text(spark, docs):
    from pyspark.sql import functions as F

    rows = {
        r["doc_id"]: r["red"]
        for r in docs.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    for doc_id, text in CASES:
        assert rows[doc_id] == _py_redact(text), (doc_id, rows[doc_id])
    assert rows[0] == "reach me at <EMAIL> thanks"
    assert rows[3] == "card <CARD> exp 12/26"
    assert rows[10] is None


def test_overlong_octet_not_ip(spark):
    # 1234.5.6.7: \b[0-9]{1,3} can still anchor inside the digit run?
    # No — \b before [0-9]{1,3} must sit at a word boundary; inside
    # "1234" there is none, and backtracking from the boundary at '1'
    # cannot satisfy \. after 3 digits. Pin it.
    assert _py_counts("x 1234.5.6.7 y")["n_ipv4"] == 0


def test_duckdb_twin_semantics():
    """The oracle counts with RE2 — spot-check the pattern subset agrees
    with Python re (which itself is pinned to Spark's Java output above)."""
    import duckdb

    con = duckdb.connect()
    for _, text in CASES:
        if text is None:
            continue
        for name, pat, _tok in PII_PATTERNS:
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()[0]
            assert n == _py_counts(text)[f"n_{name}"], (name, text)
