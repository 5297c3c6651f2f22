"""Corpus-level repeated-line removal (dedup/lines.py)."""

import pytest

from open_data_linter_spark.dedup.lines import (
    boilerplate_lines,
    remove_boilerplate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


FOOTER = "all rights reserved"


def test_frequency_table_counts_distinct_docs(spark):
    docs = _docs(spark, [
        (0, f"intro\n{FOOTER}\n{FOOTER}"),      # footer twice in one doc
        (1, f"body text\n  {FOOTER}  "),        # indented variant
        (2, "unique content only"),
    ])
    rows = {r["line"]: r for r in boilerplate_lines(docs).collect()}
    assert set(rows) == {FOOTER}
    assert rows[FOOTER]["n_docs"] == 2          # distinct docs, not occurrences
    assert rows[FOOTER]["n_occurrences"] == 3


def test_removal_preserves_order_and_blank_lines(spark):
    docs = _docs(spark, [
        (0, f"first\n{FOOTER}\n\nlast"),
        (1, f"{FOOTER}\nonly mine"),
    ])
    got = {r["doc_id"]: r for r in remove_boilerplate_lines(docs).collect()}
    assert got[0]["text_clean"] == "first\n\nlast"   # blank line survives
    assert got[1]["text_clean"] == "only mine"
    assert (got[0]["n_lines"], got[0]["n_removed"]) == (4, 1)
    assert (got[1]["n_lines"], got[1]["n_removed"]) == (2, 1)


def test_blank_lines_never_count_as_boilerplate(spark):
    docs = _docs(spark, [(0, "a\n\nb"), (1, "c\n\nd"), (2, "e\n\nf")])
    assert boilerplate_lines(docs).count() == 0
    got = {r["doc_id"]: r["text_clean"] for r in
           remove_boilerplate_lines(docs).collect()}
    assert got == {0: "a\n\nb", 1: "c\n\nd", 2: "e\n\nf"}


def test_doc_losing_everything_and_null_text(spark):
    docs = _docs(spark, [(0, FOOTER), (1, FOOTER), (2, None)])
    got = {r["doc_id"]: r for r in remove_boilerplate_lines(docs).collect()}
    assert set(got) == {0, 1, 2}                     # row-preserving
    assert got[0]["text_clean"] == "" and got[0]["n_removed"] == 1
    # NULL text behaves as one blank line: kept, nothing removed
    assert (got[2]["n_lines"], got[2]["n_removed"], got[2]["text_clean"]) \
        == (1, 0, "")


def test_tab_indent_stays_distinct_space_indent_folds(spark):
    docs = _docs(spark, [(0, "  x"), (1, "x"), (2, "\tx")])
    rows = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs).collect()}
    assert rows == {"x": 2}                          # tab variant uncounted


def test_crlf_folds_with_lf_and_output_is_lf_normalized(spark):
    docs = _docs(spark, [
        (0, f"keep a\r\n{FOOTER}\r\nkeep b"),   # Windows line endings
        (1, f"{FOOTER}\nmine"),
    ])
    rows = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs).collect()}
    assert rows.get(FOOTER) == 2                 # \r never leaks into keys
    got = {r["doc_id"]: r for r in remove_boilerplate_lines(docs).collect()}
    assert got[0]["text_clean"] == "keep a\nkeep b"  # LF-normalized output
    assert (got[0]["n_lines"], got[0]["n_removed"]) == (3, 1)


def test_min_docs_threshold_and_validation(spark):
    docs = _docs(spark, [(0, "x\ny"), (1, "x"), (2, "x")])
    assert boilerplate_lines(docs, min_docs=3).count() == 1
    assert boilerplate_lines(docs, min_docs=4).count() == 0
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_lines(docs, min_docs=0)
