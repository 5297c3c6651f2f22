"""Context-window chunking (functions/chunking.py)."""

import pytest

from open_data_linter_spark.functions.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_disjoint_windows_cover_everything(spark):
    docs = _docs(spark, [(0, _toks(10))])
    out = sorted(
        chunk_documents(docs, chunk_tokens=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_id"], r["start_token"], r["n_chunk_tokens"]) for r in out] \
        == [(0, 0, 4), (1, 4, 4), (2, 8, 2)]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[2]["chunk_text"] == "t8 t9"  # short tail, never empty
    # reassembly exactness: disjoint chunks concatenate to the tokens
    assert " ".join(r["chunk_text"] for r in out) == _toks(10)


def test_overlapping_stride(spark):
    docs = _docs(spark, [(0, _toks(10))])
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_id"], r["start_token"]) for r in out] \
        == [(0, 0), (1, 3), (2, 6), (3, 9)]
    # consecutive chunks overlap by chunk - stride = 1 token
    assert out[0]["chunk_text"].split()[-1] == out[1]["chunk_text"].split()[0]


def test_short_and_empty_docs(spark):
    docs = _docs(spark, [(0, "only three tokens"), (1, ""), (2, None),
                         (3, "   ")])
    out = chunk_documents(docs, chunk_tokens=512).collect()
    assert [(r["doc_id"], r["chunk_id"], r["n_chunk_tokens"]) for r in out] \
        == [(0, 0, 3)]  # one whole-doc chunk; empties emit nothing


def test_validation(spark):
    docs = _docs(spark, [(0, "x")])
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=0)


def test_no_shuffle_in_plan(spark):
    docs = _docs(spark, [(0, _toks(20))])
    out = chunk_documents(docs, chunk_tokens=4, stride=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure row expander, composes for free
