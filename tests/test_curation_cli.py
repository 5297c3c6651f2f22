"""End-to-end curation pipeline CLI: funnel shape + determinism."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir):
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out_dir),
            "--master", "local[4]",
            "--mixture-total", "30",
            "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--semantic-threshold", "0.45",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out_dir, "report.json")) as f:
        return json.load(f)


def test_curation_pipeline_end_to_end(tmp_path):
    rep = _run(tmp_path / "run1")
    stages = {s["stage"]: s["rows"] for s in rep["stages"]}
    # the funnel only ever narrows
    order = ["input", "exact_dedup", "neardup_dedup", "semantic_dedup",
             "decontaminate", "span_trim", "quality_filter",
             "repetition_gates", "pii_redact", "mixture_sample"]
    for a, b in zip(order, order[1:]):
        assert stages[b] <= stages[a], (a, b, stages)
    assert stages["mixture_sample"] > 0
    # packing assigns every surviving row a bin within budget
    assert stages["packed_written"] == stages["mixture_sample"]
    # every multi-doc bin respects the token budget (single oversized docs
    # legitimately get a bin of their own — next-fit semantics)
    over = duckdb.sql(
        f"SELECT count(*) FROM (SELECT bin_id, sum(n_tokens) AS s, count(*) c "
        f"FROM read_parquet('{tmp_path}/run1/curated/*.parquet') "
        f"GROUP BY bin_id) WHERE c > 1 AND s > 2048"
    ).fetchone()[0]
    assert over == 0
    # deterministic replay: same input -> byte-identical survivor set
    _run(tmp_path / "run2")
    ids1 = duckdb.sql(
        f"SELECT doc_id, bin_id FROM read_parquet('{tmp_path}/run1/curated/*.parquet') ORDER BY doc_id"
    ).fetchall()
    ids2 = duckdb.sql(
        f"SELECT doc_id, bin_id FROM read_parquet('{tmp_path}/run2/curated/*.parquet') ORDER BY doc_id"
    ).fetchall()
    assert ids1 == ids2


def test_curation_span_removal_stage(tmp_path):
    """--remove-dup-spans is a transform stage: row count preserved, stage
    reported between span_trim and quality_filter, and at least one
    surviving doc's text actually shrank (the sf0.001 corpus carries real
    cross-doc duplicated 8-gram spans)."""
    out = tmp_path / "run_spanrm"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--master", "local[4]",
            "--mixture-total", "30",
            # the default funnel consumes every span-sharing pair before
            # the removal stage (minhash@0.7 drops one side of each pair;
            # span_trim@0.95 drops near-total-coverage docs) — loosen both
            # so real cross-doc duplicated 8-grams reach the stage
            "--minhash-threshold", "0.99",
            "--max-span-coverage", "1.0",
            "--remove-dup-spans",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    names = [s["stage"] for s in rep["stages"]]
    i = names.index("span_removal")
    assert names[i - 1] == "span_trim" and names[i + 1] == "quality_filter"
    rows = {s["stage"]: s["rows"] for s in rep["stages"]}
    assert rows["span_removal"] == rows["span_trim"]  # transform, not filter
    # the sf0.001 corpus carries real cross-doc duplicated spans and the
    # upstream dedup stages don't consume them all — the stage must have
    # actually cut text somewhere (report counts pre-sample)
    assert rep["docs_cleaned"] >= 1, rep


def test_curation_normalize_and_line_dedup_stages(tmp_path):
    """--normalize and --remove-dup-lines are transform stages: both
    preserve row counts, sit at their documented funnel positions, and
    the boilerplate footer injected into every doc is actually gone from
    the curated output."""
    src = tmp_path / "docs_with_footer.parquet"
    # every doc gains the same footer line (with a double space the
    # normalize stage must collapse before the line keys can fold)
    duckdb.sql(
        f"""COPY (
              SELECT doc_id,
                     text || chr(10) || 'shared  footer line' AS text,
                     lang, source, n_chars
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
            ) TO '{src}' (FORMAT PARQUET)"""
    )
    out = tmp_path / "run_lines"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--docs", str(src),
            "--out", str(out),
            "--master", "local[4]",
            "--mixture-total", "30",
            "--normalize",
            "--remove-dup-lines",
            "--line-min-docs", "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    names = [s["stage"] for s in rep["stages"]]
    rows = {s["stage"]: s["rows"] for s in rep["stages"]}
    assert names.index("normalize") == names.index("input") + 1
    assert names.index("line_dedup") == names.index("exact_dedup") + 1
    assert rows["normalize"] == rows["input"]          # transform
    assert rows["line_dedup"] == rows["exact_dedup"]   # transform
    assert rep["docs_line_trimmed"] == rows["exact_dedup"]  # footer in all
    leaked = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{out}/curated/*.parquet')
            WHERE contains(text, 'footer')"""
    ).fetchone()[0]
    assert leaked == 0


def test_curation_index_probe_and_grow(spark, tmp_path):
    """--probe-index drops every doc that near-dups the prior corpus
    (here: verbatim re-idd copies of docs 0..19), --grow-index appends
    the curated survivors to the index afterwards."""
    from pyspark.sql import functions as F

    from open_data_linter_spark.dedup.incremental import (
        build_minhash_index,
        save_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prior = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx_path = tmp_path / "prior_idx"
    save_index(build_minhash_index(prior), str(idx_path))
    hashed_before = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{idx_path}/hashed/*.parquet')"
    ).fetchone()[0]

    out = tmp_path / "run_probe"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--master", "local[4]",
            "--mixture-total", "30",
            "--probe-index", str(idx_path),
            "--grow-index",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    stages = {s["stage"]: s["rows"] for s in rep["stages"]}
    assert "index_probe" in stages
    assert stages["index_probe"] < stages["exact_dedup"]
    # every copied doc's original is an exact dup of the prior corpus
    leaked = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/curated/*.parquet') "
        f"WHERE doc_id < 20"
    ).fetchone()[0]
    assert leaked == 0
    # survivors joined the index
    assert rep.get("index_grown") is True
    hashed_after = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{idx_path}/hashed/*.parquet')"
    ).fetchone()[0]
    curated_rows = stages["packed_written"]
    assert hashed_before < hashed_after <= hashed_before + curated_rows
