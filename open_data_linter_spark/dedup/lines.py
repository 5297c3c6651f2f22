"""Corpus-level repeated-line removal (C4 / MassiveText boilerplate pass).

Web-scale corpora carry boilerplate lines (nav bars, cookie banners,
license footers) repeated across thousands of documents. C4 (Raffel et
al., arXiv 1910.10683 §2.2) and MassiveText (Rae et al., arXiv
2112.11446 A.1.2) both drop lines that recur across the corpus; this
module is that pass as two operators:

- ``boilerplate_lines``: the corpus-wide line frequency table — each
  distinct trimmed line with its document frequency, filtered to lines
  seen in ``>= min_docs`` distinct documents.
- ``remove_boilerplate_lines``: row-preserving — every doc comes back
  with those lines deleted (original order preserved, blank lines kept:
  they are structure, not boilerplate, and counting them would make the
  empty string the corpus's hottest "line").

Line key = ``trim(line)`` — ASCII-space trim on BOTH engines (Spark
``F.trim`` and DuckDB ``trim`` are space-only), so leading/trailing
indentation variants of the same boilerplate collapse but tab-indented
variants stay distinct (cheap, deterministic; full whitespace folding
would need the regex path).

Plan shape at 100 TB:
- ONE corpus shuffle builds the frequency table (groupBy trimmed line
  with partial map-side aggregation; count(DISTINCT doc) is the standard
  two-phase distinct aggregate).
- Removal is a LEFT ANTI join of the exploded lines against the
  boilerplate keys — an equi-join Catalyst can broadcast when the hot
  set is small (it usually is: lines above a df threshold follow a
  zipf head) — then one groupBy(doc) to reassemble. The hottest lines
  are by construction the most frequent join keys; AQE skew handling
  applies, and the anti-join probe side never amplifies rows.

The reference (volare-all/open-data-linter) has no cross-document line
ops; this extends the engine per the training-data-pipeline mandate
(dedup/spans.py covers sub-line token n-grams; this covers whole-line
boilerplate, which span coverage under-weights for short hot lines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_LINE_SEP = "\r?\n"  # CRLF folds with LF: a Windows-newline corpus must
# not hide boilerplate behind a trailing \r in the key (space-only trim
# would keep it). Reassembly joins with \n, so output line endings are
# LF-normalized — the standard curation contract. Lone \r (classic Mac)
# is not a separator.


def _lines(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line, key): one row per physical line, 0-based pos.

    NULL text behaves as '' (one empty line), mirroring split semantics
    in the oracle; key is the space-trimmed line."""
    return docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _LINE_SEP)
        ).alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))


def _hot(lines: DataFrame, min_docs: int) -> DataFrame:
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    return (
        lines.where(F.col("key") != "")
        .groupBy(F.col("key").alias("line"))
        .agg(
            F.count_distinct("__id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Distinct trimmed lines with document frequency >= min_docs.

    Returns (line, n_docs, n_occurrences); blank (trim-empty) lines are
    never counted. ``n_docs`` is the number of DISTINCT docs containing
    the line; ``n_occurrences`` counts every physical occurrence."""
    return _hot(_lines(docs, text_col, id_col), min_docs)


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Row-preserving: (id_col, n_lines, n_removed, text_clean).

    Every input doc comes back; lines whose trimmed form is boilerplate
    (>= min_docs distinct docs) are deleted, survivors rejoin with
    ``\\n`` in original order. A doc losing every line yields
    ``text_clean = ''`` (kept — downstream length filters decide)."""
    # spread + pin the exploded line frame ONCE: a single-file scan is
    # one partition (the split+posexplode would serialize on one core),
    # and the frame feeds three consumers (frequency table, anti-join
    # probe, per-doc line counts) — without the pin the corpus is
    # re-split per consumer (dedup/_cache notes)
    from open_data_linter_spark.dedup._cache import spread_and_pin

    lines = spread_and_pin(
        f"lines:{id_col}", _lines(docs, text_col, id_col)
    )
    hot = _hot(lines, min_docs).select(F.col("line").alias("__hot"))
    kept = lines.join(hot, lines["key"] == hot["__hot"], "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
    )
    # every doc yields >= 1 line (NULL text splits to ['']), so the line
    # counts are themselves the row-preserving base — no third doc scan
    base = lines.groupBy("__id").agg(F.count("*").alias("n_lines"))
    return base.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )
