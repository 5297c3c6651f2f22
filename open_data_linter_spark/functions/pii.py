"""PII detection and redaction — curation-pipeline privacy screening.

Training-data pipelines screen and redact personally identifiable
information before corpora leave the ingestion tier (the C4 / Dolma /
FineWeb pipelines all carry a regex PII pass; see Soldaini et al., "Dolma"
arXiv 2402.00159 §2). This module provides the Spark-native pass: per-doc
match counts for a fixed taxonomy plus an in-place redaction transform,
both pure Catalyst ``regexp_count`` / ``regexp_replace`` projections —
shuffle-free, whole-stage-codegen'd, embarrassingly parallel at 100 TB.

Pattern-language contract: every pattern is written in the common subset of
Java regex (Spark executors) and RE2 (DuckDB oracle) — ASCII character
classes, bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences, no Unicode classes. Counting is non-overlapping
left-to-right in both engines, so the driver oracle is a FULL exact twin.

Redaction applies patterns in the fixed ``PII_PATTERNS`` order (email,
phone, card, ipv4); replacement tokens contain no digits, so earlier
replacements cannot create later matches.

The reference (volare-all/open-data-linter) has no PII checks; this
extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token). Order is the redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_counts(c: Column) -> list[Column]:
    """Per-category non-overlapping match counts, as aliased int columns
    ``n_<name>`` in ``PII_PATTERNS`` order. NULL text counts as 0."""
    s = F.coalesce(c, F.lit(""))
    return [
        F.regexp_count(s, F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_pii(c: Column) -> Column:
    """Replace every match of every category with its token, in
    ``PII_PATTERNS`` order. NULL propagates (no text, nothing to redact)."""
    out = c
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_screen(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document screening report: category counts, an any-PII flag,
    and the post-redaction character count (which pins the redaction
    transform itself, not just detection). One row per input row."""
    c = F.col(text_col)
    counts = pii_counts(c)
    total = None
    for col in counts:
        total = col if total is None else total + col
    # spread + pin: regexp_count x4 + redaction on a single-file scan
    # would serialize on the one scan partition (dedup/_cache notes)
    from open_data_linter_spark.dedup._cache import spread_and_pin

    df = spread_and_pin(f"pii:{id_col}", df.select(id_col, text_col))
    return df.select(
        F.col(id_col),
        *counts,
        (total > 0).alias("has_pii"),
        F.length(redact_pii(F.coalesce(c, F.lit("")))).cast("int").alias(
            "redacted_n_chars"
        ),
    ).orderBy(id_col)
