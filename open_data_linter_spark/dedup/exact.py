"""Exact deduplication by content hash.

Hash-groupBy: md5 of normalized text → two-stage count (map-side partial
agg) → keys with count > 1. At 100 TB the shuffle carries (hash, partial
count) pairs only — never the documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import normalized_fingerprint


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """(fingerprint, dup_count, doc_ids) for every duplicated content hash."""
    fp = normalized_fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def distinct_by_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one (min-id) row per content fingerprint — the dedup writer path."""
    fp = normalized_fingerprint(F.col(text_col)).alias("__fp")
    w = df.select("*", fp)
    keep = w.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return w.join(keep, on=["__fp", id_col], how="inner").drop("__fp")
