"""n-gram Jaccard similarity pairs by inverted-index join (no MinHash).

Exact Jaccard over word k-gram shingles: explode shingles → self-join on
shingle (the inverted index) → per-pair intersection counts → Jaccard via
|A∩B| / (|A|+|B|-|A∩B|). SQL-expressible end-to-end (DuckDB oracle in the
driver harness).

Scale: exact pairwise Jaccard is quadratic in the worst case; this shape is
for candidate sets that share rare shingles. At 100 TB you'd pre-filter by
document-frequency (drop shingles with df > threshold — stop-shingles) —
exposed via ``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped, spread_and_pin
from open_data_linter_spark.functions.text import shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    # boundary discipline (measured 20s -> ~2s at sf0.1): see spread_and_pin
    src = spread_and_pin(
        "jaccard.src",
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    base = persist_scoped("jaccard.base", src.select(
        "id", shingles(F.col("__t"), k).alias("sh")
    ).where(F.size("sh") > 0))  # reused by sizes + inverted index
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    inv = base.select("id", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        df_counts = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        inv = inv.join(
            df_counts.where(F.col("df") <= max_shingle_df).select("shingle"),
            on="shingle",
            how="inner",
        )
    # both self-join sides read this; persist instead of an eager
    # checkpoint (lazy, no extra materialization job)
    inv = persist_scoped("jaccard.inv", inv)
    l, r = inv.alias("l"), inv.alias("r")
    inter = (
        l.join(r, on=[F.col("l.shingle") == F.col("r.shingle"),
                      F.col("l.id") < F.col("r.id")])
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
