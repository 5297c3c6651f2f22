"""SimHash near-duplicate detection, DataFrame-native.

64-bit SimHash without UDFs: explode tokens → xxhash64 per token →
per-document signed bit-sums (64 ``sum(when(bit set, +1, -1))`` aggregate
expressions in ONE groupBy) → sign → packed signature. Candidate pairing by
16-bit band equality (any of 4 bands equal ⇒ hamming distance can be ≤ 3·16,
standard SimHash blocking), verified by exact hamming distance via
``bit_count(xor)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped

N_BITS = 64
N_BANDS = 4  # 16 bits per band


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — one shuffle (groupBy id over exploded tokens)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).where(F.col("tok") != "")
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(N_BITS)
    ]
    sums = exploded.groupBy("id").agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(N_BITS):
        # shiftleft, not a literal: 1 << 63 overflows a py4j long literal
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b) with hamming(simhash_a, simhash_b) <= max_hamming."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col))
    # single-file inputs: spread rows so the token explode + 64 bit-sums
    # (the map side of the groupBy) run at session parallelism, not on the
    # one scan partition (same pathology as dedup/minhash.py)
    if src.rdd.getNumPartitions() < par:
        src = persist_scoped("simhash.src", src.repartition(par))
    # the banded self-join would recompute the 64-bit-sum aggregation on
    # both sides; persist (lazy) instead of an eager checkpoint
    sigs = persist_scoped("simhash.sigs", simhash_signatures(src, text_col, id_col))
    band_width = N_BITS // N_BANDS
    mask = (1 << band_width) - 1
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
