"""SimHash near-duplicate detection, DataFrame-native.

64-bit SimHash, shuffle-free signatures: per document, hash every token
JVM-side (``transform`` + ``xxhash64`` — the hash family is Catalyst, so
signatures are bit-identical to the former pure-SQL path), then compute
the 64 majority bits in ONE Arrow-vectorized pandas UDF. Candidate
pairing by 16-bit band equality (any of 4 bands equal ⇒ standard SimHash
blocking) via ONE groupBy-collect bucket expansion, verified by exact
hamming distance via ``bit_count(xor)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import ws_tokens

N_BITS = 64
N_BANDS = 4  # 16 bits per band


def _majority_bits_impl(hs_s: pd.Series) -> pd.Series:
    """Packed 64-bit majority signature of an array<long> hash column.

    Per doc: bit b of the signature is set iff more than half the token
    hashes have bit b set (2·count > n — ties clear, matching the former
    ``sum(±1) > 0`` aggregate bit-for-bit)."""
    out = np.empty(len(hs_s), dtype=np.int64)
    shifts = np.arange(N_BITS, dtype=np.uint64)
    for i, arr in enumerate(hs_s):
        a = np.asarray(arr, dtype=np.int64).view(np.uint64)
        n = len(a)
        if n == 0:
            out[i] = 0
            continue
        counts = ((a[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
        out[i] = (
            ((counts * 2 > n).astype(np.uint64) << shifts)
            .sum(dtype=np.uint64)
            .astype(np.uint64)
            .view(np.int64)
        )
    return pd.Series(out)


def _majority_bits(col):
    # built per call, not cached: pandas_udf needs an active SparkSession
    # (module import must stay session-free), and a cached UserDefinedFunction
    # pins its lazily-created _judf to the FIRST session's JVM context —
    # stale after a session restart in a long-lived host process. The
    # per-call wrapper itself is cheap; only its first column application
    # touches the JVM.
    return F.pandas_udf(_majority_bits_impl, "long")(col)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — a PURE PROJECTION, no shuffle: token hashing stays
    JVM-side (xxhash64 inside a transform), the 64 majority counts run
    Arrow-vectorized in numpy.

    This replaced an explode + groupBy(id) carrying 64 ``sum(when(...))``
    aggregates (round 4). Measured at sf0.1 / local[32], per fresh call:
    the aggregate shape spent ~1.7s just BUILDING the 64-wide plan over
    py4j plus ~2.0s executing; this shape builds in ~0.25s and executes in
    ~1.6s — and at cluster scale it eliminates the signature exchange
    entirely (the old plan shuffled one partial-agg row of 65 longs per
    document). Outputs are bit-identical (same hash family, same majority
    rule; parity pinned by the driver's semantic oracle and the golden
    tests)."""
    toks = ws_tokens(F.col(text_col))
    hs = F.transform(toks, lambda t: F.xxhash64(t))
    return (
        df.select(F.col(id_col).alias("id"), hs.alias("hs"))
        # empty/whitespace-only docs were absent from the former
        # explode+groupBy output; keep that contract
        .where(F.size("hs") > 0)
        .select("id", _majority_bits(F.col("hs")).alias("simhash"))
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate pairing is a banded self-join on (band, band-bits) with the
    exact hamming verification inlined in the join condition, so raw
    candidates are enumerated in codegen and never materialized or
    shuffled (see the inline note). ``max_bucket_size`` optionally drops
    pathological buckets (m members => m² candidates) before the join;
    the default keeps every candidate, matching the exhaustive-blocking
    semantics of 16-bit bands.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col))
    # single-file inputs: spread rows so tokenize+hash+UDF run at session
    # parallelism, not on the one scan partition. No persist pin is needed
    # here (unlike dedup/minhash.py): the Arrow-UDF signature projection is
    # an ArrowEvalPython node that Catalyst does NOT collapse below the
    # round-robin exchange, and sigs has exactly one consumer (the bucket
    # rows carry the signature, so nothing re-reads it). Measured warm at
    # sf0.1/local[32]: ~1.7-2.0s without the persist vs ~2.0-2.5s with it.
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    sigs = simhash_signatures(src, text_col, id_col)
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
    if max_bucket_size is not None:
        counts = banded.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("__m")
        )
        banded = (
            banded.join(counts, ["band", "bh"])
            .where(F.col("__m") <= max_bucket_size)
            .drop("__m")
        )
    # Round 6 (optimization): in-bucket pairs come from a banded
    # self-join with the hamming test INSIDE the join condition, not from
    # a collect_list + array-comprehension expansion. On a corpus with
    # hot buckets (sf1.0: 18k buckets, the largest 1,740 members) the
    # comprehension materialized 23.6M candidate structs through
    # interpreted HOF lambdas — single giant in-memory arrays on the hot
    # buckets — and shuffled ALL of them through dropDuplicates before
    # the hamming filter ran. The join enumerates the same pairs in
    # whole-stage codegen, filters them on the spot (filter-then-dedup ==
    # dedup-then-filter: hamming is a function of the row), and only the
    # ~0.2% survivors reach the dedup exchange. The band rows are narrow
    # (id, simhash, band, bh), so the planner broadcasts one side while
    # the frame fits (no exchange at all — the sf1.0 plan); past the
    # broadcast threshold both sides shuffle the identical frame and
    # Spark reuses one exchange. l.id < r.id keeps the (id_a < id_b)
    # contract and excludes self-pairs.
    l, r = banded.alias("l"), banded.alias("r")
    hamming = F.bit_count(
        F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    )
    return (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l.id") < F.col("r.id"),
                hamming <= F.lit(max_hamming),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )
