"""Deterministic sharded export: the training-data packaging sink.

A curated corpus leaves the pipeline as N fixed-count shards plus a
manifest — the webdataset/tfrecord packaging step every large-scale
training run consumes (loaders shard-shuffle by file, resume by shard,
and verify integrity against the manifest). This module is that sink
with every moving part deterministic and independently recomputable:

- ``shard_assignments``: shard = (60-bit md5 prefix of the id string,
  salted) mod ``n_shards``. md5 → ``conv(hex, 16, 10)`` is exactly
  replayable in DuckDB (``CAST('0x…' AS BIGINT)``), unlike xxhash64 —
  the driver oracle retraces every placement. Hashing the ID (not the
  content) keeps placement stable under text-transform re-runs, and
  decorrelates shard size from ingestion order (sequential-id ranges
  spread uniformly; 15 hex digits = 60 bits, never negative, so
  ``%`` == pmod cross-engine).
- ``shard_manifest``: one row per shard — doc count, token count
  (package tokenize contract), char count, and an ORDER-INDEPENDENT
  content fingerprint: ``bit_xor`` over each doc's 60-bit md5-prefix
  of (id ':' text). xor commutes, so the manifest is invariant to
  partitioning/task order, and any dropped, duplicated, or mutated doc
  flips it. Shards with no docs are emitted as zero rows (count 0,
  fingerprint 0) so the manifest ALWAYS has exactly ``n_shards`` rows —
  a loader can fail fast on a missing shard instead of discovering it
  mid-epoch.
- ``export_shards``: ``repartition(n_shards, shard)`` BEFORE
  ``partitionBy`` (the bucketed.py lesson: without it every input
  partition writes its own file per shard — P×S tiny files), so each
  shard directory holds exactly ONE file; the manifest is written
  beside the data and returned.

Plan shape at 100 TB: assignment is a pure projection (no shuffle);
the export is exactly one hash shuffle on the shard id; the manifest
is one partial-aggregated groupBy over 64-bit values (map-side
combine, shuffle carries n_shards rows per task). ``n_shards`` is the
parallelism knob — one file per shard means shard count should be
sized to the corpus (e.g. ~1-4 GB per shard), not to the cluster.

The reference (volare-all/open-data-linter) validates files in place
and has no export stage; this extends the engine per the
training-data-pipeline mandate. Closest seed: its result-sink contract
(csv_linter.py result dict → one artifact per input file).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import ws_tokens


def _hex60(c: Column) -> Column:
    """First 15 hex digits of md5(c) as a non-negative bigint (60 bits —
    fits int64 with headroom; DuckDB replays via CAST('0x…' AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """``df`` + an int ``shard`` column in [0, n_shards). Deterministic in
    (id, salt) only — re-running, re-partitioning, or rewriting text never
    moves a doc. ``salt`` derives independent placements (e.g. epochs)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _hex60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    assigned: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest over a frame carrying ``shard``: exactly
    ``n_shards`` rows of ``(shard, n_docs, n_tokens, n_chars,
    fingerprint)``. The fingerprint is xor-folded, so it is independent
    of row order and partitioning; empty shards carry (0, 0, 0, 0)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    doc_h = _hex60(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), text)
    )
    spark = assigned.sparkSession
    skeleton = spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    agg = (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(ws_tokens(F.col(text_col)))).alias("n_tokens"),
            F.sum(F.length(text)).alias("n_chars"),
            F.bit_xor(doc_h).alias("fingerprint"),
        )
    )
    return (
        skeleton.join(agg, "shard", "left")
        .select(
            "shard",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("fingerprint", F.lit(0)).cast("long").alias("fingerprint"),
        )
        .orderBy("shard")
    )


def shard_manifest_binary(
    assigned: DataFrame,
    n_shards: int,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Audio-axis manifest over a frame carrying ``shard``: exactly
    ``n_shards`` rows of ``(shard, n_clips, n_bytes, total_dur_ms,
    fingerprint)``. The per-clip hash folds md5 of the PAYLOAD BYTES
    (`md5(id ':' md5(bytes))` — the inner md5 makes it replayable from a
    committed hex digest without shipping bytes to the oracle), xor-folded
    so the manifest is partition-order independent. NULL payloads hash as
    the empty digest string and count 0 bytes."""
    doc_h = _hex60(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.coalesce(F.md5(F.col(bytes_col)), F.lit("")),
        )
    )
    spark = assigned.sparkSession
    skeleton = spark.range(n_shards).select(
        F.col("id").cast("int").alias("shard")
    )
    agg = assigned.groupBy("shard").agg(
        F.count("*").alias("n_clips"),
        F.sum(F.coalesce(F.length(F.col(bytes_col)), F.lit(0))).alias(
            "n_bytes"
        ),
        F.sum(F.col(dur_col)).alias("total_dur_ms"),
        F.bit_xor(doc_h).alias("fingerprint"),
    )
    return (
        skeleton.join(agg, "shard", "left")
        .select(
            "shard",
            F.coalesce("n_clips", F.lit(0)).cast("long").alias("n_clips"),
            F.coalesce("n_bytes", F.lit(0)).cast("long").alias("n_bytes"),
            F.coalesce("total_dur_ms", F.lit(0))
            .cast("long")
            .alias("total_dur_ms"),
            F.coalesce("fingerprint", F.lit(0))
            .cast("long")
            .alias("fingerprint"),
        )
        .orderBy("shard")
    )


def export_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Write ``df`` as ``out_path/data/shard=K/`` (ONE parquet file per
    shard) plus ``out_path/manifest/`` and return the manifest frame.

    The repartition keys on the shard VALUE, so every row of a shard
    colocates in one task and ``partitionBy`` emits one file per shard
    (two shards may share a task; each still gets its own single file).
    """
    assigned = shard_assignments(df, n_shards, id_col, salt)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_path, "data"))
    )
    manifest = shard_manifest(assigned, n_shards, id_col, text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_path, "manifest")
    )
    return manifest


def verify_shards(spark: SparkSession, out_path: str,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Integrity check a written export: recompute the manifest from the
    data files and diff it against the stored manifest. Returns the
    mismatching shards (empty = intact) — run it after any copy/restore."""
    stored = spark.read.parquet(os.path.join(out_path, "manifest"))
    n_shards = stored.count()
    data = spark.read.parquet(os.path.join(out_path, "data"))
    actual = shard_manifest(data, n_shards, id_col, text_col)
    cols = ["n_docs", "n_tokens", "n_chars", "fingerprint"]
    j = stored.alias("m").join(actual.alias("a"), "shard", "full")
    mismatch = None
    for c in cols:
        ne = ~F.col(f"m.{c}").eqNullSafe(F.col(f"a.{c}"))
        mismatch = ne if mismatch is None else (mismatch | ne)
    return j.where(mismatch).select(
        "shard",
        *[F.col(f"m.{c}").alias(f"manifest_{c}") for c in cols],
        *[F.col(f"a.{c}").alias(f"actual_{c}") for c in cols],
    )
