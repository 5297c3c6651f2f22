"""Incremental EMBEDDING near-dup detection: match a new vector batch
against a persisted hyperplane-LSH index — the third axis of the
incremental ingest family (text shingles: dedup/incremental.py, audio
fingerprints: dedup/incremental_audio.py).

Index layout (parquet + params sidecar): band rows ``(id, band,
bucket)`` and vectors ``(id, v)``. The hyperplane family is a pure
function of (seed, dim, bands, rows_per_band) — those travel in the
sidecar, and the probe regenerates the identical planes, so a batch
banded in a later session collides exactly with the persisted rows.
Probe joins carry broadcast hints on every batch-derived side: the
corpus frames are scanned, never shuffle-joined (the plan shape of the
other two indexes, plan-asserted in tests).

The reference (volare-all/open-data-linter) has no cross-run state;
this extends the engine per the training-data-pipeline mandate."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import spread_and_pin
from open_data_linter_spark.dedup.embedding import hyperplane_band_rows
from open_data_linter_spark.functions.vectors import cosine_given_norms, norm


@dataclass(frozen=True)
class EmbeddingIndex:
    """Built index + the LSH parameters that made it (a probe MUST band
    with the identical plane family, so they travel with the data)."""

    bands_df: DataFrame  # (id, band, bucket)
    vecs_df: DataFrame  # (id, v: array<float>)
    bands: int
    rows_per_band: int
    dim: int
    seed: int


def build_embedding_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 16,
    rows_per_band: int = 2,
    dim: int = 64,
    seed: int = 42,
) -> EmbeddingIndex:
    """One pass over the corpus → band rows + vectors (both lazy; the
    banding is b·r dot products per row, embarrassingly parallel — no
    self-join, no pair expansion)."""
    base = spread_and_pin(
        "emb_index.base",
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
    )
    return EmbeddingIndex(
        hyperplane_band_rows(base, bands, rows_per_band, dim, seed),
        base,
        bands,
        rows_per_band,
        dim,
        seed,
    )


def save_embedding_index(index: EmbeddingIndex, path: str) -> None:
    """Persist as three parquet tables (bands/, vecs/, params/) — plain
    parquet for the same reason as the other two indexes: probes
    broadcast the batch side, so bucket metadata would buy nothing."""
    spark = index.bands_df.sparkSession
    par = spark.sparkContext.defaultParallelism
    index.bands_df.repartition(par, "band", "bucket").write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    index.vecs_df.repartition(par, "id").write.mode("overwrite").parquet(
        f"{path}/vecs"
    )
    spark.createDataFrame(
        [(index.bands, index.rows_per_band, index.dim, index.seed)],
        "bands int, rows_per_band int, dim int, seed int",
    ).write.mode("overwrite").parquet(f"{path}/params")


def append_to_embedding_index(
    accepted: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Fold an accepted vector batch into a persisted index (the ingest
    loop's last step: probe → filter survivors → append). The hyperplane
    family is regenerated from the index's own params sidecar, so the
    appended rows band identically to the original build — an appender
    can never mix plane families.

    Idempotent on ids: vectors whose id is ALREADY in the index are
    skipped (anti-join against the stored id column, materialized before
    the self-path append), so a crashed run replayed with the same batch
    cannot double-append rows and duplicate every future probe match."""
    spark = accepted.sparkSession
    p = spark.read.parquet(f"{path}/params").head()
    existing = spark.read.parquet(f"{path}/vecs").select("id")
    base = (
        accepted.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(existing, "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    bands = hyperplane_band_rows(
        base, int(p["bands"]), int(p["rows_per_band"]), int(p["dim"]),
        int(p["seed"]),
    )
    bands.write.mode("append").parquet(f"{path}/bands")
    base.write.mode("append").parquet(f"{path}/vecs")


def load_embedding_index(spark, path: str) -> EmbeddingIndex:
    p = spark.read.parquet(f"{path}/params").head()
    return EmbeddingIndex(
        spark.read.parquet(f"{path}/bands"),
        spark.read.parquet(f"{path}/vecs"),
        int(p["bands"]),
        int(p["rows_per_band"]),
        int(p["dim"]),
        int(p["seed"]),
    )


def match_embeddings_against_index(
    batch: DataFrame,
    index: EmbeddingIndex,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    broadcast_batch: bool = True,
) -> DataFrame:
    """(batch_id, index_id, cos_sim >= threshold) — new-vs-corpus pairs.

    Only the BATCH is banded (with planes regenerated from the index's
    own parameters); candidates come from an equi-join on (band,
    bucket), verification is exact cosine against the index vectors.
    Re-ingest of an id already in the index is not self-matched;
    batch-internal pairs are embedding_near_duplicates' job."""
    b_hint = F.broadcast if broadcast_batch else (lambda d: d)
    b_base = spread_and_pin(
        "emb_probe.base",
        batch.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
    )
    b_bands = hyperplane_band_rows(
        b_base, index.bands, index.rows_per_band, index.dim, index.seed
    ).select(F.col("id").alias("batch_id"), "band", "bucket")
    candidates = (
        index.bands_df.select(F.col("id").alias("index_id"), "band", "bucket")
        .join(b_hint(b_bands), ["band", "bucket"])
        .where(F.col("batch_id") != F.col("index_id"))
        .select("batch_id", "index_id")
        .dropDuplicates(["batch_id", "index_id"])
    )
    # batch-side norms are projected once per row (tiny, broadcast); the
    # INDEX side's norm is deliberately computed post-join, per MATCHED
    # pair — candidates << corpus here, so hoisting it into the streamed
    # corpus scan would pay one array fold per index row instead of per
    # match (2 folds per verified pair vs plain cosine's 3, never worse)
    v_b = b_base.select(
        F.col("id").alias("batch_id"), F.col("v").alias("vb"),
        norm(F.col("v")).alias("nb"),
    )
    v_i = index.vecs_df.select(F.col("id").alias("index_id"), F.col("v").alias("vi"))
    # broadcast the id-only pairs into the batch vectors, then the joined
    # candidate vectors — the corpus table streams unshuffled
    verified = v_i.join(b_hint(v_b.join(b_hint(candidates), "batch_id")),
                        "index_id")
    return (
        verified.select(
            "batch_id",
            "index_id",
            F.round(
                cosine_given_norms(
                    F.col("vb"), F.col("vi"), F.col("nb"), norm(F.col("vi"))
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .orderBy("batch_id", "index_id")
    )
