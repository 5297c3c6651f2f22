"""Benchmark harness: headline queries + validation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "clips_per_sec": ...}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local core count (default 32)
  SPARK_GRAFT_BENCH_CLIPS  synthetic audio rows for the validation run
                           (default 20000)

The validation phase synthesizes the audio table ONCE to parquet (not
timed), then times a full ValidationRun (all rule families incl. the Arrow
decode pass) reading it back — that is the north-rule metric
(validation clips/sec).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_data_linter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default 16, not 32: this host penalizes sustained >16-thread JVMs
# (BENCH/BASELINE.md appendix); honored verbatim when the env var is set
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))

HEADLINE = [
    "pricing_summary",
    "column_stats_lineitem",
    "dup_custkeys_orders",
    "ri_orders_customer",
    "histogram_extendedprice",
    "windowed_drift_events",
    "token_counts",
    "fingerprints",
    "minhash_neardups",
    "ngram_jaccard",      # round 3: was 20s at sf0.1, unbenched — now 1.5s
    "simhash_neardups",   # round 3: added for dedup-family coverage
    "knn_bruteforce",
    "apss_jaccard_agg",      # round 4: exact all-pairs via prefix filter
                             # (binned counts: raw pairs are ~1M rows at
                             # sf0.1 and collect() would time py4j, not
                             # the engine)
    "duplicate_spans",       # round 4: repeated 8-gram coverage per doc
    "span_removal",          # round 4: keep-first duplicate-span removal
    "dedup_clusters",       # round 4: iterative CC over the jaccard pairs
    "contamination_screen",  # round 4: broadcast eval inverted index
    "sequence_packing",      # round 4: per-range next-fit binning
    "stratified_sample_lang",  # round 4: exact per-group sampling
    "repetition_stats",  # round 4: intra-doc Gopher gates (shuffle-free)
    "pii_screen",        # round 4: regex PII pass (pure projection)
    "vocab_topk",        # round 4: corpus token head (1 shuffle + top-k)
    "semdedup",          # round 4: k-means cells + in-cell greedy dedup
    "bm25",              # round 4: term-filtered postings + window top-k
    "lm_perplexity",     # round 4: corpus bigram LM train + score joins
    "ppl_quality_buckets",  # round 4: CCNet head/middle/tail over the LM
    "dsir_select",       # round 4: target/raw n-gram log-ratio top-k
    "line_dedup",        # round 4: corpus repeated-line removal
    "normalize_text",    # round 4: NFC Arrow pass + codegen hygiene
    "corpus_divergence",  # round 4: per-lang KL/JS, two count shuffles
    "knn_ivf_pq",        # round 4: residual-PQ probe join + ADC scoring
    "incremental_index_match",  # round 4: batch-vs-index probe (no self-join)
    "blocklist_screen",  # round 4: C4 badlist gate (pure projection)
    "quality_model_scores",  # round 4: NB log-odds train + broadcast score
    "shard_manifest",    # round 4: packaging sink's manifest aggregation
    "constraint_suite",  # round 4: declarative expectations, one scan
    "snapshot_diff",     # round 4: table-version schema/stats drift
    "reconcile_orders",  # round 4: hash-reduced row-level version diff
    "suggest_constraints",  # round 4: expectation-profiler bootstrap
    "audio_constraint_suite",  # round 4: axis-B declarative suite
    "fd_check",             # round 5: FD conformance, 1 shuffle per FD
    "freshness_events",     # round 5: per-group staleness vs frontier
    "volume_anomaly_events",  # round 5: daily-count modified-z outliers
    "column_metrics_orders",  # round 5: 5-column melt, ONE shuffle
    "benford_totalprice",   # round 5: baseline-free digit-law screen
    "table_health_events",  # round 5: composed health facade, 6 families
    "sequence_gaps_lineitem",  # round 5: ~14k natural per-order holes
    "calendar_gaps_events",  # round 5: absent-bucket broadcast anti-join
    "pattern_masks_events",  # round 5: run-collapsed mask profile
    "monotone_events",       # round 5: per-group order conformance
    "correlation_lineitem",  # round 5: all-pairs Pearson in one pass
    "asof_clicks_events",    # round 5: union-trick as-of join
    "sessions_events",       # round 5: lag/cumsum sessionization
    "interval_integrity_events",  # round 5: SCD2 range integrity
    "fuzzy_domain_orders",   # round 5: broadcast levenshtein suggest
    "funnel_events",         # round 5: aggregate-fold funnel reach
    "cusum_shift_events",    # round 5: closed-form CUSUM level shifts
    "fuzzy_link_parts",      # round 5: PassJoin edit-distance linkage
    "null_patterns_events",  # round 5: missingness-combination profile
    "trend_drift_events",    # round 5: closed-form OLS drift screen
    "distinct_rollup_events",  # round 5: mergeable HLL sketch rollup
    "segment_drift_customer",  # round 5: KS/chi2 scorer by segment key
    "group_null_rates_events",  # round 5: per-segment null-rate robust z
    "pair_outliers_lineitem",  # round 5: broadcast Mahalanobis pairs
]


def time_action(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def warm_up(spark, cpus: int) -> None:
    """Untimed: JVM JIT/codegen warm-up + python-worker spawn + first-touch
    of the input footers, so the timed runs measure the engine."""
    import pandas as _pd

    def _noop(its):
        from open_data_linter_spark.audio.codecs import decode_clip  # noqa: F401
        for b in its:
            yield _pd.DataFrame({"n": [len(b)]})

    spark.range(0, cpus * 2, numPartitions=cpus * 2).mapInPandas(_noop, "n long").count()
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()


def main() -> None:
    import __spark_entry__ as entrymod
    from open_data_linter_spark.audio.synth import synthesize_clips, synthesize_reference
    from open_data_linter_spark.plans.run import ValidationRun
    from open_data_linter_spark.rules.audio_rules import build_audio_ruleset
    from open_data_linter_spark.sources.fixtures import make_fixture

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    sc_parts = max(CPUS * 8, 64)  # >=256 at 32 cores: both configs fully subscribed

    warm_up(spark, CPUS)

    qs = entrymod.queries()

    # ---- audio fingerprint dedup at bench scale (not the 256-clip
    # driver fixture): decode+FFT melody pass + shingle bucket join ----
    from open_data_linter_spark.audio.synth import (
        synthesize_gapped_clips,
        synthesize_tone_clips,
    )
    from open_data_linter_spark.dedup.audio_fp import audio_near_duplicates
    from open_data_linter_spark.multimodal.media import (
        chunk_audio,
        prep_audio,
    )

    tone = synthesize_tone_clips(spark, 4096, sc_parts)
    gapped = synthesize_gapped_clips(spark, 4096, sc_parts)

    # ---- validation throughput over the synthetic audio table ----
    # bucketed-by-clip_id layout on tmpfs (BENCH/BASELINE.md: the sandbox
    # volume is throttled; the clips-reference join is exchange-free)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="odl_bench_", dir=shm)
    from open_data_linter_spark.sources.bucketed import (
        CLIPS_DDL, REFS_DDL, register_bucketed, write_bucketed)

    write_bucketed(synthesize_clips(spark, N_CLIPS, sc_parts), "bench_clips",
                   os.path.join(tmp, "clips"), buckets=64)
    write_bucketed(synthesize_reference(spark, N_CLIPS, sc_parts), "bench_refs",
                   os.path.join(tmp, "refs"), buckets=64)
    clips = spark.table("bench_clips")
    _, ctx = make_fixture(spark, n=64, num_partitions=4, with_reference=False)
    from open_data_linter_spark.rules.drift import joint_histograms
    from open_data_linter_spark.sources.fixtures import DUR_BIN_EDGES, clip_manifest

    ctx["reference_clips"] = spark.table("bench_refs")
    ctx["clip_manifest"] = clip_manifest(spark, N_CLIPS)
    ctx["baseline_hist"] = joint_histograms(
        clips, [("sr_hz", None), ("dur_ms", DUR_BIN_EDGES)]
    )

    # first-touch the payload bytes once (untimed) — the sandbox block
    # device is throttled and does not retain page cache
    from pyspark.sql import functions as F

    clips.select(F.sum(F.length("bytes"))).collect()
    ctx["reference_clips"].select(F.sum(F.length("pcm_ref"))).collect()

    run = ValidationRun(spark, build_audio_ruleset(), collect_violation_rows=False)

    # ---- timed passes: INTERLEAVED best-of-REPS. A hypervisor steal
    # storm on this host lasts minutes (BENCH/BASELINE.md appendix), so
    # best-of-N CONSECUTIVE reps of one query all land inside it and the
    # query reads 5x slow while its neighbors read clean. Interleaving
    # whole passes spreads each query's reps minutes apart — one clean
    # pass anywhere in the run yields a clean minimum for every query
    # (same discipline as scripts/bench_scaling.py's interleaved pairs).
    timings: dict[str, float] = {}

    def _note(name: str, sec: float) -> None:
        timings[name] = min(timings.get(name, float("inf")), round(sec, 3))

    for _ in range(REPS):
        # the north-rule metric runs FIRST in each pass: round 4 timed it
        # last, after 44 other queries had crowded the JVM with leaked
        # persisted frames and codegen cache, and the headline clips/sec
        # read 4.95s vs 2.50s isolated (same code, git-verified unchanged;
        # BENCH/APPENDIX.md round-5 note) — measure the matrix before the
        # session accumulates state, not after
        _note("validation_full_matrix",
              time_action(lambda: run.run(clips, dict(ctx))))
        for name in HEADLINE:
            _note(name, time_action(lambda: qs[name](spark, SF_DIR).collect()))
        _note(
            "audio_neardups_4k",
            time_action(
                lambda: audio_near_duplicates(tone, threshold=0.45).count()
            ),
        )
        _note(
            "audio_chunks_4k",
            time_action(
                lambda: chunk_audio(
                    tone, window_ms=1000, hop_ms=500, min_tail_ms=240
                ).count()
            ),
        )
        _note(
            # the prep pipeline: VAD segmentation + 16 kHz resample in ONE
            # fused Arrow decode pass over 4096 clips (round 5; the former
            # chained transform_audio(segment_on_silence(...)) decoded
            # every clip twice — sample-exactness of the fusion is pinned
            # by test_prep_audio_matches_chained)
            "audio_prep_4k",
            time_action(
                lambda: prep_audio(gapped, target_sr=16000).count()
            ),
        )
        def _audio_knn_pass() -> None:
            # payload embeddings (decode+FFT mean-pool) + exact cosine
            # top-2 for the 2048 planted-variant queries; in-run sanity:
            # ≥97% of retrieved neighbors share the query's planted group
            # (measured 98.8% — trunc variants lose rank-2 to impostors)
            from open_data_linter_spark.multimodal.media import audio_embeddings
            from open_data_linter_spark.similarity.knn import brute_force_topk

            emb = audio_embeddings(tone).persist()
            pos = F.substring("clip_id", 6, 8).cast("int") % 8
            top2 = brute_force_topk(
                emb, emb.where(pos >= 6), k=2, vec_col="embedding", id_col="clip_id"
            )
            qi = F.substring("query_id", 6, 8).cast("int")
            ni = F.substring("neighbor_id", 6, 8).cast("int")

            def grp(c):
                return F.when(c % 8 >= 6, c - c % 8).otherwise(c)

            same, n = top2.select(
                (grp(qi) == grp(ni)).cast("int").alias("s")
            ).agg(F.sum("s"), F.count("*")).collect()[0]
            emb.unpersist()
            assert n == 2048 and same / n >= 0.97, (same, n)

        _note("audio_knn_4k", time_action(_audio_knn_pass))
        # drop persisted frames leaked by the pass's queries (lazy persists
        # without a paired unpersist accumulate across 45 entries and
        # squeeze unified memory for the next pass)
        spark.catalog.clearCache()

    t_val = timings["validation_full_matrix"]
    clips_per_sec = round(N_CLIPS / t_val, 1)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation+query wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "clips_per_sec": clips_per_sec,
                "n_clips": N_CLIPS,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
