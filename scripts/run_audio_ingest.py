"""Production entry point: validate + dedup-ingest an audio clip batch.

The audio-axis counterpart of run_curation.py — the daily-ingest loop
over a growing clip corpus (clip_id, bytes, sr_hz, dur_ms, codec,
transcript), composing the validation engine with the persisted
fingerprint index. The corpus is decoded ONCE (at --build-from time);
every later invocation decodes only its batch:

  0. (first run) --build-from corpus.parquet builds + saves the
     fingerprint index — the one pass that decodes the corpus
  1. validation   plans/run.ValidationRun over the batch (codec
                  registry always available; drift rules use
                  --baseline parquet when given; reference-PCM and
                  manifest rules report None without their inputs —
                  the reference linter's "could not check" channel)
  2. gate         --drop-invalid removes clips with row-level
                  violation rows before any dedup work is spent
  3. index probe  dedup/incremental_audio.match_audio_against_index
                  (broadcast-batch joins; corpus frames never shuffle)
  4. intra-batch  dedup/audio_fp.audio_near_duplicates,
                  greedy keep-smallest-id (the streaming loop's policy)
  5. sink + grow  survivors write to --out/accepted (one --out per
                  batch run — cross-run state lives in the INDEX, not
                  the out dir); --grow folds
                  them into the index so the NEXT batch's duplicates
                  of them drop too (see also
                  streaming/dedup.streaming_audio_index_ingest for the
                  Structured Streaming form, and
                  compact_audio_fp_index for periodic hot-key re-caps)

spark-submit shape:

    spark-submit --py-files odl_spark.zip scripts/run_audio_ingest.py \
        --batch /path/day.parquet --index /path/fp_index --out /path/out \
        [--build-from /path/corpus.parquet] [--threshold 0.45] [--grow] \
        [--baseline /path/clean.parquet] [--reference /path/ref.parquet] \
        [--drop-invalid]

Writes to --out:
  accepted/     surviving clip rows (original schema)
  violations/   violation rows (rule_id, clip_id, column, message, ...)
  matches/      (batch_id, index_id, jaccard) index-probe matches
  report.json   rule matrix + per-stage funnel counts + wall times

Deterministic end-to-end: fingerprints, probe joins, and the keep-
smallest-id policy are all seeded/hash-based — re-running a batch
against the same index reproduces the same accepted set, and the index
append is idempotent on clip ids (already-present ids are skipped), so
a crashed run replayed with --grow cannot double-append index rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_data_linter_spark.audio.synth import codec_registry_pdf  # noqa: E402
from open_data_linter_spark.dedup.audio_fp import (  # noqa: E402
    audio_hashed_keys,
    audio_near_duplicates,
)
from open_data_linter_spark.dedup.incremental_audio import (  # noqa: E402
    append_to_audio_fp_index,
    build_audio_fp_index,
    load_audio_fp_index,
    match_audio_against_index,
    save_audio_fp_index,
)
from open_data_linter_spark.plans.run import ValidationRun  # noqa: E402
from open_data_linter_spark.rules.audio_rules import build_audio_ruleset  # noqa: E402
from open_data_linter_spark.rules.drift import joint_histograms  # noqa: E402
from open_data_linter_spark.session import get_spark  # noqa: E402
from open_data_linter_spark.sources.fixtures import DUR_BIN_EDGES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", required=True,
                    help="clip batch parquet (or, with --raw-files, a"
                         " directory/glob of raw audio containers)")
    ap.add_argument("--raw-files", action="store_true",
                    help="read --batch as loose WAV/ulaw/alaw files via"
                         " sources/audio_files.clips_from_files: metadata"
                         " derived from container headers, undecodable"
                         " files flow to the 1-1 channel")
    ap.add_argument("--transcripts", default=None,
                    help="with --raw-files: (clip_id, transcript) parquet"
                         " sidecar to join")
    ap.add_argument("--index", required=True,
                    help="persisted fingerprint index dir"
                         " (dedup/incremental_audio.py layout)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--build-from", default=None,
                    help="corpus parquet: build + save the index first"
                         " (the one corpus decode); existing index dirs"
                         " are overwritten")
    ap.add_argument("--threshold", type=float, default=0.45)
    ap.add_argument("--grow", action="store_true",
                    help="append accepted clips to the index")
    ap.add_argument("--drop-invalid", action="store_true",
                    help="drop clips with row-level violations before"
                         " dedup")
    ap.add_argument("--baseline", default=None,
                    help="clean clip parquet to freeze drift baselines"
                         " from (sr_hz / dur_ms); drift rules report"
                         " None without it")
    ap.add_argument("--reference", default=None,
                    help="reference-PCM clip parquet for the payload"
                         " allclose/SNR rule; reports None without it")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("odl-audio-ingest", master=args.master)
    os.makedirs(args.out, exist_ok=True)
    t_start = time.time()
    report: dict = {"stages": {}}

    def stage(name: str, n: int, t0: float) -> None:
        report["stages"][name] = {"rows": n, "sec": round(time.time() - t0, 2)}
        print(f"  {name}: {n} rows [{report['stages'][name]['sec']}s]")

    if args.build_from:
        t0 = time.time()
        corpus = spark.read.parquet(args.build_from)
        save_audio_fp_index(build_audio_fp_index(corpus), args.index)
        stage("index_built", corpus.count(), t0)

    t0 = time.time()
    if args.raw_files:
        from open_data_linter_spark.sources.audio_files import (
            clips_from_files,
        )

        sidecar = (
            spark.read.parquet(args.transcripts) if args.transcripts else None
        )
        # localCheckpoint: the raw scan re-decodes headers per consumer
        # otherwise, and downstream stages consume the batch many times
        batch = clips_from_files(
            spark, args.batch, transcripts=sidecar
        ).localCheckpoint()
    else:
        batch = spark.read.parquet(args.batch)
    n_in = batch.count()
    stage("batch_read", n_in, t0)

    # ---- 1. validation ----------------------------------------------------
    t0 = time.time()
    ctx: dict = {
        "codec_registry": spark.createDataFrame(codec_registry_pdf()),
        "gate_rules": {"1-6-schema"},
    }
    if args.baseline:
        ctx["baseline_hist"] = joint_histograms(
            spark.read.parquet(args.baseline),
            [("sr_hz", None), ("dur_ms", DUR_BIN_EDGES)],
        )
    if args.reference:
        ctx["reference_clips"] = spark.read.parquet(args.reference)
    run = ValidationRun(spark, build_audio_ruleset(),
                        collect_violation_rows=True)
    vr = run.run(batch, ctx)
    report["matrix"] = {k: v for k, v in sorted(vr.matrix().items())}
    report["violation_counts"] = {
        rid: int(m.get("violation_count", 0))
        for rid, m in sorted(vr.metrics.items())
        if m.get("violation_count")
    }
    if args.baseline:
        # payload-level drift beside the metadata KS/chi²: PSI over the
        # DECODED feature distributions (multimodal/media.py). The
        # baseline is decoded here because the CLI gets clip parquet; a
        # monitoring deployment freezes audio_features(baseline) once
        # and passes the feature frame (accepted as-is by the operator).
        from open_data_linter_spark.multimodal.media import (
            audio_feature_drift,
        )

        report["payload_drift"] = {
            r["feature"]: r["psi"]
            for r in audio_feature_drift(
                batch, spark.read.parquet(args.baseline)
            ).collect()
        }
    # violations is None when the run produced no violation rows; clear
    # any stale dir from a previous run into the same --out so report
    # and sink never disagree
    viol_dir = os.path.join(args.out, "violations")
    if vr.violations is not None:
        vr.violations.write.mode("overwrite").parquet(viol_dir)
    elif os.path.isdir(viol_dir):
        import shutil

        shutil.rmtree(viol_dir)
    stage("validated", n_in, t0)

    # ---- 2. gate ----------------------------------------------------------
    if args.drop_invalid and vr.violations is not None:
        t0 = time.time()
        bad = spark.read.parquet(viol_dir).where(
            F.col("clip_id").isNotNull()
        )
        if args.raw_files and not args.transcripts:
            # a raw directory has no transcript source at all: every clip
            # would carry a 1-6-nulls transcript violation and the gate
            # would silently drop the WHOLE batch. The absence of a
            # sidecar is a pipeline property, not per-clip invalidity —
            # exempt exactly that (rule, column) pair; all other
            # violations still gate.
            bad = bad.where(
                ~((F.col("rule_id") == "1-6-nulls")
                  & (F.col("column") == "transcript"))
            )
        bad = bad.select("clip_id").distinct()
        batch = batch.join(bad, "clip_id", "left_anti").localCheckpoint()
        stage("gated", batch.count(), t0)

    # ---- 3. index probe ---------------------------------------------------
    t0 = time.time()
    idx = load_audio_fp_index(spark, args.index)
    # fingerprint the batch ONCE: probe, intra-batch dedup, and the index
    # append share this frame (the decode pass dominates everything)
    hashed = audio_hashed_keys(batch, q=idx.q, melody_q=idx.melody_q).persist()
    matches = match_audio_against_index(
        batch, idx, threshold=args.threshold, batch_hashed=hashed
    ).persist()
    matches.write.mode("overwrite").parquet(os.path.join(args.out, "matches"))
    survivors = batch.join(
        matches.select(F.col("batch_id").alias("clip_id")),
        "clip_id", "left_anti",
    )
    stage("index_probe", survivors.count(), t0)

    # ---- 4. intra-batch dedup ----------------------------------------------
    t0 = time.time()
    intra = audio_near_duplicates(
        batch, threshold=args.threshold, q=idx.q, melody_q=idx.melody_q,
        hashed_keys=hashed,
    ).select(F.col("id_b").alias("clip_id"))
    survivors = survivors.join(intra, "clip_id", "left_anti").localCheckpoint()
    matches.unpersist()
    stage("intra_dedup", survivors.count(), t0)

    # ---- 5. sink + grow ----------------------------------------------------
    t0 = time.time()
    survivors.write.mode("overwrite").parquet(
        os.path.join(args.out, "accepted")
    )
    accepted = spark.read.parquet(os.path.join(args.out, "accepted"))
    n_out = accepted.count()
    if args.grow:
        append_to_audio_fp_index(accepted, args.index, batch_hashed=hashed)
        report["index_grown"] = True
    stage("accepted_written", n_out, t0)

    report["n_in"] = n_in
    report["n_accepted"] = n_out
    report["total_sec"] = round(time.time() - t_start, 2)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps({"n_in": n_in, "n_accepted": n_out,
                      "total_sec": report["total_sec"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
