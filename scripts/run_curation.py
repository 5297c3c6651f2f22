"""Production entry point: curate a documents table end-to-end.

Composes the training-data-pipeline operator families into the standard
curation sequence (each stage is the library operator, nothing bespoke):

  0. normalization         functions/normalize.normalize_text (optional,
                           --normalize; NFC + control strip + whitespace
                           collapse BEFORE dedup so trivially-variant
                           forms collapse)
  1. exact dedup           dedup/exact.distinct_by_fingerprint
  1b. line dedup           dedup/lines.remove_boilerplate_lines (optional,
                           --remove-dup-lines; strips lines repeated in
                           >= --line-min-docs distinct docs — the
                           C4/MassiveText boilerplate pass)
  2. near-dup dedup        dedup/minhash pairs -> cluster.deduplicate
                           (connected components, min-id survivor)
  2b. semantic dedup       dedup/semdedup.semdedup over --embeddings
                           (optional; k-means cells + in-cell greedy —
                           docs without an embedding row pass through)
  3. decontamination       dedup/contamination.decontaminate vs an eval set
  4. span-dup trim         dedup/spans.duplicate_span_stats coverage cap
  4b. span removal         dedup/spans.remove_duplicate_spans (optional,
                           --remove-dup-spans; a TRANSFORM, not a filter:
                           non-first occurrences of cross-doc duplicated
                           spans are cut and the cleaned text substituted —
                           affected docs' text becomes ws-normalized)
  4c. blocklist gate       functions/blocklist.blocklist_filter (optional,
                           --blocklist/--blocklist-phrases; C4 badlist —
                           any-hit drop, or a fraction cap via
                           --max-blocked-fraction)
  5. quality filter        functions/text.quality_score floor
  5a. learned quality gate functions/quality_model (optional,
                           --qm-pos-docs/--qm-neg-docs: train the NB
                           log-odds classifier curated-vs-crawl, keep
                           docs via the seeded Pareto acceptance rule —
                           the GPT-3 Appendix-A stage)
  5b. repetition gates     functions/repetition.repetition_filter
                           (Gopher dup-2gram + top-2gram caps)
  5c. PII redaction        functions/pii.redact_pii (transform, not a
                           filter; disable with --no-redact-pii)
  6. mixture sampling      functions/sampling.mixture_sample (temperature)
  7. sequence packing      functions/packing.pack_sequences
  8. sharded export        sources/shards.export_shards (optional,
                           --shards N: single-file shards + integrity
                           manifest under OUT/shards)

spark-submit shape:

    spark-submit --py-files odl_spark.zip scripts/run_curation.py \
        --docs /path/documents.parquet --out /path/out \
        [--eval /path/eval.parquet] [--minhash-threshold 0.7] \
        [--max-span-coverage 0.95] [--min-quality 0.2] \
        [--mixture-alpha 0.7] [--mixture-total N] [--pack-budget 2048]

Local demo:

    python scripts/run_curation.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/curated

Writes to --out:
  curated/      the surviving rows (original schema + n_tokens + bin_id)
  report.json   per-stage row counts + wall times (the funnel)

Every stage is deterministic (seeded hashes, not RNG), so re-running
reproduces the same corpus byte-for-byte — the replay property the
sampling/packing operators are built around.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_data_linter_spark.dedup.cluster import deduplicate  # noqa: E402
from open_data_linter_spark.dedup.contamination import decontaminate  # noqa: E402
from open_data_linter_spark.dedup.exact import distinct_by_fingerprint  # noqa: E402
from open_data_linter_spark.dedup.minhash import minhash_near_duplicates  # noqa: E402
from open_data_linter_spark.dedup.incremental import (  # noqa: E402
    append_to_index,
    load_index,
    match_against_index,
)
from open_data_linter_spark.dedup._cache import nudge_context_cleaner  # noqa: E402
from open_data_linter_spark.dedup.semdedup import semdedup  # noqa: E402
from open_data_linter_spark.functions.pii import redact_pii  # noqa: E402
from open_data_linter_spark.functions.repetition import repetition_filter  # noqa: E402
from open_data_linter_spark.dedup.spans import (  # noqa: E402
    duplicate_span_stats,
    remove_duplicate_spans,
)
from open_data_linter_spark.dedup.lines import (  # noqa: E402
    remove_boilerplate_lines,
)
from open_data_linter_spark.functions.blocklist import blocklist_filter  # noqa: E402
from open_data_linter_spark.functions.normalize import normalize_text  # noqa: E402
from open_data_linter_spark.functions.quality_model import (  # noqa: E402
    pareto_quality_sample,
    train_quality_classifier,
)
from open_data_linter_spark.functions.packing import pack_sequences  # noqa: E402
from open_data_linter_spark.functions.sampling import mixture_sample  # noqa: E402
from open_data_linter_spark.sources.shards import export_shards  # noqa: E402
from open_data_linter_spark.functions.text import quality_score  # noqa: E402
from open_data_linter_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval", default=None,
                    help="eval-set parquet (doc_id,text); default: doc_id < 10"
                         " of the corpus itself (demo mode)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--probe-index", default=None,
                    help="persisted MinHash index dir (dedup/incremental"
                         ".py): drop docs near-duplicating this prior"
                         " corpus before intra-batch dedup; probe text"
                         " must be normalized the same way the index"
                         " was built")
    ap.add_argument("--grow-index", action="store_true",
                    help="with --probe-index: append the final curated"
                         " docs to the index (the batch ingest loop)")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet (vec_id keyed by doc_id) —"
                         " enables the semantic-dedup stage")
    ap.add_argument("--semantic-threshold", type=float, default=0.9)
    ap.add_argument("--semantic-cells", type=int, default=16)
    ap.add_argument("--max-dup-2gram-rate", type=float, default=0.6)
    ap.add_argument("--max-top-2gram-rate", type=float, default=0.2)
    ap.add_argument("--no-redact-pii", action="store_true")
    ap.add_argument("--contamination-k", type=int, default=5)
    ap.add_argument("--contamination-coverage", type=float, default=0.5)
    ap.add_argument("--max-span-coverage", type=float, default=0.95)
    ap.add_argument("--span-k", type=int, default=8)
    ap.add_argument("--remove-dup-spans", action="store_true",
                    help="cut non-first occurrences of cross-doc duplicated"
                         " spans from surviving docs (text of affected docs"
                         " becomes whitespace-normalized lowercase)")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + control-strip + whitespace-collapse the"
                         " text before dedup")
    ap.add_argument("--remove-dup-lines", action="store_true",
                    help="strip lines repeated across >= --line-min-docs"
                         " distinct docs (boilerplate pass; output line"
                         " endings are LF-normalized for affected docs)")
    ap.add_argument("--line-min-docs", type=int, default=5)
    ap.add_argument("--blocklist", default=None,
                    help="comma-separated blocked tokens (C4-style gate,"
                         " functions/blocklist.py)")
    ap.add_argument("--blocklist-phrases", default=None,
                    help="comma-separated blocked multi-word phrases")
    ap.add_argument("--max-blocked-fraction", type=float, default=0.0,
                    help="keep docs whose blocked-token fraction is <= this"
                         " (0.0 = any hit drops)")
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--qm-pos-docs", default=None,
                    help="parquet of curated 'positive' docs — with"
                         " --qm-neg-docs enables the learned quality gate"
                         " (functions/quality_model.py)")
    ap.add_argument("--qm-neg-docs", default=None,
                    help="parquet of raw 'negative' docs for the learned"
                         " quality gate")
    ap.add_argument("--qm-shape", type=float, default=9.0,
                    help="Pareto shape of the acceptance rule (bigger ="
                         " sharper gate)")
    ap.add_argument("--qm-buckets", type=int, default=4096,
                    help="feature-hash buckets so the weight table"
                         " broadcasts at scale (0 = raw string features)")
    ap.add_argument("--mixture-alpha", type=float, default=0.7)
    ap.add_argument("--mixture-total", type=int, default=None,
                    help="sample budget; default 80%% of the surviving rows")
    ap.add_argument("--group-col", default="lang")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=0,
                    help="also export the curated corpus as N single-file"
                         " shards + manifest under OUT/shards"
                         " (sources/shards.py; 0 = skip)")
    args = ap.parse_args()

    spark = get_spark("odl-curation", master=args.master)
    t_start = time.time()
    report: dict = {"stages": []}
    prev_df = [None]

    # belt-and-braces: every stage self-joins the previous frame, so the
    # LOGICAL plan doubles per stage even though the data is cached — at
    # 5+ filter stages the plan string passed to the execution listener
    # crosses the JVM's 1 GiB UTF16 limit and .count() dies in
    # StringConcat. localCheckpoint below truncates the lineage for real;
    # this cap keeps any remaining stringification bounded.
    spark.conf.set("spark.sql.maxPlanStringLength", str(1 << 20))

    def stage(name: str, df, t0: float):
        # localCheckpoint (NOT persist) BEFORE counting: materializes the
        # survivors so later stages never re-run the upstream funnel, AND
        # truncates the logical plan — each stage's anti-join references
        # the previous frame twice, so lazy lineage doubles per stage
        # (the dedup/cluster.py lesson; with persist alone the plan tree
        # still grows 2^stages and Catalyst analysis + plan printing
        # explode)
        df = df.localCheckpoint(eager=True)
        n = df.count()
        # release the previous generation: unpersist() is a NO-OP on
        # checkpoint blocks — drop the reference and nudge ContextCleaner
        prev_df[0] = df
        nudge_context_cleaner(spark)
        report["stages"].append(
            {"stage": name, "rows": n, "sec": round(time.time() - t0, 2)}
        )
        print(f"  {name}: {n} rows [{report['stages'][-1]['sec']}s]")
        return df

    docs = spark.read.parquet(args.docs)
    stage("input", docs, t_start)

    if args.normalize:
        t0 = time.time()
        docs = normalize_text(docs).withColumn(
            "text", F.col("text_norm")
        ).drop("text_norm")
        docs = stage("normalize", docs, t0)

    t0 = time.time()
    docs = distinct_by_fingerprint(docs)
    docs = stage("exact_dedup", docs, t0)

    if args.remove_dup_lines:
        t0 = time.time()
        cleaned = remove_boilerplate_lines(docs, min_docs=args.line_min_docs)
        report["docs_line_trimmed"] = cleaned.where(
            F.col("n_removed") > 0
        ).count()
        # transform, not a filter: substitute only where a line was
        # actually cut, so untouched docs keep their text byte-for-byte
        docs = (
            docs.join(
                cleaned.select("doc_id", "n_removed", "text_clean"),
                "doc_id",
                "left",
            )
            .withColumn(
                "text",
                F.coalesce(
                    F.when(F.col("n_removed") > 0, F.col("text_clean")),
                    F.col("text"),
                ),
            )
            .drop("text_clean", "n_removed")
        )
        docs = stage("line_dedup", docs, t0)

    if args.probe_index:
        # the incremental ingest loop's front half: docs that near-dup
        # the PRIOR corpus drop before any intra-batch work spends on them
        t0 = time.time()
        idx = load_index(spark, args.probe_index)
        matched = (
            match_against_index(
                docs, idx, threshold=args.minhash_threshold
            )
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        docs = docs.join(matched, "doc_id", "left_anti")
        docs = stage("index_probe", docs, t0)

    t0 = time.time()
    pairs = minhash_near_duplicates(docs, threshold=args.minhash_threshold)
    docs = deduplicate(docs, pairs)
    docs = stage("neardup_dedup", docs, t0)

    if args.embeddings:
        t0 = time.time()
        emb = spark.read.parquet(args.embeddings).select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        # only surviving docs' vectors enter the cells; docs WITHOUT an
        # embedding row pass through untouched (no signal, no verdict)
        emb_surv = emb.join(docs.select("doc_id"), "doc_id", "semi").where(
            F.col("embedding").isNotNull()
        )
        if not emb_surv.head(1):
            # zero overlap (stale/mismatched id space) => zero verdicts;
            # the IVF trainer would otherwise raise deep in the sampler
            # and kill the whole multi-stage run
            print("  semantic_dedup: no embeddings match surviving docs"
                  " — stage skipped")
            docs = stage("semantic_dedup", docs, t0)
        else:
            verdicts = semdedup(
                emb_surv,
                threshold=args.semantic_threshold,
                n_cells=args.semantic_cells,
                id_col="doc_id",
            )
            losers = verdicts.where(~F.col("keep")).select("doc_id")
            docs = docs.join(losers, "doc_id", "left_anti")
            docs = stage("semantic_dedup", docs, t0)

    t0 = time.time()
    if args.eval:
        ev = spark.read.parquet(args.eval).select(
            F.col("doc_id").alias("eval_id"), "text"
        )
    else:
        ev = docs.where(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("eval_id"), "text"
        )
    docs = decontaminate(
        docs, ev, k=args.contamination_k,
        min_coverage=args.contamination_coverage,
    )
    docs = stage("decontaminate", docs, t0)

    t0 = time.time()
    spans = duplicate_span_stats(docs, k=args.span_k).where(
        F.col("dup_coverage") > args.max_span_coverage
    ).select("doc_id")
    docs = docs.join(spans, "doc_id", "left_anti")
    docs = stage("span_trim", docs, t0)

    if args.remove_dup_spans:
        t0 = time.time()
        cleaned = remove_duplicate_spans(docs, k=args.span_k)
        report["docs_cleaned"] = cleaned.where(F.col("n_dropped") > 0).count()
        # transform, not a filter: substitute the cleaned text only where
        # something was actually cut, so untouched docs keep their
        # original (un-normalized) text byte-for-byte
        docs = (
            docs.join(
                cleaned.select("doc_id", "n_dropped", "text_clean"),
                "doc_id",
                "left",
            )
            .withColumn(
                "text",
                F.coalesce(
                    F.when(F.col("n_dropped") > 0, F.col("text_clean")),
                    F.col("text"),
                ),
            )
            .drop("text_clean", "n_dropped")
        )
        docs = stage("span_removal", docs, t0)

    if args.blocklist or args.blocklist_phrases:
        t0 = time.time()
        docs = blocklist_filter(
            docs,
            [t for t in (args.blocklist or "").split(",") if t],
            [p for p in (args.blocklist_phrases or "").split(",") if p],
            max_fraction=args.max_blocked_fraction,
        )
        docs = stage("blocklist", docs, t0)

    t0 = time.time()
    docs = docs.where(quality_score(F.col("text")) >= args.min_quality)
    docs = stage("quality_filter", docs, t0)

    if args.qm_pos_docs and args.qm_neg_docs:
        t0 = time.time()
        buckets = args.qm_buckets or None
        # localCheckpoint: scores consume the model through two subtrees
        # (weights + the OOV row) — pin it so training runs exactly once
        model = train_quality_classifier(
            spark.read.parquet(args.qm_pos_docs),
            spark.read.parquet(args.qm_neg_docs),
            buckets=buckets,
        ).localCheckpoint(eager=True)
        docs = pareto_quality_sample(
            docs, model, shape=args.qm_shape, buckets=buckets
        )
        docs = stage("quality_model", docs, t0)

    t0 = time.time()
    docs = repetition_filter(
        docs,
        max_dup_2gram_rate=args.max_dup_2gram_rate,
        max_top_2gram_rate=args.max_top_2gram_rate,
    )
    docs = stage("repetition_gates", docs, t0)

    if not args.no_redact_pii:
        t0 = time.time()
        docs = docs.withColumn("text", redact_pii(F.col("text")))
        docs = stage("pii_redact", docs, t0)

    t0 = time.time()
    total = args.mixture_total
    if total is None:
        total = max(1, int(docs.count() * 0.8))
    docs = mixture_sample(
        docs, args.group_col, "doc_id", total=total, alpha=args.mixture_alpha
    )
    docs = stage("mixture_sample", docs, t0)

    t0 = time.time()
    packed = pack_sequences(docs, budget=args.pack_budget)
    curated = docs.join(
        packed.withColumnRenamed("id", "doc_id"), "doc_id"
    )
    os.makedirs(args.out, exist_ok=True)
    curated.write.mode("overwrite").parquet(os.path.join(args.out, "curated"))
    curated_back = spark.read.parquet(os.path.join(args.out, "curated"))
    stage("packed_written", curated_back, t0)

    if args.shards:
        # packaging sink: N single-file shards + integrity manifest under
        # out/shards/ (sources/shards.py) — the artifact a training run
        # actually loads; placement is id-hash deterministic so re-runs
        # produce byte-stable shards
        t0 = time.time()
        export_shards(curated_back, os.path.join(args.out, "shards"),
                      args.shards)
        print(f"  shards_written ({args.shards}) "
              f"[{round(time.time() - t0, 2)}s]")
        report["n_shards"] = args.shards

    if args.probe_index and args.grow_index:
        # back half of the ingest loop: the curated survivors join the
        # index so the NEXT batch's duplicates of them are dropped too
        t0 = time.time()
        append_to_index(
            curated_back.select("doc_id", "text"), args.probe_index
        )
        report["index_grown"] = True
        print(f"  index_grown [{round(time.time() - t0, 2)}s]")

    report["n_bins"] = curated_back.select("bin_id").distinct().count()
    report["total_sec"] = round(time.time() - t_start, 2)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"curation": report["stages"][-1]["rows"],
                      "bins": report["n_bins"],
                      "sec": report["total_sec"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
