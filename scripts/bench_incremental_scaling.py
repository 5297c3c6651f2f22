"""Incremental-index scale-shape evidence: fixed ingest batch, corpus at
C and 4C docs — the probe's SHUFFLE bytes must stay ~O(batch) while the
full-re-dedup alternative's grow ~linearly with the corpus.

Unlike the N-vs-4N wall-clock workloads (bench_scaling.py etc.), the
headline metric here is deterministic task-metric bytes parsed from the
Spark event log, so this VM's steal storms cannot fake or break the
claim; walls are reported as informational context only. One invocation
produces the whole section (no accumulation protocol needed for bytes).

Usage:
    SPARK_GRAFT_INC_DATA=/dev/shm/odl_inc_data \
        python scripts/bench_incremental_scaling.py [n_base] [cores]

Per-size data dirs are derived as {root}_{n} (the round-3 reuse
incident: never share a dir across sizes).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARK_BEGIN = "<!-- incremental-scaling:begin -->"
MARK_END = "<!-- incremental-scaling:end -->"
N_BATCH_COPIES = 1000
N_BATCH_NOVEL = 1000


def gen_data(root: str, n: int) -> None:
    """Corpus of n synthetic docs + a FIXED 2k-doc batch (1k verbatim
    copies of corpus docs 0..999 under new ids — present at every corpus
    size, so the matched pair set is identical across sizes — plus 1k
    novel docs), with probe/full pair counts recorded at gen time as the
    in-run sanity gate. Reuse is row-count-verified."""
    sidecar = os.path.join(root, "expected.json")
    if os.path.exists(sidecar):
        exp = json.load(open(sidecar))
        if exp.get("n_corpus") == n:
            import duckdb

            rows = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{root}/corpus/*.parquet')"
            ).fetchone()[0]
            if rows == n:
                print(f"reusing data at {root} ({rows} rows verified)")
                return
        raise SystemExit(f"{root} holds a different corpus — per-size dirs")

    from pyspark.sql import functions as F

    from open_data_linter_spark.dedup.incremental import (
        build_minhash_index,
        match_against_index,
    )
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates
    from open_data_linter_spark.session import get_spark
    from open_data_linter_spark.sources.textsynth import synthesize_documents

    spark = get_spark("inc-gen", master="local[32]", shuffle_partitions=32)
    corpus = synthesize_documents(spark, n).select("doc_id", "text")
    corpus.write.mode("overwrite").parquet(f"{root}/corpus")
    corpus = spark.read.parquet(f"{root}/corpus")
    copies = corpus.where(F.col("doc_id") < N_BATCH_COPIES).select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"), "text"
    )
    novel = (
        synthesize_documents(spark, N_BATCH_NOVEL, seed=99)
        .select((F.col("doc_id") + F.lit(2_000_000_000)).alias("doc_id"), "text")
    )
    copies.unionByName(novel).repartition(8).write.mode("overwrite").parquet(
        f"{root}/batch"
    )
    batch = spark.read.parquet(f"{root}/batch")
    probe_pairs = match_against_index(
        batch, build_minhash_index(corpus)
    ).count()
    full_pairs = minhash_near_duplicates(corpus.unionByName(batch)).count()
    spark.stop()
    with open(sidecar, "w") as f:
        json.dump({"n_corpus": n, "n_batch": N_BATCH_COPIES + N_BATCH_NOVEL,
                   "probe_pairs": probe_pairs, "full_pairs": full_pairs}, f)
    print(f"generated corpus {n}: probe_pairs={probe_pairs} full_pairs={full_pairs}")


def cold_run(cores: int, root: str, n: int) -> dict:
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "_incremental_scale_run.py"),
           str(cores), root, str(n)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from run at corpus {n}:\n{out.stderr[-2000:]}")


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    root = os.environ.get("SPARK_GRAFT_INC_DATA", "/dev/shm/odl_inc_data")

    sizes = [n_base, 4 * n_base]
    results = []
    runs_log = os.path.join(REPO, "BENCH", "incremental_scaling_runs.jsonl")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(runs_log, "a") as logf:
        for n in sizes:
            gen_data(f"{root}_{n}", n)
            r = cold_run(cores, f"{root}_{n}", n)
            assert r["sanity"] == "ok", r
            results.append(r)
            logf.write(json.dumps(r) + "\n")
            logf.flush()

    lo, hi = results
    p_lo, p_hi = lo["phases"]["probe"], hi["phases"]["probe"]
    f_lo, f_hi = lo["phases"]["full"], hi["phases"]["full"]
    b_lo, b_hi = lo["phases"]["build"], hi["phases"]["build"]

    def sh(p):  # total bytes crossing a shuffle boundary
        return p["shuffle_write_mb"]

    probe_ratio = sh(p_hi) / max(sh(p_lo), 1e-9)
    full_ratio = sh(f_hi) / max(sh(f_lo), 1e-9)
    section = f"""{MARK_BEGIN}

## Incremental-index probe scale shape (dedup/incremental.py, fixed {lo['n_batch']:,}-doc batch)

Complementary to the N-vs-4N wall-clock evidence above: the claim under
test is the SHAPE of the probe — shuffle volume must follow the BATCH,
not the corpus, because the persisted index is scanned (broadcast-hash
probe) but never shuffle-joined. Shuffle bytes come from Spark task
metrics (event log), are deterministic, and are immune to this host's
steal storms; walls (cold local[{cores}] JVM, tmpfs, unpinned) are
informational. The batch's 1,000 copied docs are drawn from corpus ids
0..999 — present at both sizes — so the matched pair set is IDENTICAL
at C and 4C and every run sanity-gates its pair counts against the
values recorded at corpus-gen time.

| corpus docs | phase | shuffle write (MB) | wall (s) |
|---|---|---|---|
| {lo['n_corpus']:,} | index build (O(corpus), once) | {b_lo['shuffle_write_mb']} | {b_lo['wall_sec']} |
| {hi['n_corpus']:,} | index build (O(corpus), once) | {b_hi['shuffle_write_mb']} | {b_hi['wall_sec']} |
| {lo['n_corpus']:,} | **batch probe** | **{p_lo['shuffle_write_mb']}** | {p_lo['wall_sec']} |
| {hi['n_corpus']:,} | **batch probe** | **{p_hi['shuffle_write_mb']}** | {p_hi['wall_sec']} |
| {lo['n_corpus']:,} | full re-dedup (the alternative) | {f_lo['shuffle_write_mb']} | {f_lo['wall_sec']} |
| {hi['n_corpus']:,} | full re-dedup (the alternative) | {f_hi['shuffle_write_mb']} | {f_hi['wall_sec']} |

**Corpus ×4 ⇒ probe shuffle ×{probe_ratio:.2f} vs full-re-dedup shuffle
×{full_ratio:.2f}.** The probe's only shuffle is the O(candidates) pair
dedup; it still SCANS the index once per probe (one sequential parquet
pass, no pair expansion — unavoidable without a key-value store; on
tmpfs the 4× scan barely moves the probe wall), while the full re-dedup
re-shuffles the whole corpus every ingest. Scan volume is not tabled:
Spark's task "Input Metrics / Bytes Read" under-reports local-filesystem
parquet scans (a forced full scan of a 52 MB index reports 0.04 MB), so
only shuffle bytes — which task metrics report exactly — carry the
claim. Pair sanity: probe {lo['probe_pairs']} == {hi['probe_pairs']}
pairs at both sizes (gen-time recorded), full {lo['full_pairs']} →
{hi['full_pairs']}.

Raw run JSON ({runs_log.split('/')[-1]}):

```json
{json.dumps(lo)}
{json.dumps(hi)}
```

{MARK_END}"""

    appendix = os.path.join(REPO, "BENCH", "APPENDIX.md")
    text = open(appendix).read() if os.path.exists(appendix) else ""
    if MARK_BEGIN in text:
        text = re.sub(re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
                      section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(appendix, "w") as f:
        f.write(text)
    print(section)


if __name__ == "__main__":
    main()
