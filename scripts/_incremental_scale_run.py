"""One cold-JVM incremental-dedup run at a given parallelism (helper for
bench_incremental_scaling.py). Usage:
    python scripts/_incremental_scale_run.py <cores> <data_dir> <n_corpus>
Prints one JSON line with per-phase wall + task metrics parsed from the
Spark event log (shuffle bytes are DETERMINISTIC, so they carry the
scale-shape claim on this timing-hostile host; walls are informational).

Phases (each its own job group, attributed via the event log):
  build  — build_minhash_index over the corpus + save_index to tmpfs
           (the one O(corpus) pass; its cost is EXPECTED to grow with
           the corpus)
  probe  — load_index from disk + match_against_index(batch).count()
           (the claim under test: shuffle stays O(batch + candidates)
           as the corpus grows — the index is scanned, never shuffled)
  full   — minhash_near_duplicates(corpus ∪ batch).count()
           (the alternative the index path replaces: a full re-dedup
           whose shuffle grows with the corpus)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> dict[str, dict]:
    """Per-job-group task-metric sums from the (single-app) event log."""
    files = [f for f in os.listdir(log_dir) if not f.startswith(".")]
    assert len(files) == 1, f"expected one event log, got {files}"
    stage_group: dict[int, str] = {}
    sums: dict[str, dict] = {}
    with open(os.path.join(log_dir, files[0])) as f:
        for line in f:
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
                for sid in ev.get("Stage IDs", []):
                    stage_group[sid] = grp
            elif kind == "SparkListenerTaskEnd":
                grp = stage_group.get(ev.get("Stage ID"), "?")
                m = ev.get("Task Metrics") or {}
                s = sums.setdefault(grp, {
                    "shuffle_write_b": 0, "shuffle_read_b": 0,
                    "input_b": 0, "exec_run_ms": 0, "tasks": 0,
                })
                s["tasks"] += 1
                s["exec_run_ms"] += m.get("Executor Run Time", 0)
                s["input_b"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                s["shuffle_read_b"] += (sr.get("Remote Bytes Read", 0)
                                        + sr.get("Local Bytes Read", 0))
    return sums


def main() -> None:
    cores = int(sys.argv[1])
    root = sys.argv[2]
    n = int(sys.argv[3])

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    local_dir = tempfile.mkdtemp(prefix="odl_inc_spill_", dir=shm)
    evlog_dir = tempfile.mkdtemp(prefix="odl_inc_evlog_", dir=shm)
    idx_dir = tempfile.mkdtemp(prefix="odl_inc_idx_", dir=shm)

    from open_data_linter_spark.dedup._cache import clear_scoped
    from open_data_linter_spark.dedup.incremental import (
        build_minhash_index,
        load_index,
        match_against_index,
        save_index,
    )
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates
    from open_data_linter_spark.session import get_spark

    expected = json.load(open(os.path.join(root, "expected.json")))
    assert expected["n_corpus"] == n, "corpus/n mismatch — regenerate"

    spark = get_spark(
        f"inc-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evlog_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    corpus = spark.read.parquet(os.path.join(root, "corpus"))
    batch = spark.read.parquet(os.path.join(root, "batch"))
    assert corpus.count() == n, "stale corpus dir — use a per-size dir"
    n_batch = batch.count()

    walls: dict[str, float] = {}

    sc.setJobGroup("build", "index build + save")
    t0 = time.time()
    save_index(build_minhash_index(corpus), os.path.join(idx_dir, "idx"))
    walls["build"] = time.time() - t0
    clear_scoped()

    sc.setJobGroup("probe", "load + batch probe")
    t0 = time.time()
    idx = load_index(spark, os.path.join(idx_dir, "idx"))
    probe_pairs = match_against_index(batch, idx).count()
    walls["probe"] = time.time() - t0
    clear_scoped()

    sc.setJobGroup("full", "full re-dedup of corpus+batch")
    t0 = time.time()
    full_pairs = minhash_near_duplicates(
        corpus.select("doc_id", "text").unionByName(
            batch.select("doc_id", "text"))
    ).count()
    walls["full"] = time.time() - t0

    spark.stop()
    time.sleep(1)  # event-log rename on stop
    metrics = parse_event_log(evlog_dir)

    phases = {}
    for name in ("build", "probe", "full"):
        m = metrics.get(name, {})
        phases[name] = {
            "wall_sec": round(walls[name], 2),
            "shuffle_write_mb": round(m.get("shuffle_write_b", 0) / 1e6, 2),
            "shuffle_read_mb": round(m.get("shuffle_read_b", 0) / 1e6, 2),
            "input_mb": round(m.get("input_b", 0) / 1e6, 2),
            "tasks": m.get("tasks", 0),
        }
    sanity = "ok" if (probe_pairs == expected["probe_pairs"]
                      and full_pairs == expected["full_pairs"]) else (
        f"probe={probe_pairs}!={expected['probe_pairs']} or "
        f"full={full_pairs}!={expected['full_pairs']}")
    print(json.dumps({
        "kind": "incremental", "cores": cores, "n_corpus": n,
        "n_batch": n_batch, "phases": phases,
        "probe_pairs": probe_pairs, "full_pairs": full_pairs,
        "sanity": sanity,
    }))
    for d in (local_dir, evlog_dir, idx_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
