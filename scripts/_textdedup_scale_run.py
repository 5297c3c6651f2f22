"""One cold-JVM text near-dup (MinHash+LSH) run at a given parallelism
(helper for bench_textdedup_scaling.py). Usage:
    python scripts/_textdedup_scale_run.py <cores> <data_dir> <n_docs>
Prints one JSON line: wall, docs/sec, steal%, sanity.

The timed span is the dedup pass end-to-end: parquet scan -> tokenize +
shingle + 64-permutation MinHash signatures -> LSH band bucketing ->
bucket pair expansion -> hashed-set Jaccard verify -> count. Everything
is JVM-side Catalyst (no Arrow stage), so unlike the audio-fingerprint
analog there is no maxPartitionBytes tuning: the operator spreads its
input to defaultParallelism itself (dedup/_cache.spread_and_pin).
Sanity: the pair count must equal the value recorded at corpus-gen time
(expected.json sidecar), so a throttled or broken run can never publish.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return list(map(int, parts[1:9]))


def main() -> None:
    cores = int(sys.argv[1])
    root = sys.argv[2]
    n = int(sys.argv[3])

    import tempfile

    local_dir = tempfile.mkdtemp(
        prefix="odl_txt_spill_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates
    from open_data_linter_spark.session import get_spark

    expected = json.load(open(os.path.join(root, "expected.json")))
    assert expected["n_docs"] == n, "corpus/n mismatch — regenerate"

    spark = get_spark(
        f"textdedup-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.local.dir": local_dir},
    )

    docs = spark.read.parquet(os.path.join(root, "docs"))

    # warm-up, untimed: input bytes + the generated classes the timed run
    # uses (signature fold, band bucketing, pair comprehension) — on a
    # long-lived cluster these compile once per executor lifetime
    n_rows = docs.count()
    assert n_rows == n, f"corpus has {n_rows} rows, expected {n} — stale dir"
    from pyspark.sql import functions as F

    docs.select(F.sum(F.length("text"))).collect()
    minhash_near_duplicates(docs.limit(512), threshold=0.7).count()

    before = cpu_snap()
    t0 = time.time()
    pairs = minhash_near_duplicates(docs, threshold=0.7).count()
    wall = time.time() - t0
    after = cpu_snap()
    delta = [b - a for a, b in zip(before, after)]
    steal = round(100.0 * delta[7] / max(1, sum(delta)), 2)

    sanity = "ok" if pairs == expected["n_pairs"] else \
        f"pairs={pairs}!={expected['n_pairs']}"
    print(json.dumps({
        "kind": "textdedup", "cores": cores, "n_docs": n,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "host_steal_pct": steal, "sanity": sanity,
    }))
    spark.stop()
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
