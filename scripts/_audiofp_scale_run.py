"""One cold-JVM audio-fingerprint dedup run at a given parallelism
(helper for bench_audiofp_scaling.py). Usage:
    python scripts/_audiofp_scale_run.py <cores> <data_dir> <n_clips>
Prints one JSON line: wall, clips/sec, steal%, sanity.

The timed span is the dedup pass end-to-end: parquet scan -> Arrow
decode+FFT fingerprint pass -> shingle bucket shuffle -> pair expansion ->
hashed-set Jaccard verify -> count. Warm-up (untimed): python workers and
one touch of every payload byte (long-lived executors / OS cache on a real
cluster; the sandbox block device is throttled — data lives on tmpfs).
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
        prefix="odl_afp_spill_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    from pyspark.sql import functions as F

    from open_data_linter_spark.dedup.audio_fp import audio_near_duplicates
    from open_data_linter_spark.session import get_spark

    expected = json.load(open(os.path.join(root, "expected.json")))
    assert expected["n_clips"] == n, "corpus/n mismatch — regenerate"

    spark = get_spark(
        f"audiofp-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.local.dir": local_dir,
            # the corpus is ~64 x 9MB files; the default 128MB
            # maxPartitionBytes packs them into ~5 scan partitions, which
            # starves the decode stage at 4N cores (measured: 1.78x at
            # 2->8). But mapInPandas tasks cost ~140ms EACH on this VM
            # (measured with an id-only UDF, workers verified reused), so
            # 8MB splits (92 tasks) drown the 2-core side in per-task
            # overhead instead (44s vs 25s). 24MB -> ~24 decode tasks =
            # 3 waves at 8 cores, ~2s total overhead at 2 cores.
            "spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024),
        },
    )

    clips = spark.read.parquet(os.path.join(root, "clips"))

    # warm-up, untimed: python workers + every payload byte
    import pandas as _pd

    def _warm(its):
        from open_data_linter_spark.audio.codecs import decode_clip  # noqa: F401
        for b in its:
            yield _pd.DataFrame({"n": [len(b)]})

    spark.range(0, cores * 4, numPartitions=cores * 4).mapInPandas(_warm, "n long").count()
    n_rows = clips.count()
    assert n_rows == n, f"corpus has {n_rows} rows, expected {n} — stale dir"
    clips.select(F.sum(F.length("bytes"))).collect()
    # untimed codegen/JIT warm-up: a tiny dedup pass compiles the same
    # generated classes (wide xxhash64 shingle projections, array
    # comprehension pair expansion) the timed run uses — on a long-lived
    # cluster these are compiled once per executor lifetime, not per job.
    # ~1-3s of first-run compilation otherwise lands in the timed span,
    # identical on both sides but 20% of the 4N wall at this corpus size.
    audio_near_duplicates(clips.limit(192), threshold=0.45).count()

    before = cpu_snap()
    t0 = time.time()
    pairs = audio_near_duplicates(clips, threshold=0.45).count()
    wall = time.time() - t0
    after = cpu_snap()
    delta = [b - a for a, b in zip(before, after)]
    steal = round(100.0 * delta[7] / max(1, sum(delta)), 2)

    sanity = "ok" if pairs == expected["n_pairs"] else f"pairs={pairs}!={expected['n_pairs']}"
    print(json.dumps({
        "kind": "audiofp", "cores": cores, "n_clips": n,
        "wall_sec": round(wall, 2),
        "clips_per_sec": round(n / wall, 1),
        "host_steal_pct": steal, "sanity": sanity,
    }))
    spark.stop()
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
