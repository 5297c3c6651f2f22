"""One cold-JVM fleet-kernel run at a given parallelism (helper for
bench_fleet_scaling.py). Usage:
    python scripts/_fleet_scale_run.py <cores> <corpus_dir> <n_files>
Prints one JSON line: wall, files/sec, steal%, sanity.

The timed span is the production fleet pass end-to-end: binaryFile listing
+ scan -> mapInPandas worker-local kernel -> per-check verdict aggregate.
Warm-up (untimed): python workers, the file listing's dentry cache, and
one touch of every input byte (a real cluster's executors and OS cache are
long-lived; the sandbox volume is throttled — corpus lives on tmpfs).
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
        prefix="odl_fleet_spill_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    from pyspark.sql import functions as F

    from open_data_linter_spark.plans.fleet import lint_files_distributed
    from open_data_linter_spark.session import get_spark

    spark = get_spark(
        f"fleet-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.local.dir": local_dir},
    )
    # small-file fleet: pack O(10^2..10^3) files per task (bench_fleet.py)
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))

    # warm-up, untimed: python workers + full listing + every input byte
    import pandas as _pd

    def _warm(its):
        from open_data_linter_spark.rules.kernel import KernelLinter  # noqa: F401
        for b in its:
            yield _pd.DataFrame({"n": [len(b)]})

    spark.range(0, cores * 4, numPartitions=cores * 4).mapInPandas(_warm, "n long").count()
    spark.read.format("binaryFile").load(root).select(
        F.sum(F.length("content"))
    ).collect()

    before = cpu_snap()
    t0 = time.time()
    agg = (
        lint_files_distributed(spark, root)
        .groupBy("check")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_valid").cast("int")).alias("valid"),
            F.sum((~F.col("is_valid")).cast("int")).alias("invalid"),
        )
        .collect()
    )
    wall = time.time() - t0
    after = cpu_snap()
    delta = [b - a for a, b in zip(before, after)]
    steal_pct = round(delta[7] / max(1, sum(delta)) * 100, 1)

    # sanity against the deterministic 4-flavor corpus (bench_fleet.py)
    by_check = {r.check: (r.rows, int(r.valid or 0), int(r.invalid or 0)) for r in agg}
    flavor_n = {f: sum(1 for i in range(n) if i % 4 == k)
                for k, f in enumerate(["clean", "ws", "unit", "blocked"])}
    ok = (
        all(v[0] == n for v in by_check.values())
        and by_check["1-1"][2] == flavor_n["blocked"]
        and by_check["1-5"][2] == flavor_n["ws"]
        and by_check["1-6"][2] == flavor_n["unit"]
    )
    spark.stop()
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_files": n,
                "wall_sec": round(wall, 3),
                "files_per_sec": round(n / wall, 1),
                "host_steal_pct": steal_pct,
                "sanity": "ok" if ok else "FAILED",
            }
        )
    )


if __name__ == "__main__":
    main()
