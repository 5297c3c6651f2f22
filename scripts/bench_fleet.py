"""Fleet-kernel throughput: N small CSVs through lint_files_distributed.

The distributed fleet path (binaryFile scan -> mapInPandas worker-local
kernel) is the O(10^5..10^6)-files design; this script evidences it at
10^5 files on tmpfs and records files/sec.

Usage:
    SPARK_GRAFT_FLEET_DATA=/dev/shm/odl_fleet_data \
        python scripts/bench_fleet.py [n_files] [cpus]

Appends one JSON line per run to BENCH/fleet_runs.jsonl and prints it.
The corpus is deterministic (4 cycling flavors incl. a blocked file) and
regenerated only when the directory doesn't already hold n_files files.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAVORS = {
    # all-clean: every check passes
    "clean": "id,名前,年度\n{i},名a,2020\n{j},名b,2021\n",
    # 1-5: whitespace-padded string cell
    "ws": "id,名前,年度\n{i}, 名a ,2020\n{j},名b,2021\n",
    # 1-3 unit suffix inside a numeric column + 1-6 empty header cell
    "unit": "id,,年度\n{i},3円,2020\n{j},4円,2021\n",
    # blocked: undecodable bytes -> 1-1 error channel
    "blocked": None,
}
ORDER = ["clean", "ws", "unit", "blocked"]


def gen_corpus(root: str, n: int) -> None:
    os.makedirs(root, exist_ok=True)
    existing = sum(1 for f in os.listdir(root) if f.endswith(".csv"))
    if existing == n:
        print(f"corpus ready: {n} files in {root}", file=sys.stderr)
        return
    for f in os.listdir(root):
        os.unlink(os.path.join(root, f))
    t0 = time.monotonic()
    for i in range(n):
        flavor = ORDER[i % len(ORDER)]
        tpl = FLAVORS[flavor]
        data = (b"\xff\xfe\x00bad" if tpl is None
                else tpl.format(i=i * 2 + 1, j=i * 2 + 2).encode("utf-8"))
        with open(os.path.join(root, f"f{i:06d}.csv"), "wb") as fh:
            fh.write(data)
    print(f"wrote {n} files in {time.monotonic()-t0:.1f}s", file=sys.stderr)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32"))
    root = os.environ.get("SPARK_GRAFT_FLEET_DATA", "/dev/shm/odl_fleet_data")
    gen_corpus(root, n)

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from open_data_linter_spark.plans.fleet import lint_files_distributed
    from open_data_linter_spark.session import get_spark

    spark = get_spark("fleet-bench")
    # small-file fleet: the default 4MB per-file open cost packs ~16 tiny
    # files per partition -> task-scheduling dominates at 10^5 files. 64KB
    # cost + 8MB partitions ≈ 10^2..10^3 files per task.
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    # warm-up: JVM + python workers + file listing outside the timed span
    spark.read.format("binaryFile").load(root).limit(64).count()

    t0 = time.monotonic()
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
    wall = time.monotonic() - t0
    by_check = {r.check: (r.rows, int(r.valid or 0), int(r.invalid or 0)) for r in agg}
    # sanity: every file produced 12 rows; blocked quarter fails 1-1;
    # ws+unit quarters fail 1-5 / (1-3 and 1-6)
    assert all(v[0] == n for v in by_check.values()), by_check
    # exact per-flavor counts (n need not divide by 4)
    flavor_n = {f: sum(1 for i in range(n) if ORDER[i % 4] == f) for f in ORDER}
    assert by_check["1-1"][2] == flavor_n["blocked"], by_check["1-1"]
    assert by_check["1-5"][2] == flavor_n["ws"], by_check["1-5"]
    assert by_check["1-6"][2] == flavor_n["unit"], by_check["1-6"]

    line = {
        "metric": "fleet kernel throughput",
        "files": n,
        "wall_sec": round(wall, 3),
        "files_per_sec": round(n / wall, 1),
        "cpus": cpus,
        "checks_per_file": 12,
        "sanity": "ok",
    }
    out = os.path.join(REPO, "BENCH", "fleet_runs.jsonl")
    with open(out, "a") as fh:
        fh.write(json.dumps(line) + "\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
