"""One cold-JVM validation run at a given parallelism (helper for
bench_scaling.py). Usage: python scripts/_scale_run.py <cores> <clips_dir>
<refs_dir> <n_clips>. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_data_linter_spark.plans.run import ValidationRun  # noqa: E402
from open_data_linter_spark.rules.audio_rules import build_audio_ruleset  # noqa: E402
from open_data_linter_spark.rules.drift import joint_histograms  # noqa: E402
from open_data_linter_spark.session import get_spark  # noqa: E402
from open_data_linter_spark.sources.fixtures import DUR_BIN_EDGES, clip_manifest  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    clips_dir, refs_dir = sys.argv[2], sys.argv[3]
    n_clips = int(sys.argv[4])

    import tempfile

    local_dir = tempfile.mkdtemp(
        prefix="odl_spill_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    spark = get_spark(
        f"scale-run-{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8),
        extra_conf={"spark.local.dir": local_dir},
    )
    # bucketed layout: clips ⋈ reference joins without any Exchange (the
    # production answer to the payload shuffle; sources/bucketed.py)
    from open_data_linter_spark.sources.bucketed import (
        CLIPS_DDL, REFS_DDL, register_bucketed)

    clips = register_bucketed(spark, "clips_b", clips_dir, CLIPS_DDL, buckets=64)
    refs = register_bucketed(spark, "refs_b", refs_dir, REFS_DDL, buckets=64)
    ctx = {
        "reference_clips": refs,
        "clip_manifest": clip_manifest(spark, n_clips),
        "codec_registry": None,
        "gate_rules": {"1-6-schema"},
    }
    from open_data_linter_spark.audio.synth import codec_registry_pdf

    ctx["codec_registry"] = spark.createDataFrame(codec_registry_pdf())
    # baseline from the same table: not timed (a prod run reads a frozen one)
    ctx["baseline_hist"] = joint_histograms(
        clips, [("sr_hz", None), ("dur_ms", DUR_BIN_EDGES)]
    )

    def cpu_snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return list(map(int, parts[1:9]))

    # warm-up (untimed): spawn+import python workers, and touch every input
    # byte once so the timed run measures the engine, not worker cold-start
    # or the throttled sandbox volume (a real cluster's long-lived executors
    # and OS cache are warm)
    import pandas as _pd

    def _warm(its):
        from open_data_linter_spark.audio.codecs import decode_clip  # noqa: F401
        for b in its:
            yield _pd.DataFrame({"n": [len(b)]})

    spark.range(0, cores * 4, numPartitions=cores * 4).mapInPandas(_warm, "n long").count()
    from pyspark.sql import functions as F

    clips.select(F.sum(F.length("bytes"))).collect()
    ctx["reference_clips"].select(F.sum(F.length("pcm_ref"))).collect()

    run = ValidationRun(spark, build_audio_ruleset(), collect_violation_rows=False)
    before = cpu_snap()
    t0 = time.time()
    report = run.run(clips, ctx)
    wall = time.time() - t0
    after = cpu_snap()
    delta = [b - a for a, b in zip(before, after)]
    steal_pct = round(delta[7] / max(1, sum(delta)) * 100, 1)
    per_family = {k: round(v, 3) for k, v in report.wall_secs.items()}
    spark.stop()
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 3),
                "clips_per_sec": round(n_clips / wall, 1),
                "per_family_sec": per_family,
                "n_clips": n_clips,
                "matrix_all_pass": all(v is True for v in report.matrix().values()),
                "host_steal_pct": steal_pct,
            }
        )
    )


if __name__ == "__main__":
    main()
