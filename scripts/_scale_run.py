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

    spark = get_spark(
        f"scale-run-{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
    )
    clips = spark.read.parquet(clips_dir)
    ctx = {
        "reference_clips": spark.read.parquet(refs_dir),
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

    run = ValidationRun(spark, build_audio_ruleset(), collect_violation_rows=False)
    t0 = time.time()
    report = run.run(clips, ctx)
    wall = time.time() - t0
    per_family = {k: round(v, 3) for k, v in report.wall_secs.items()}
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 3),
                "clips_per_sec": round(n_clips / wall, 1),
                "per_family_sec": per_family,
                "n_clips": n_clips,
                "matrix_all_pass": all(v is True for v in report.matrix().values()),
            }
        )
    )


if __name__ == "__main__":
    main()
