"""Scaling-efficiency evidence: same job, same input, local[N] vs local[4N].

Sandbox proxy for the north rule's "N and 4N executors, efficiency >= 0.8"
criterion (BASELINE.md measurement protocol): synthesize the audio table
once to Parquet (>= 256 partitions), then run the FULL validation matrix in
two cold JVMs — local[8] and local[32] — and report throughput at both plus
efficiency = (thr_32 / thr_8) / 4.

Writes BENCH/BASELINE.md. Usage:
    python scripts/bench_scaling.py [n_clips] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize(n_clips: int, parts: int, tmp: str) -> tuple[str, str]:
    from open_data_linter_spark.audio.synth import synthesize_clips, synthesize_reference
    from open_data_linter_spark.session import get_spark

    spark = get_spark("scale-synth", master="local[32]", shuffle_partitions=32)
    clips_dir = os.path.join(tmp, "clips")
    refs_dir = os.path.join(tmp, "refs")
    synthesize_clips(spark, n_clips, parts).write.mode("overwrite").parquet(clips_dir)
    synthesize_reference(spark, n_clips, parts).write.mode("overwrite").parquet(refs_dir)
    spark.stop()
    return clips_dir, refs_dir


def cold_run(cores: int, clips_dir: str, refs_dir: str, n_clips: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_scale_run.py"),
         str(cores), clips_dir, refs_dir, str(n_clips)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from cold run at {cores} cores:\n{out.stderr[-2000:]}")


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    parts = 256

    tmp = tempfile.mkdtemp(prefix="odl_scale_")
    t0 = time.time()
    clips_dir, refs_dir = synthesize(n_clips, parts, tmp)
    synth_sec = time.time() - t0

    low = cold_run(n_low, clips_dir, refs_dir, n_clips)
    high = cold_run(n_high, clips_dir, refs_dir, n_clips)
    ratio = high["clips_per_sec"] / low["clips_per_sec"]
    eff = ratio / (n_high / n_low)

    md = f"""# BENCH/BASELINE — measured scaling evidence

Input: deterministic synthetic audio table, **{n_clips:,} clips**,
{parts} Parquet partitions (both configs fully subscribed), generated once
(seed 42, synthesis {synth_sec:.0f}s, untimed). Workload: FULL validation
matrix — fused row scan, column aggs, salted uniqueness, anti-join RI
(codec + manifest), drift histograms, and the Arrow decode pass with
SNR/transcript comparison against the reference table. Cold JVM per run,
identical conf (AQE on, Arrow on), same machine.

| config | wall (s) | clips/sec | per-family (s) |
|---|---|---|---|
| local[{n_low}] (N) | {low['wall_sec']} | {low['clips_per_sec']:,} | {json.dumps(low['per_family_sec'])} |
| local[{n_high}] (4N) | {high['wall_sec']} | {high['clips_per_sec']:,} | {json.dumps(high['per_family_sec'])} |

**Speedup {n_low}→{n_high} cores: {ratio:.2f}x ⇒ scaling efficiency
{eff:.3f}** (criterion: ≥ 0.8 → **{"PASS" if eff >= 0.8 else "FAIL"}**).

Full-matrix correctness during both runs: all rules pass =
{low['matrix_all_pass']} / {high['matrix_all_pass']}.

Raw JSON:

```json
{json.dumps(low)}
{json.dumps(high)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
