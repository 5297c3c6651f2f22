"""Round-6 isolation bench: time declared queries one by one, bench-style.

Usage:
    python scripts/bench_r6_isolate.py <sf_dir> <query> [query ...]

Env:
    SPARK_GRAFT_CPUS     core count (default 32, same as the driver bench)
    SPARK_GRAFT_R6_REPS  timed reps per query (default 1)
    SPARK_GRAFT_R6_PLAN  if set, write .explain("formatted") to
                         plans/r06/<query>_<tag>.txt (tag = the env value)

Methodology matches bench.py (fresh tuned session, untimed warm-up,
`.collect()` as the timed action) so numbers are comparable, but each
invocation isolates the listed queries from bench-session crowding.
Prints one JSON line per query: {"name":..., "sec": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_data_linter_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_R6_REPS", "1"))
PLAN_TAG = os.environ.get("SPARK_GRAFT_R6_PLAN", "")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entrymod

    spark = get_spark(
        "bench-r6-isolate", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    # same warm-up as bench.py
    import pandas as _pd

    def _noop(its):
        for b in its:
            yield _pd.DataFrame({"n": [len(b)]})

    spark.range(0, CPUS * 2, numPartitions=CPUS * 2).mapInPandas(_noop, "n long").count()
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"r6:{name}")
        if PLAN_TAG:
            os.makedirs("plans/r06", exist_ok=True)
            plan = qs[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                qs[name](spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{PLAN_TAG}.txt", "w") as fh:
                fh.write(plan)
        secs = []
        for _ in range(REPS):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            secs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(json.dumps({"name": name, "sec": secs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
