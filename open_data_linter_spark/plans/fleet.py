"""Fleet linting: many files through the per-file TabularLinter.

The reference lints ONE file per invocation (csv_linter.py:43); a portal
operator has thousands. ``lint_files`` drives N concurrent TabularLinter
instances over one SparkSession — Spark's scheduler interleaves their
(tiny) jobs across the cluster, and each file's verdict matrix lands in
one summary DataFrame.

Scale positioning (honest): per-file engine jobs cost ~100ms of scheduling
each, so this shape is right up to O(10^4) files per batch. Past that, the
at-scale design is a worker-local kernel over ``binaryFile`` rows
(mapInPandas, one pandas evaluation per file, no per-file driver job) —
which re-implements the rule semantics outside Catalyst and therefore
lives behind the same parity test wall before it would be shipped. The
10^12-ROW path is the audio-table engine (plans/run.py); this module is
for many SMALL schemaless files.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession


def lint_files(
    spark: SparkSession,
    paths: Iterable[str],
    parallelism: int = 8,
    checks: Optional[list[str]] = None,
) -> DataFrame:
    """Lint each file; one row per (file, check): (path, check, is_valid,
    n_violation_cells, message).

    ``is_valid`` is None when the file was blocked (unreadable / structure
    estimate failed) — matching the reference's 1-1 error channel.
    """
    from open_data_linter_spark.rules.tabular import TabularLinter

    check_names = checks or ["1_1", "1_2", "1_3", "1_4", "1_5", "1_6",
                             "1_7", "1_10", "1_11", "1_12", "1_13", "2_x"]

    def one(path: str) -> list[tuple]:
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError as e:
            # blocked file (missing / permission denied): report every
            # requested check as is_valid=None — the documented 1-1 error
            # channel — instead of aborting the whole batch
            return [
                (path, name.replace("_", "-"), None, 0, str(e))
                for name in check_names
            ]
        linter = TabularLinter(spark, data, os.path.basename(path))
        rows = []
        for name in check_names:
            res = getattr(linter, f"check_{name}")()
            n_cells = sum(len(ic.invalid_cells) for ic in res.invalid_contents)
            msg = res.invalid_contents[0].error_message if res.invalid_contents else None
            rows.append((path, name.replace("_", "-"), res.is_valid, n_cells, msg))
        return rows

    out: list[tuple] = []
    with cf.ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
        for rows in pool.map(one, list(paths)):
            out.extend(rows)
    return spark.createDataFrame(
        out, "path string, check string, is_valid boolean, "
             "n_violation_cells long, message string"
    )
