"""Fleet linting: many files through the per-file TabularLinter.

The reference lints ONE file per invocation (csv_linter.py:43); a portal
operator has thousands. ``lint_files`` drives N concurrent TabularLinter
instances over one SparkSession — Spark's scheduler interleaves their
(tiny) jobs across the cluster, and each file's verdict matrix lands in
one summary DataFrame.

Scale positioning: per-file engine jobs cost ~100ms of scheduling each,
so ``lint_files`` (driver-side thread pool over TabularLinter) is right
up to O(10^4) files per batch and gives full Catalyst-backed semantics.
Past that, ``lint_files_distributed`` runs the worker-local kernel
(rules/kernel.py) over ``binaryFile`` rows via mapInPandas — one
in-process evaluation per file, no per-file driver job — cleared through
the parity wall (tests/test_fleet_kernel_parity.py: kernel ==
TabularLinter on the reference's full sample corpus plus differential
corpora). The 10^12-ROW path is the audio-table engine (plans/run.py);
this module is for many SMALL schemaless files.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from open_data_linter_spark.rules.tabular import BLOCKED as _BLOCKED_MSG
from open_data_linter_spark.rules.tabular import CHECK_NAMES as _DEFAULT_CHECKS

_FLEET_SCHEMA = ("path string, check string, is_valid boolean, "
                 "n_violation_cells long, message string")


def _blocked_rows(path: str, check_names: list, error: str) -> list:
    """Fleet rows for a file that could not be linted at all, in the
    KernelLinter/TabularLinter blocked shape: 1-1 fails (is_valid=False,
    the error as message), every other check is is_valid=None blocked
    (the shared rules/tabular.BLOCKED message). When the caller's check
    list omits 1-1 there is no gate row to carry the error, so it rides
    on every blocked row instead of vanishing."""
    checks = [name.replace("_", "-") for name in check_names]
    none_msg = _BLOCKED_MSG if "1-1" in checks else error
    return [
        (path, c, False, 0, error) if c == "1-1" else (path, c, None, 0, none_msg)
        for c in checks
    ]


def lint_files(
    spark: SparkSession,
    paths: Iterable[str],
    parallelism: int = 8,
    checks: Optional[list[str]] = None,
) -> DataFrame:
    """Lint each file; one row per (file, check): (path, check, is_valid,
    n_violation_cells, message).

    Blocked files (unreadable bytes, OS errors, failed structure estimate)
    follow the reference's 1-1 error channel: the 1-1 row is is_valid=False
    with the error message, every other check is is_valid=None.
    """
    from open_data_linter_spark.rules.tabular import TabularLinter

    check_names = checks or _DEFAULT_CHECKS

    def one(path: str) -> list[tuple]:
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError as e:
            # blocked file (missing / permission denied): same shape as the
            # data-level blocked channel (TabularLinter/KernelLinter) — the
            # 1-1 readable gate FAILS (is_valid=False, the OS error as the
            # message) and every other check is is_valid=None blocked, so
            # consumers filtering `is_valid == False` on 1-1 see OS-level
            # failures too, instead of aborting the whole batch
            return _blocked_rows(path, check_names, str(e))
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
    return spark.createDataFrame(out, _FLEET_SCHEMA)


def lint_files_distributed(
    spark: SparkSession,
    source: Union[str, list[str]],
    checks: Optional[list[str]] = None,
) -> DataFrame:
    """Million-file fleet path: ``binaryFile`` scan → mapInPandas with the
    worker-local rule kernel (rules/kernel.py::KernelLinter).

    Same output schema and verdict semantics as ``lint_files`` (parity
    pinned by tests/test_fleet_kernel_parity.py), but no per-file driver
    job: files are bin-packed into scan partitions by Spark's file source
    (spark.sql.files.openCostInBytes controls files-per-partition), each
    partition's files are linted in-process on the executor, and only the
    per-(file, check) summary rows come back. This is the design the
    round-2 fleet docstring promised: O(10^6) files is a single Spark job
    whose task count follows data volume, not file count.

    ``source``: a directory / glob string, or an explicit list of paths.
    A file whose bytes cannot be linted yields the blocked shape (1-1
    is_valid=False with the error, other checks is_valid=None — same
    channel as lint_files); a path that disappears between listing
    and read surfaces as a task error (Spark file-source semantics).
    """
    check_names = checks or _DEFAULT_CHECKS
    binary = spark.read.format("binaryFile").load(source).select("path", "content")

    def run_batches(batches):
        import pandas as pd

        from open_data_linter_spark.rules.kernel import KernelLinter

        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path)
                try:
                    linter = KernelLinter(bytes(content), fname)
                except Exception as e:  # never poison the whole partition
                    # could not even construct a linter over the bytes:
                    # same blocked shape as lint_files' OSError channel
                    # (1-1 False with the error, the rest None blocked)
                    rows.extend(_blocked_rows(path, check_names, str(e)))
                    continue
                file_rows = []
                for k, name in enumerate(check_names):
                    try:
                        res = getattr(linter, f"check_{name}")()
                    except Exception as e:
                        # a single check raising on a READABLE file is an
                        # engine defect, not an unreadable file — keep the
                        # verdicts already computed and mark this check and
                        # the rest is_valid=None with the error, WITHOUT
                        # failing the 1-1 readable gate (it may have passed)
                        err = f"check {name.replace('_', '-')} failed: {e}"
                        file_rows.extend(
                            (path, n.replace("_", "-"), None, 0, err)
                            for n in check_names[k:]
                        )
                        break
                    n_cells = sum(
                        len(ic.invalid_cells) for ic in res.invalid_contents
                    )
                    msg = (res.invalid_contents[0].error_message
                           if res.invalid_contents else None)
                    file_rows.append(
                        (path, name.replace("_", "-"), res.is_valid, n_cells, msg)
                    )
                rows.extend(file_rows)
            yield pd.DataFrame(
                rows, columns=["path", "check", "is_valid",
                               "n_violation_cells", "message"]
            )

    return binary.mapInPandas(run_batches, _FLEET_SCHEMA)
