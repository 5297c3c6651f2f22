"""Raw-text (CSV-ish) ingestion mode: distributed structure inference.

The reference infers table structure from an untyped line list
(csv_structure_analyzer.py:14-69): the longest run of consecutive lines with
an equal field count is the content block (P1), the first content line
containing a numeric cell starts the data (P2), lines before it are headers
(P3). Needed only for schemaless text ingestion — the audio table skips it
(schema fixed) — but it IS the reference's core preprocessing, so the engine
carries a Spark-native version:

P1 as a window computation (no driver loop):
    lag(field_count) over (order by line_no)  -> change flag
    sum(change flag) running                  -> run/group id
    groupBy(run id)                           -> longest run

The global orderBy window is the scalability caveat: orderBy over line_no is
a single-partition sort for the lag(). For multi-GB text you'd run this
per-file (files are the natural unit — the reference lints one file at a
time), so the window is per-file via partitionBy(file_id) and parallelism
comes from many files, not from splitting one.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_data_linter_spark.functions import predicates as P


class HeaderEstimateError(ValueError):
    """No numeric cell found in the content block (errors.py:1-2)."""


def lines_df(spark: SparkSession, text: str, file_id: str = "f0") -> DataFrame:
    """Parse CSV text into a lines DataFrame (line_no, fields array).

    Parsing happens once on the driver for a single file (mirrors the
    reference's csv.reader); the multi-file path would distribute this via
    ``spark.read.text`` + per-partition csv parsing.
    """
    reader = csv.reader(io.StringIO(text))
    rows = [(file_id, i, row) for i, row in enumerate(reader)]
    return spark.createDataFrame(rows, "file_id string, line_no int, fields array<string>")


def estimate_content_range(df: DataFrame) -> DataFrame:
    """P1 (csv_structure_analyzer.py:36-60): per file, the longest run of
    consecutive lines with equal field count → (file_id, start_line, end_line).

    Ties: the reference takes the FIRST longest run (max() over runs scanned
    in order) — reproduced by ordering (count desc, start asc).
    """
    w = Window.partitionBy("file_id").orderBy("line_no")
    with_fc = df.withColumn("fc", F.size("fields"))
    changed = F.when(
        F.lag("fc").over(w).isNull() | (F.lag("fc").over(w) != F.col("fc")), 1
    ).otherwise(0)
    runs = with_fc.withColumn("run_id", F.sum(changed).over(w))
    per_run = runs.groupBy("file_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("line_no").alias("start_line"),
        F.max("line_no").alias("end_line"),
    )
    w2 = Window.partitionBy("file_id").orderBy(
        F.col("run_len").desc(), F.col("start_line").asc()
    )
    return (
        per_run.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") == 1)
        .select("file_id", "start_line", "end_line")
    )


def estimate_header_line(df: DataFrame, content_range: DataFrame) -> DataFrame:
    """P2 (csv_structure_analyzer.py:62-69): within the content block, the
    first line containing any numeric cell = first data line. Lines before it
    (within the block) are headers. → (file_id, title_lines, header_lines,
    data_start)."""
    joined = df.join(content_range, on="file_id")
    in_block = joined.where(
        F.col("line_no").between(F.col("start_line"), F.col("end_line"))
    )
    has_num = F.exists("fields", lambda c: P.is_number(c))
    first_num = in_block.where(has_num).groupBy("file_id").agg(
        F.min("line_no").alias("data_start")
    )
    return (
        content_range.join(first_num, on="file_id", how="left")
        .select(
            "file_id",
            F.col("start_line").alias("title_lines"),  # lines before block
            (F.col("data_start") - F.col("start_line")).alias("header_lines"),
            "data_start",
            "end_line",
        )
    )


def split_header_content(df: DataFrame, structure: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P3 (csv_structure_analyzer.py:27-34): header vs content line split."""
    joined = df.join(structure, on="file_id")
    header = joined.where(
        (F.col("line_no") >= F.col("title_lines")) & (F.col("line_no") < F.col("data_start"))
    ).select("file_id", "line_no", "fields")
    content = joined.where(
        F.col("line_no").between(F.col("data_start"), F.col("end_line"))
    ).select("file_id", "line_no", "fields")
    return header, content


def analyze(spark: SparkSession, text: str, file_id: str = "f0"):
    """Full P1→P3 pipeline for one file; raises HeaderEstimateError when no
    numeric line exists (csv_linter.py:80-82 channel)."""
    df = lines_df(spark, text, file_id)
    rng = estimate_content_range(df)
    structure = estimate_header_line(df, rng)
    row = structure.collect()
    if not row or row[0]["data_start"] is None:
        raise HeaderEstimateError("no numeric content line found")
    header, content = split_header_content(df, structure)
    return structure, header, content
