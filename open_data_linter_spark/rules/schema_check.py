"""Declared-schema conformance: the table's shape vs what it SHOULD be.

The reference infers everything from the file in hand (column_classifier.py
votes a plausible type per column); a warehouse table usually has a
CONTRACT — the schema the producer declared — and the first regression a
consumer hits is a column silently renamed, retyped, or dropped by an
upstream migration. ``rules/snapshot.py`` detects drift BETWEEN versions;
this module checks one version against the declaration itself.

``check_schema(df, expected)`` compares the DataFrame's Catalyst schema
against ``expected`` (``{column: simpleString type}``) and returns one row
per column in the union:

- ``ok``            — present with the declared type
- ``type_mismatch`` — present, wrong type (both types reported)
- ``missing``       — declared but absent from the table
- ``unexpected``    — present but undeclared (additive upstream change —
  often benign, never silent)
- ``nullable``      — reported alongside, so a contract that forbids NULLs
  can gate on it (enforcement of observed nulls is rules/constraints.py's
  ``not_null`` job; this is the declared-shape view)

Plan shape: NONE — schemas are plan metadata; the check runs zero Spark
jobs and touches zero data, which is exactly why it belongs FIRST in a
validation run at 10^12 rows (cf. the blocked-gate convention in
plans/run.py: a schema breach should stop the expensive families before
they scan anything).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession


def check_schema(
    df: DataFrame, expected: Mapping[str, str], spark: SparkSession | None = None
) -> DataFrame:
    """One row per column of union(actual, expected): conformance status.

    Columns: ``column``, ``expected_type``, ``actual_type``, ``nullable``,
    ``status``. Ordered by column name.
    """
    spark = spark or df.sparkSession
    actual = {
        f.name: (f.dataType.simpleString(), f.nullable) for f in df.schema.fields
    }
    rows = []
    for name in sorted(set(actual) | set(expected)):
        etype = expected.get(name)
        atype, nullable = actual.get(name, (None, None))
        if etype is None:
            status = "unexpected"
        elif atype is None:
            status = "missing"
        elif atype == etype:
            status = "ok"
        else:
            status = "type_mismatch"
        rows.append((name, etype, atype, nullable, status))
    return spark.createDataFrame(
        rows,
        "column string, expected_type string, actual_type string,"
        " nullable boolean, status string",
    )
