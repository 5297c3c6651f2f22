"""table_health_report: one call composing the generic table-health checks.

``ValidationRun`` (plans/run.py) is the audio-table engine: a ruleset
compiled into minimum fused jobs with a blocked-gate, violation rows and
an audit ledger. For an ARBITRARY table the round-5 health checks
(schema contract, column metrics, functional dependencies, freshness,
volume, Benford) are standalone functions; this module is the facade
that runs a declared selection of them and returns ONE long-form
findings frame:

    (family, subject, metric, value double, ok boolean, detail string)

- ``ok`` is NULL for pure profiling metrics (no threshold declared) —
  the Deequ convention: a metric is not a failed check.
- The schema check runs FIRST and, like the ValidationRun gate
  (plans/run.py's blocked semantics, reference funcs.py:98-106), a
  ``missing``/``type_mismatch`` finding SKIPS the data-touching checks
  that reference the broken columns — at 10^12 rows you do not scan a
  table whose contract is already known-broken. ``gate=False`` disables
  the skip.
- Each enabled family still owns its optimal plan (the facade adds no
  extra shuffle); results are unioned as tiny local/aggregate frames.

Spec keys (all optional):

    schema     {column: simpleString}           — contract; also the gate
    metrics    [col, ...]                       — distinctness/uniqueness/
                                                  entropy/null_count rows
    fds        [{"determinant": [...], "dependents": [...],
                 "min_conformance": 1.0}, ...]
    freshness  {"ts_col", "group_cols", "max_lag_s", "as_of"?}
    volume     {"ts_col", "grain"?, "z_threshold"?}
    benford    {col: chi2_critical, ...}        — default χ²₈ @ α=0.001
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPORT_SCHEMA = (
    "family string, subject string, metric string, value double,"
    " ok boolean, detail string"
)

# χ² critical value, 8 dof, α = 0.001 (the Benford default: nine digit
# classes). Same asymptotic-table convention as rules/drift.chi2_critical.
BENFORD_CHI2_CRIT = 26.124


def _local(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, _REPORT_SCHEMA)


def table_health_report(
    df: DataFrame, spec: dict, gate: bool = True
) -> DataFrame:
    """Run the declared checks; return one long-form findings frame."""
    spark = df.sparkSession
    parts: list[DataFrame] = []
    broken_cols: set[str] = set()
    gated = False

    if "schema" in spec:
        from open_data_linter_spark.rules.schema_check import check_schema

        rep = check_schema(df, spec["schema"], spark=spark).collect()
        rows = []
        for r in rep:
            ok = r.status in ("ok", "unexpected")  # additive cols don't gate
            if not ok:
                broken_cols.add(r.column)
            rows.append(
                (
                    "schema",
                    r.column,
                    "status",
                    None,
                    ok,
                    f"{r.status} (expected={r.expected_type},"
                    f" actual={r.actual_type})",
                )
            )
        parts.append(_local(spark, rows))
        gated = gate and bool(broken_cols)

    def _touches_broken(cols) -> bool:
        return gated and bool(set(cols) & broken_cols)

    def _skip(family: str, subject: str) -> DataFrame:
        return _local(
            spark,
            [(family, subject, "skipped", None, None,
              f"schema gate: broken columns {sorted(broken_cols)}")],
        )

    if "metrics" in spec:
        from open_data_linter_spark.rules.metrics import column_metrics

        cols = [c for c in spec["metrics"]]
        live = [c for c in cols if not _touches_broken([c])]
        for c in set(cols) - set(live):
            parts.append(_skip("metrics", c))
        if live:
            m = column_metrics(df, live)
            parts.append(
                m.selectExpr(
                    "'metrics' AS family",
                    "column AS subject",
                    "stack(4, 'null_count', CAST(null_count AS DOUBLE),"
                    " 'distinctness', distinctness,"
                    " 'uniqueness', uniqueness,"
                    " 'entropy', entropy) AS (metric, value)",
                ).select(
                    "family", "subject", "metric", "value",
                    F.lit(None).cast("boolean").alias("ok"),
                    F.lit(None).cast("string").alias("detail"),
                )
            )

    for fd in spec.get("fds", ()):
        from open_data_linter_spark.rules.fd import check_functional_dependency

        det, deps = list(fd["determinant"]), list(fd["dependents"])
        subj_prefix = ",".join(det)
        if _touches_broken(det + deps):
            parts.append(_skip("fd", subj_prefix + " -> " + ",".join(deps)))
            continue
        minc = float(fd.get("min_conformance", 1.0))
        out = check_functional_dependency(df, det, deps)
        parts.append(
            out.select(
                F.lit("fd").alias("family"),
                F.concat(F.col("determinant"), F.lit(" -> "), F.col("dependent")).alias("subject"),
                F.lit("conformance").alias("metric"),
                F.col("conformance").alias("value"),
                (F.col("conformance") >= F.lit(minc)).alias("ok"),
                F.concat(
                    F.lit("violating_groups="),
                    F.col("violating_groups").cast("string"),
                    F.lit(" violating_rows="),
                    F.col("violating_rows").cast("string"),
                ).alias("detail"),
            )
        )

    if "freshness" in spec:
        from open_data_linter_spark.rules.freshness import check_freshness

        fs = spec["freshness"]
        groups = list(fs["group_cols"])
        if _touches_broken([fs["ts_col"], *groups]):
            parts.append(_skip("freshness", fs["ts_col"]))
        else:
            out = check_freshness(
                df, fs["ts_col"], groups, fs["max_lag_s"], fs.get("as_of")
            )
            parts.append(
                out.select(
                    F.lit("freshness").alias("family"),
                    F.concat_ws("/", *[F.col(g).cast("string") for g in groups]).alias("subject"),
                    F.lit("lag_s").alias("metric"),
                    F.col("lag_s").cast("double").alias("value"),
                    (~F.col("stale")).alias("ok"),
                    F.concat(F.lit("last_ts="), F.col("last_ts").cast("string")).alias("detail"),
                )
            )

    if "volume" in spec:
        from open_data_linter_spark.rules.volume import volume_anomalies

        vs = spec["volume"]
        if _touches_broken([vs["ts_col"]]):
            parts.append(_skip("volume", vs["ts_col"]))
        else:
            out = volume_anomalies(
                df,
                vs["ts_col"],
                grain=vs.get("grain", "day"),
                z_threshold=vs.get("z_threshold", 3.5),
            )
            parts.append(
                out.select(
                    F.lit("volume").alias("family"),
                    F.col("bucket").cast("string").alias("subject"),
                    F.lit("z").alias("metric"),
                    F.col("z").alias("value"),
                    F.lit(False).alias("ok"),  # every emitted row IS an anomaly
                    F.concat(
                        F.lit("n_rows="),
                        F.col("n_rows").cast("long").cast("string"),
                    ).alias("detail"),
                )
            )

    for col, crit in dict(spec.get("benford", {})).items():
        from open_data_linter_spark.rules.benford import benford_check

        if _touches_broken([col]):
            parts.append(_skip("benford", col))
            continue
        crit = BENFORD_CHI2_CRIT if crit is None else float(crit)
        rep = benford_check(df, col)
        parts.append(
            rep.agg(F.sum("chi2_contrib").alias("chi2")).select(
                F.lit("benford").alias("family"),
                F.lit(col).alias("subject"),
                F.lit("chi2").alias("metric"),
                F.round("chi2", 6).alias("value"),
                (F.col("chi2") <= F.lit(crit)).alias("ok"),
                F.lit(f"critical={crit}").alias("detail"),
            )
        )

    if not parts:
        raise ValueError("spec enabled no checks")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("family", "subject", "metric")
