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
    correlation   {"cols": [...], "threshold"?}  — |r|≥threshold pairs
                                                   fail (derived/redundant)
    null_patterns {"cols": [...], "max_frac"?}   — missingness combos;
                                                   non-complete pattern
                                                   above max_frac fails
    trend      {"ts_col", "group_cols"?, "value_col"?, "bucket"?,
                "t_crit"?}                       — OLS drift screen
    cusum      {"ts_col", "group_cols"?, "value_col"?, "bucket"?,
                "k"?, "h"?}                      — level-shift alarms
    intervals  {"key_cols", "start_col", "end_col", "report_gaps"?}
                                                 — SCD2 range violations
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

    if "correlation" in spec:
        from open_data_linter_spark.rules.correlation import correlation_matrix

        cs = spec["correlation"]
        cols = list(cs["cols"])
        if _touches_broken(cols):
            parts.append(_skip("correlation", ",".join(cols)))
        else:
            out = correlation_matrix(df, cols, cs.get("threshold", 0.95))
            parts.append(
                out.select(
                    F.lit("correlation").alias("family"),
                    F.concat_ws("~", "col_x", "col_y").alias("subject"),
                    F.lit("corr").alias("metric"),
                    F.round("corr", 6).alias("value"),
                    (~F.col("high_corr")).alias("ok"),
                    F.concat(
                        F.lit("n_pairs="), F.col("n_pairs").cast("string")
                    ).alias("detail"),
                )
            )

    if "null_patterns" in spec:
        from open_data_linter_spark.rules.nullpattern import null_patterns

        ns = spec["null_patterns"]
        cols = list(ns["cols"])
        if _touches_broken(cols):
            parts.append(_skip("null_patterns", ",".join(cols)))
        else:
            out = null_patterns(df, cols)
            max_frac = float(ns.get("max_frac", 1.0))
            parts.append(
                out.select(
                    F.lit("null_patterns").alias("family"),
                    F.coalesce(
                        F.nullif(F.col("pattern"), F.lit("")),
                        F.lit("<complete>"),
                    ).alias("subject"),
                    F.lit("frac").alias("metric"),
                    F.col("frac").alias("value"),
                    (
                        (F.col("pattern") == "")
                        | (F.col("frac") <= F.lit(max_frac))
                    ).alias("ok"),
                    F.concat(
                        F.lit("n_rows="), F.col("n_rows").cast("string")
                    ).alias("detail"),
                )
            )

    if "trend" in spec:
        from open_data_linter_spark.rules.trend import group_trends

        tr = spec["trend"]
        groups = list(tr.get("group_cols", []))
        touched = [tr["ts_col"], *groups] + (
            [tr["value_col"]] if tr.get("value_col") else []
        )
        if _touches_broken(touched):
            parts.append(_skip("trend", tr["ts_col"]))
        else:
            out = group_trends(
                df,
                tr["ts_col"],
                groups,
                bucket=tr.get("bucket", "day"),
                value_col=tr.get("value_col"),
                t_crit=tr.get("t_crit", 4.0),
            )
            parts.append(
                out.select(
                    F.lit("trend").alias("family"),
                    F.concat_ws(
                        "/", *[F.col(g).cast("string") for g in groups]
                    ).alias("subject"),
                    F.lit("t_stat").alias("metric"),
                    F.round("t_stat", 6).alias("value"),
                    (~F.col("trending")).alias("ok"),
                    F.concat(
                        F.lit("slope_per_day="),
                        F.round("slope_per_day", 6).cast("string"),
                    ).alias("detail"),
                )
            )

    if "cusum" in spec:
        from open_data_linter_spark.rules.changepoint import cusum_shifts

        cu = spec["cusum"]
        groups = list(cu.get("group_cols", []))
        touched = [cu["ts_col"], *groups] + (
            [cu["value_col"]] if cu.get("value_col") else []
        )
        if _touches_broken(touched):
            parts.append(_skip("cusum", cu["ts_col"]))
        else:
            out = cusum_shifts(
                df,
                cu["ts_col"],
                groups,
                bucket=cu.get("bucket", "day"),
                value_col=cu.get("value_col"),
                k=cu.get("k", 0.5),
                h=cu.get("h", 5.0),
            )
            parts.append(
                out.select(
                    F.lit("cusum").alias("family"),
                    F.concat_ws(
                        "/",
                        *[F.col(g).cast("string") for g in groups],
                        F.col("bucket").cast("string"),
                    ).alias("subject"),
                    F.lit("s").alias("metric"),
                    F.round(
                        F.greatest("s_pos", "s_neg"), 6
                    ).alias("value"),
                    F.lit(False).alias("ok"),  # emitted rows ARE alarms
                    F.concat(F.lit("direction="), F.col("direction")).alias(
                        "detail"
                    ),
                )
            )

    if "intervals" in spec:
        from open_data_linter_spark.rules.intervals import (
            check_interval_integrity,
        )

        iv = spec["intervals"]
        keys = list(iv["key_cols"])
        if _touches_broken([*keys, iv["start_col"], iv["end_col"]]):
            parts.append(_skip("intervals", ",".join(keys)))
        else:
            out = check_interval_integrity(
                df,
                keys,
                iv["start_col"],
                iv["end_col"],
                report_gaps=iv.get("report_gaps", True),
            )
            parts.append(
                out.select(
                    F.lit("intervals").alias("family"),
                    F.concat_ws(
                        "/", *[F.col(k).cast("string") for k in keys]
                    ).alias("subject"),
                    F.col("kind").alias("metric"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(False).alias("ok"),  # emitted rows ARE violations
                    F.concat(
                        F.lit("start="), F.col("start").cast("string")
                    ).alias("detail"),
                )
            )

    if not parts:
        raise ValueError("spec enabled no checks")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("family", "subject", "metric")
