"""table_health_report facade (rules/health.py)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.health import table_health_report


def _events(spark):
    rows = []
    for d in range(1, 15):
        n = 40 + (d % 5) + (0 if d != 7 else -38)  # day 7: outage
        for i in range(n):
            rows.append((d * 1000 + i, f"2024-02-{d:02d} 0{i % 10}:00:{i % 60:02d}",
                         "error" if i % 3 == 0 else "view", float(i)))
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double")
    return df.withColumn("ts", F.expr("try_cast(ts AS timestamp_ntz)"))


SPEC = {
    "schema": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "event_type": "string",
        "value": "double",
    },
    "metrics": ["event_type", "event_id"],
    "fds": [{"determinant": ["event_id"], "dependents": ["event_type"]}],
    "freshness": {"ts_col": "ts", "group_cols": ["event_type"],
                  "max_lag_s": 86400},
    "volume": {"ts_col": "ts"},
    "benford": {"event_id": None},
}


def test_health_report_all_families(spark):
    rep = table_health_report(_events(spark), SPEC).collect()
    fams = {r.family for r in rep}
    assert fams == {"schema", "metrics", "fd", "freshness", "volume", "benford"}
    # schema all ok
    assert all(r.ok for r in rep if r.family == "schema")
    # profiling metrics carry no verdict
    assert all(r.ok is None for r in rep if r.family == "metrics")
    assert {r.metric for r in rep if r.family == "metrics"} == {
        "null_count", "distinctness", "uniqueness", "entropy"}
    # event_id is a key: its FD holds
    fd = next(r for r in rep if r.family == "fd")
    assert fd.subject == "event_id -> event_type" and fd.ok and fd.value == 1.0
    # both groups fresh within a day of the frontier
    assert all(r.ok for r in rep if r.family == "freshness")
    # the day-7 outage is the one volume anomaly, reported as a failure
    vol = [r for r in rep if r.family == "volume"]
    assert len(vol) == 1 and vol[0].ok is False and "2024-02-07" in vol[0].subject
    # event_id first digits are uniform-ish, nowhere near Benford
    ben = next(r for r in rep if r.family == "benford")
    assert ben.ok is False and ben.value > 26.124


def test_health_schema_gate_skips_broken_columns(spark):
    df = _events(spark)
    spec = {
        "schema": {"event_id": "string",  # mismatch -> event_id is broken
                   "ts": "timestamp_ntz", "event_type": "string",
                   "value": "double"},
        "metrics": ["event_id", "event_type"],
        "fds": [{"determinant": ["event_id"], "dependents": ["event_type"]}],
        "volume": {"ts_col": "ts"},
        "benford": {"event_id": None},
    }
    rep = table_health_report(df, spec).collect()
    skipped = {(r.family, r.metric) for r in rep if r.metric == "skipped"}
    assert {"fd", "benford", "metrics"} <= {f for f, _ in skipped}
    # event_type metrics still ran; volume (ts only) unaffected by the gate
    assert any(r.family == "metrics" and r.subject == "event_type"
               and r.metric == "entropy" for r in rep)
    assert any(r.family == "volume" for r in rep)
    # gate=False runs everything
    rep2 = table_health_report(df, spec, gate=False).collect()
    assert not any(r.metric == "skipped" for r in rep2)


def test_health_empty_spec_raises(spark):
    with pytest.raises(ValueError):
        table_health_report(_events(spark), {})


def test_health_round5_families(spark):
    """The round-5 analysis families compose into the same long form:
    correlation (a planted derived column fails), null patterns (a
    planted joint-missing pattern fails its max_frac), trend (value
    drifts upward by construction: value=i within growing days),
    cusum and intervals ride along."""
    df = (
        _events(spark)
        .withColumn("value2", F.col("value") * 2 + 1)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 17 != 0, F.col("value")),
        )
        .withColumn(
            "props",
            F.when(F.col("event_id") % 17 != 0, F.lit("p")),
        )
        .withColumn("end_ts", F.expr("ts + INTERVAL 10 MINUTES"))
    )
    spec = {
        "correlation": {"cols": ["value", "value2"], "threshold": 0.95},
        "null_patterns": {"cols": ["value", "props"], "max_frac": 0.01},
        "trend": {"ts_col": "ts", "group_cols": ["event_type"],
                  "value_col": "value"},
        "cusum": {"ts_col": "ts", "group_cols": ["event_type"],
                  "value_col": "value", "h": 50.0},
        "intervals": {"key_cols": ["event_type"], "start_col": "ts",
                      "end_col": "end_ts"},
    }
    rep = table_health_report(df, spec).collect()
    fams = {r.family for r in rep}
    assert {"correlation", "null_patterns", "trend", "intervals"} <= fams
    corr = next(r for r in rep if r.family == "correlation")
    assert corr.subject == "value~value2" and corr.ok is False
    pats = {r.subject: r for r in rep if r.family == "null_patterns"}
    assert pats["<complete>"].ok is True
    assert pats["value,props"].ok is False  # joint pattern over max_frac
    assert all(
        r.ok is False for r in rep if r.family in ("cusum", "intervals")
    )
    # overlapping 10-min intervals within each type exist by construction
    assert any(r.family == "intervals" and r.metric == "overlap" for r in rep)

    # the gate skips the new families when their columns break
    spec2 = {"schema": {"value": "string", "ts": "timestamp_ntz"}, **spec}
    rep2 = table_health_report(df, spec2).collect()
    skipped = {r.family for r in rep2 if r.metric == "skipped"}
    assert {"correlation", "null_patterns", "trend", "cusum"} <= skipped
    assert "intervals" not in skipped  # its columns are intact
