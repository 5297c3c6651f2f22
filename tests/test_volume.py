"""Ingestion-volume anomalies (rules/volume.py)."""

import datetime

import pytest

from open_data_linter_spark.rules.volume import volume_anomalies


def _mk_events(spark, day_counts, base="2024-03-"):
    rows = []
    for day, n in day_counts.items():
        for i in range(n):
            rows.append((f"{base}{day:02d} 0{i % 10}:0{i % 6}:0{i % 6}",))
    rows.append((None,))  # NULL event times never count toward a bucket
    return spark.createDataFrame(rows, "ts string").selectExpr(
        "try_cast(ts AS timestamp_ntz) AS ts"
    )


def _expected_z(counts, x):
    ns = sorted(counts)
    k = (len(ns) + 1) // 2 - 1
    med = ns[k]
    mad = sorted(abs(v - med) for v in ns)[k]
    return round(0.6745 * (x - med) / mad, 6)


def test_volume_day_outage_flagged(spark):
    day_counts = {d: 100 + (d % 7) for d in range(1, 21)}
    day_counts[12] = 9  # simulated ingestion outage
    out = volume_anomalies(_mk_events(spark, day_counts), "ts").collect()
    assert [(r.bucket, r.n_rows) for r in out] == [
        (datetime.date(2024, 3, 12), 9.0)
    ]
    assert out[0].z == pytest.approx(
        _expected_z(list(day_counts.values()), 9), abs=1e-9
    )


def test_volume_clean_series_empty_and_bucket_is_date(spark):
    day_counts = {d: 100 + (d % 7) for d in range(1, 21)}
    df = volume_anomalies(_mk_events(spark, day_counts), "ts")
    assert df.schema["bucket"].dataType.simpleString() == "date"
    assert df.count() == 0


def test_volume_hour_grain_keeps_timestamp_bucket(spark):
    # 20 busy hours + one trickle hour inside one day
    rows = [(f"2024-03-01 {h:02d}:00:{i % 50 + 10 - (h % 5):02d}",)
            for h in range(20) for i in range(40 + h % 5)]
    rows += [("2024-03-01 20:30:00",)]
    df = spark.createDataFrame(rows, "ts string").selectExpr(
        "try_cast(ts AS timestamp_ntz) AS ts"
    )
    out = volume_anomalies(df, "ts", grain="hour").collect()
    assert [(r.bucket, r.n_rows) for r in out] == [
        (datetime.datetime(2024, 3, 1, 20), 1.0)
    ]


def test_volume_constant_series_raises_mad_zero(spark):
    with pytest.raises(ValueError, match="MAD"):
        volume_anomalies(
            _mk_events(spark, {d: 50 for d in range(1, 11)}), "ts"
        ).collect()
