"""CUSUM change-point rule (rules/changepoint.py)."""

from datetime import datetime, timedelta

import pytest

from open_data_linter_spark.rules.changepoint import cusum_shifts


def _mk(spark, counts_by_day, g="a"):
    """One row per event: day i gets counts_by_day[i] rows."""
    rows = []
    for i, n in enumerate(counts_by_day):
        for j in range(n):
            rows.append((g, datetime(2024, 1, 1 + i, 8, 0) + timedelta(seconds=j)))
    return spark.createDataFrame(rows, "g string, t timestamp")


def _cusum_py(xs, k):
    """Reference recursion for the closed-form check."""
    import statistics

    mu = statistics.mean(xs)
    sd = statistics.stdev(xs)
    sp = sn = 0.0
    out = []
    for x in xs:
        z = (x - mu) / sd
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        out.append((sp, sn))
    return out


def test_closed_form_equals_recursion(spark):
    counts = [20, 22, 19, 21, 20, 22, 18, 21, 10, 11, 9, 10, 11, 10]
    got = {
        r["bucket"].day: (r["s_pos"], r["s_neg"])
        for r in cusum_shifts(
            _mk(spark, counts), "t", ["g"], k=0.5, h=0.0001
        ).collect()
    }
    want = _cusum_py([float(c) for c in counts], 0.5)
    for day, (sp, sn) in got.items():
        esp, esn = want[day - 1]
        assert sp == pytest.approx(esp, abs=1e-9)
        assert sn == pytest.approx(esn, abs=1e-9)


def test_sustained_drop_alarms_down_not_spike_rule(spark):
    # level drops 20% for the last 6 days: no single day is a spike,
    # but CUSUM accumulates the shift and alarms
    counts = [50, 51, 49, 50, 52, 48, 50, 51, 40, 41, 39, 40, 41, 40]
    out = cusum_shifts(_mk(spark, counts), "t", ["g"], k=0.5, h=3.0).collect()
    assert out, "sustained shift must alarm"
    assert all(r["direction"] == "down" for r in out)
    assert min(r["bucket"].day for r in out) >= 9  # alarms only post-shift


def test_stable_series_is_silent_and_constant_is_null_safe(spark):
    stable = [50, 51, 49, 50, 52, 48, 50, 51, 49, 50]
    assert cusum_shifts(_mk(spark, stable), "t", ["g"], h=4.0).count() == 0
    const = [50] * 10  # zero variance -> NULL z -> never alarms
    assert cusum_shifts(_mk(spark, const), "t", ["g"], h=4.0).count() == 0


def test_groups_are_independent(spark):
    shifted = _mk(spark, [50, 50, 50, 50, 50, 20, 20, 20, 20, 20], g="bad")
    stable = _mk(spark, [50, 51, 49, 50, 52, 48, 50, 51, 49, 50], g="ok")
    # a 5/5 split self-standardizes to |z| ≈ 0.95, so S grows ~0.45/day
    out = cusum_shifts(shifted.union(stable), "t", ["g"], h=2.0).collect()
    assert out and {r["g"] for r in out} == {"bad"}


def test_mean_mode_and_validation(spark):
    df = _mk(spark, [5, 5, 5, 5])
    with pytest.raises(ValueError, match="bucket"):
        cusum_shifts(df, "t", ["g"], bucket="fortnight")
    with pytest.raises(ValueError, match="h > 0"):
        cusum_shifts(df, "t", ["g"], h=0)
    # value_col mode runs (means constant here -> silent)
    vdf = df.withColumn("v", df.t.cast("double").cast("long") * 0 + 1.0)
    assert cusum_shifts(vdf, "t", ["g"], value_col="v", h=1.0).count() == 0


def test_plan_one_input_exchange_one_window_sort(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "cp")
    _mk(spark, [3, 3, 3]).write.parquet(p)
    out = cusum_shifts(spark.read.parquet(p), "t", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_count" in plan, plan  # series agg combines map-side
    # the three chained window stages share one partitioning: no extra
    # hash exchange beyond the series aggregate + window
    assert plan.count("Exchange hashpartitioning") <= 2, plan
