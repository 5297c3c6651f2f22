"""Per-segment null-rate anomalies (rules/group_nulls.py)."""

import pytest

from open_data_linter_spark.rules.group_nulls import group_null_anomalies


def _mk(spark, rates_by_group, n=100):
    rows = []
    for g, rate in rates_by_group.items():
        k = int(n * rate)
        rows += [(g, None)] * k + [(g, "x")] * (n - k)
    return spark.createDataFrame(rows, "g string, email string")


def test_outlier_partner_flags(spark):
    df = _mk(
        spark,
        {"p1": 0.02, "p2": 0.03, "p3": 0.01, "p4": 0.02, "p5": 0.40},
    )
    out = {r["g"]: r for r in group_null_anomalies(df, "email", ["g"]).collect()}
    assert out["p5"]["flagged"] and out["p5"]["z"] > 3.5
    assert not any(out[g]["flagged"] for g in ("p1", "p2", "p3", "p4"))
    assert out["p5"]["null_rate"] == pytest.approx(0.40)
    assert out["p5"]["n_rows"] == 100 and out["p5"]["n_nulls"] == 40
    # z is SIGNED: a suspiciously-complete group scores negative
    assert out["p3"]["z"] < 0


def test_mad_zero_degenerates_to_ceiling(spark):
    # four identical groups -> MAD 0 -> z NULL; the absolute ceiling
    # still catches the breach
    df = _mk(spark, {"a": 0.5, "b": 0.5, "c": 0.5, "d": 0.5})
    out = group_null_anomalies(df, "email", ["g"], max_rate=0.3).collect()
    assert all(r["z"] is None for r in out)
    assert all(r["flagged"] for r in out)
    ok = group_null_anomalies(df, "email", ["g"], max_rate=0.6).collect()
    assert not any(r["flagged"] for r in ok)


def test_validation(spark):
    df = _mk(spark, {"a": 0.1})
    with pytest.raises(ValueError, match="non-empty"):
        group_null_anomalies(df, "email", [])
    with pytest.raises(ValueError, match="max_rate"):
        group_null_anomalies(df, "email", ["g"], max_rate=2.0)


def test_plan_one_input_exchange(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "gn")
    _mk(spark, {"a": 0.1}).write.parquet(p)
    out = group_null_anomalies(spark.read.parquet(p), "email", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_count" in plan, plan  # rate agg combines map-side
