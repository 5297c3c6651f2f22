"""windowed_drift_scores (distributed per-window KS/chi²) vs numpy helpers."""

import math

import numpy as np
import pytest


def _np_scores(obs: dict, exp: dict, alpha=0.01):
    from open_data_linter_spark.rules.drift import (
        _align,
        chi2_critical,
        chi2_statistic,
        ks_critical,
        ks_statistic,
    )

    o, e = _align(obs, exp)
    ks = ks_statistic(o, e)
    ksc = ks_critical(o.sum(), e.sum(), alpha)
    chi2, dof = chi2_statistic(o, e)
    return ks, ksc, chi2, chi2_critical(dof, alpha)


def test_windowed_scores_match_numpy_per_window(spark):
    from open_data_linter_spark.rules.drift import windowed_drift_scores

    baseline = {1.0: 100, 2.0: 200, 3.0: 300, 4.0: 400}
    windows = {
        # same shape as baseline (scaled): no drift
        "w1": {1.0: 10, 2.0: 20, 3.0: 30, 4.0: 40},
        # heavily skewed: drift
        "w2": {1.0: 95, 2.0: 3, 3.0: 1, 4.0: 1},
        # tiny-n window
        "w3": {2.0: 2, 4.0: 1},
        # bin unseen in baseline: chi2 must go infinite
        "w4": {1.0: 10, 5.0: 5},
    }
    rows = [
        (w, b, c) for w, hist in windows.items() for b, c in hist.items()
    ]
    win_hist = spark.createDataFrame(rows, "win string, bin double, cnt long")
    base_df = spark.createDataFrame(
        [(b, c) for b, c in baseline.items()], "bin double, count long"
    )

    got = {
        r.win: r
        for r in windowed_drift_scores(
            win_hist, base_df, alpha=0.01, win_cols=("win",)
        ).collect()
    }
    assert set(got) == set(windows)

    for w, hist in windows.items():
        # align exactly like the batch rule does, over THIS window's bins
        # plus the baseline's (the grid adds all-window bins with o=0 —
        # zero-count bins change neither CDF gaps nor chi² terms)
        all_bins = {b: 0 for b in set().union(*[set(h) for h in windows.values()])}
        obs = {**all_bins, **hist}
        exp = {**{b: 0 for b in all_bins}, **baseline}
        ks, ksc, chi2, chi2c = _np_scores(obs, exp)
        r = got[w]
        assert r.ks_stat == pytest.approx(ks, abs=1e-12), w
        assert r.ks_crit == pytest.approx(ksc, abs=1e-12), w
        if math.isinf(chi2):
            assert math.isinf(r.chi2_stat), w
        else:
            assert r.chi2_stat == pytest.approx(chi2, rel=1e-12), w
        assert r.chi2_crit == pytest.approx(chi2c, rel=1e-12), w
        assert r.n == sum(hist.values()), w

    assert not got["w1"].ks_drifted and not got["w1"].chi2_drifted
    assert got["w2"].ks_drifted and got["w2"].chi2_drifted
    assert math.isinf(got["w4"].chi2_stat) and got["w4"].chi2_drifted


def test_windowed_scores_compose_with_streaming_histograms(spark, tmp_path):
    """End-to-end: windowed_histograms sink rows -> drift scores."""
    import datetime as dt

    from open_data_linter_spark.rules.drift import windowed_drift_scores
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    rows = []
    # window 0: balanced sr mix (like baseline); window 1: all 8000 (drift)
    for i in range(40):
        rows.append((base + dt.timedelta(seconds=i), 16000 if i % 2 else 44100))
    for i in range(40):
        rows.append((base + dt.timedelta(minutes=5, seconds=i), 8000))
    df = spark.createDataFrame(rows, "ingest_ts timestamp, sr_hz int")
    win_hist = (
        df.groupBy(F.window("ingest_ts", "1 minute").alias("win"), F.col("sr_hz").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"),
                "bin", "cnt")
    )
    baseline = spark.createDataFrame(
        [(16000.0, 500), (44100.0, 500)], "bin double, count long"
    )
    out = {r.win_start: r for r in windowed_drift_scores(win_hist, baseline).collect()}
    assert len(out) == 2
    assert not out[base].ks_drifted
    drifted = out[base + dt.timedelta(minutes=5)]
    assert drifted.ks_drifted and math.isinf(drifted.chi2_stat)


def test_windowed_scores_property_random_histograms(spark):
    """Hypothesis-style randomized parity (fixed seeds, one Spark round-trip).

    Random per-window histograms — including zero counts, bins absent from
    the baseline, and near-empty windows — must match the numpy helpers
    bin-for-bin. One batched collect keeps Spark overhead at a single job.
    """
    import numpy as np

    from open_data_linter_spark.rules.drift import windowed_drift_scores

    rng = np.random.default_rng(20260816)
    all_bins = [float(b) for b in range(1, 9)]
    baseline = {b: int(rng.integers(0, 50)) for b in all_bins}
    baseline = {b: c for b, c in baseline.items() if c > 0} or {1.0: 10}

    windows = {}
    for w in range(24):
        nbins = int(rng.integers(1, len(all_bins) + 1))
        chosen = rng.choice(all_bins, size=nbins, replace=False)
        hist = {float(b): int(rng.integers(0, 40)) for b in chosen}
        hist = {b: c for b, c in hist.items() if c > 0}
        if not hist:
            hist = {float(rng.choice(all_bins)): 1}
        windows[f"w{w}"] = hist

    rows = [(w, b, c) for w, h in windows.items() for b, c in h.items()]
    win_hist = spark.createDataFrame(rows, "win string, bin double, cnt long")
    base_df = spark.createDataFrame(
        [(b, c) for b, c in baseline.items()], "bin double, count long"
    )
    got = {
        r.win: r
        for r in windowed_drift_scores(
            win_hist, base_df, alpha=0.01, win_cols=("win",)
        ).collect()
    }
    assert set(got) == set(windows)

    grid_bins = sorted(
        set(baseline) | {b for h in windows.values() for b in h}
    )
    for w, hist in windows.items():
        obs = {b: hist.get(b, 0) for b in grid_bins}
        exp = {b: baseline.get(b, 0) for b in grid_bins}
        ks, ksc, chi2, chi2c = _np_scores(obs, exp)
        r = got[w]
        assert r.ks_stat == pytest.approx(ks, abs=1e-10), w
        assert r.ks_crit == pytest.approx(ksc, abs=1e-10), w
        if math.isinf(chi2):
            assert math.isinf(r.chi2_stat), w
        else:
            assert r.chi2_stat == pytest.approx(chi2, rel=1e-10), w
        assert r.chi2_crit == pytest.approx(chi2c, rel=1e-10), w
