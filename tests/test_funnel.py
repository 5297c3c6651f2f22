"""Funnel analysis (functions/funnel.py)."""

from datetime import datetime

import pytest

from open_data_linter_spark.functions.funnel import funnel_counts, funnel_levels

STEPS = ["signup", "click", "purchase"]


def _t(m):
    return datetime(2024, 1, 1, 12, m)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u int, t timestamp, y string")


def _levels(spark, rows):
    return {
        r["user"]: r["level"]
        for r in funnel_levels(_mk(spark, rows), "u", "t", "y", STEPS).collect()
    }


def test_greedy_chain_levels(spark):
    rows = [
        # full funnel in order
        (1, _t(0), "signup"), (1, _t(1), "click"), (1, _t(2), "purchase"),
        # out of order: purchase BEFORE signup never chains
        (2, _t(0), "purchase"), (2, _t(1), "signup"),
        # step events but never step 1
        (3, _t(0), "click"), (3, _t(1), "purchase"),
        # repeats: second click after failed first still chains
        (4, _t(0), "signup"), (4, _t(1), "click"), (4, _t(3), "click"),
        (4, _t(4), "purchase"),
        # irrelevant types between steps are ignored
        (5, _t(0), "signup"), (5, _t(1), "view"), (5, _t(2), "click"),
    ]
    lv = _levels(spark, rows)
    assert lv == {1: 3, 2: 1, 3: 0, 4: 3, 5: 2}


def test_equal_timestamps_never_chain(spark):
    rows = [(1, _t(0), "signup"), (1, _t(0), "click")]
    assert _levels(spark, rows) == {1: 1}


def test_greedy_is_reachability_not_trap(spark):
    # earliest signup at t0; click only BEFORE it except one after:
    # greedy must use the later click, not give up
    rows = [
        (1, _t(0), "click"),
        (1, _t(1), "signup"),
        (1, _t(2), "click"),
    ]
    assert _levels(spark, rows) == {1: 2}


def test_counts_zero_fill_and_frac(spark):
    rows = [
        (1, _t(0), "signup"), (1, _t(1), "click"), (1, _t(2), "purchase"),
        (2, _t(0), "signup"), (2, _t(1), "click"),
        (3, _t(0), "signup"),
        (4, _t(0), "click"),  # level 0: counted nowhere
    ]
    out = funnel_counts(_mk(spark, rows), "u", "t", "y", STEPS).collect()
    assert [(r["step_idx"], r["step"], r["n_users"]) for r in out] == [
        (1, "signup", 3),
        (2, "click", 2),
        (3, "purchase", 1),
    ]
    assert [r["frac_of_first"] for r in out] == [1.0, pytest.approx(2 / 3), pytest.approx(1 / 3)]
    # nobody purchases -> zero-filled row, frac 0
    out2 = funnel_counts(
        _mk(spark, rows[3:]), "u", "t", "y", STEPS
    ).collect()
    assert (out2[2]["n_users"], out2[2]["frac_of_first"]) == (0, 0.0)


def test_event_cap_undercounts_late_chains(spark):
    rows = [(1, _t(m), "view") for m in range(3)]  # filtered out anyway
    rows += [(1, _t(10), "signup"), (1, _t(11), "click"), (1, _t(12), "purchase")]
    full = funnel_levels(_mk(spark, rows), "u", "t", "y", STEPS).collect()
    assert full[0]["level"] == 3
    capped = funnel_levels(
        _mk(spark, rows), "u", "t", "y", STEPS, max_events_per_user=2
    ).collect()
    assert capped[0]["level"] == 2  # purchase beyond the cap


def test_input_validation(spark):
    df = _mk(spark, [(1, _t(0), "signup")])
    with pytest.raises(ValueError, match="two steps"):
        funnel_levels(df, "u", "t", "y", ["signup"])
    with pytest.raises(ValueError, match="duplicate"):
        funnel_levels(df, "u", "t", "y", ["a", "a"])


def test_plan_filter_pushed_and_single_shuffle(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "fev")
    _mk(spark, [(1, _t(0), "signup")]).write.parquet(p)
    out = funnel_levels(spark.read.parquet(p), "u", "t", "y", STEPS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # the type filter reaches the scan (the big pre-shuffle reduction)
    assert "PushedFilters: [IsNotNull(t), In(y" in plan.replace("`", ""), plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
