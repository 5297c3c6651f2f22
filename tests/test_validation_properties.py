"""Randomized differentials for the round-4 validation operators:
reconcile classification vs a dict-based Python reference, constraint
counters vs hand counting over generated rows. Few examples, each a
single Spark job — the suite stays fast while the input space (NULLs,
empty strings, separator bytes, duplicate keys) is explored for real.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401

from open_data_linter_spark.rules.constraints import check_constraints
from open_data_linter_spark.rules.reconcile import reconcile_counts

VALUE = st.one_of(
    st.none(),
    st.text(
        alphabet="ab:\x00\x01\\\"字 ", min_size=0, max_size=4
    ),
)
ROW = st.tuples(st.integers(min_value=0, max_value=9), VALUE, VALUE)
SIDE = st.lists(ROW, min_size=0, max_size=16)


def _ref_reconcile(old_rows, new_rows):
    """Dict-based reference: per-key multiset of (a, b) content tuples."""
    from collections import Counter

    def fold(rows):
        m = {}
        for k, a, b in rows:
            m.setdefault(k, Counter())[(a, b)] += 1
        return m

    o, n = fold(old_rows), fold(new_rows)
    out = {"inserted": 0, "deleted": 0, "updated": 0, "unchanged": 0}
    for k in set(o) | set(n):
        if k not in o:
            out["inserted"] += 1
        elif k not in n:
            out["deleted"] += 1
        elif o[k] != n[k]:
            out["updated"] += 1
        else:
            out["unchanged"] += 1
    return out


@settings(max_examples=6, deadline=None)
@given(SIDE, SIDE)
def test_reconcile_matches_multiset_reference(spark, old_rows, new_rows):
    schema = "k long, a string, b string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {
        r["change"]: r["n_keys"]
        for r in reconcile_counts(
            old, new, "k", allow_dup_keys=True
        ).collect()
    }
    assert got == _ref_reconcile(old_rows, new_rows)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), VALUE),
                min_size=0, max_size=20))
def test_constraint_counters_match_hand_counts(spark, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    suite = [
        {"kind": "not_null", "column": "v", "id": "nn"},
        {"kind": "unique", "column": "k", "id": "uq"},
        {"kind": "in_set", "column": "v", "values": ["a", "b"], "id": "st"},
        {"kind": "range", "column": "k", "min": 1, "max": 4, "id": "rg"},
    ]
    got = {r["constraint_id"]: (r["n_checked"], r["n_violations"])
           for r in check_constraints(df, suite).collect()}
    n = len(rows)
    ks = [k for k, _ in rows]
    vs = [v for _, v in rows]
    assert got["nn"] == (n, sum(v is None for v in vs))
    assert got["uq"] == (len(ks), len(ks) - len(set(ks)))
    assert got["st"] == (
        n, sum(v is not None and v not in ("a", "b") for v in vs)
    )
    assert got["rg"] == (n, sum(not (1 <= k <= 4) for k in ks))
