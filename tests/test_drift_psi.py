"""PSI drift vs an independent pure-Python computation."""

import math

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.drift_psi import bin_by_edges, psi_by_group

EDGES = [10.0, 20.0, 30.0]
ROWS = [
    # group a: uniform-ish across bins  (baseline-like)
    ("a", 5.0), ("a", 12.0), ("a", 25.0), ("a", 35.0), ("a", 15.0),
    ("a", None),
    # group b: mass shifted to the top bin
    ("b", 31.0), ("b", 32.0), ("b", 33.0), ("b", 34.0), ("b", 12.0),
    # group c: single row
    ("c", 5.0),
]


def ref_psi(rows, edges, alpha=0.5, baseline_groups=None):
    def bin_of(v):
        for i, e in enumerate(edges):
            if v < e:
                return i
        return len(edges)

    nb_bins = len(edges) + 1
    vals = [(g, bin_of(v)) for g, v in rows if v is not None]
    base = [b for g, b in vals if baseline_groups is None or g in baseline_groups]
    bc = [base.count(i) for i in range(nb_bins)]
    out = {}
    for g in {g for g, _ in vals}:
        cur = [b for gg, b in vals if gg == g]
        cc = [cur.count(i) for i in range(nb_bins)]
        n, nb = len(cur), len(base)
        psi = 0.0
        for i in range(nb_bins):
            p = (cc[i] + alpha) / (n + alpha * nb_bins)
            q = (bc[i] + alpha) / (nb + alpha * nb_bins)
            psi += (p - q) * math.log(p / q)
        out[g] = (n, round(psi, 6))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "src string, v double")


def test_matches_reference_global_baseline(df):
    got = {
        r.src: (r.n_rows, r.psi)
        for r in psi_by_group(df, "v", "src", EDGES).collect()
    }
    want = ref_psi(ROWS, EDGES)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=2e-6)


def test_baseline_filter(df):
    got = {
        r.src: r.psi
        for r in psi_by_group(
            df, "v", "src", EDGES, baseline_filter=F.col("src") == "a"
        ).collect()
    }
    want = ref_psi(ROWS, EDGES, baseline_groups={"a"})
    for g in want:
        assert got[g] == pytest.approx(want[g][1], abs=2e-6)
    # the baseline group scores ~0 against itself; the shifted group high
    assert got["a"] < 0.05 < got["b"]


def test_shifted_group_scores_higher(df):
    got = {r.src: r.psi for r in psi_by_group(df, "v", "src", EDGES).collect()}
    assert got["b"] > got["a"]


def test_bin_edges_contract(spark):
    df = spark.createDataFrame(
        [(0.0,), (10.0,), (19.9,), (30.0,), (99.0,)], "v double"
    )
    got = [
        r.b for r in df.select(bin_by_edges(F.col("v"), EDGES).alias("b"))
        .orderBy("v").collect()
    ]
    assert got == [0, 1, 1, 3, 3]  # left-closed bins, open-ended outer


def test_null_group_key_excluded(spark):
    """A NULL group key must not appear as a group NOR leak into the
    baseline (the null-unsafe dense-join would otherwise report it as an
    empty group scored against a baseline containing its own rows)."""
    rows = [(None, 12.0), (None, 25.0), ("a", 5.0), ("a", 15.0)]
    df = spark.createDataFrame(rows, "src string, v double")
    got = {r.src: (r.n_rows, r.psi) for r in psi_by_group(df, "v", "src", EDGES).collect()}
    assert set(got) == {"a"}
    want = ref_psi([("a", 5.0), ("a", 15.0)], EDGES)
    assert got["a"][0] == want["a"][0]
    assert got["a"][1] == pytest.approx(want["a"][1], abs=2e-6)


def test_validation(df):
    with pytest.raises(ValueError, match="ascending"):
        psi_by_group(df, "v", "src", [3.0, 1.0])
    with pytest.raises(ValueError, match="alpha"):
        psi_by_group(df, "v", "src", EDGES, alpha=0.0)
