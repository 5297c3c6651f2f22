"""Sequence-continuity gaps (rules/sequence.py)."""

from open_data_linter_spark.rules.sequence import check_sequence


def _gaps_py(present):
    xs = sorted(set(present))
    return [
        (p + 1, n - 1, n - p - 1)
        for p, n in zip(xs, xs[1:])
        if n - p > 1
    ]


def test_grouped_gaps_duplicates_and_nulls(spark):
    rows = [
        ("a", 1), ("a", 2), ("a", 2), ("a", 5),   # dup is not a gap; [3,4] is
        ("b", 10), ("b", 11),                     # dense: no gap
        ("c", 7), ("c", None), ("c", 9),          # NULL ignored: [8,8]
    ]
    out = check_sequence(
        spark.createDataFrame(rows, "g string, s int"), "s", ["g"]
    ).collect()
    assert [tuple(r) for r in out] == [("a", 3, 4, 2), ("c", 8, 8, 1)]


def test_global_gaps_match_reference_with_missing_bucket(spark):
    present = [x for x in range(1000)
               if x % 97 != 3 and not (128 <= x < 256) and x != 511]
    df = spark.createDataFrame([(x,) for x in present], "s long")
    out = check_sequence(df, "s", bucket_size=64).collect()
    assert [tuple(r) for r in out] == _gaps_py(present)
    # the whole-bucket hole [128,255] must surface as ONE inter-bucket gap
    assert (128, 255, 128) in [tuple(r) for r in out]
    # and the boundary-spanning single hole (511 ends its bucket) too
    assert (511, 511, 1) in [tuple(r) for r in out]


def test_global_adjacent_across_bucket_boundary_is_not_a_gap(spark):
    df = spark.createDataFrame([(63,), (64,), (70,)], "s long")
    out = check_sequence(df, "s", bucket_size=64).collect()
    assert [tuple(r) for r in out] == [(65, 69, 5)]


def test_output_types_are_bigint(spark):
    df = spark.createDataFrame([(1,), (5,)], "s int")
    sch = {f.name: f.dataType.simpleString()
           for f in check_sequence(df, "s").schema.fields}
    assert sch == {"gap_start": "bigint", "gap_end": "bigint",
                   "n_missing": "bigint"}
