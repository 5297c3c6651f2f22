"""Sequence packing: next-fit token-budget bins, layout-independent."""

from pyspark.sql import functions as F


def _ref_pack(rows, budget, range_size=100, stride=1_000_000):
    """In-test reference: plain python next-fit per explicit range."""
    out = {}
    by_rng = {}
    for i, tok in sorted(rows):
        by_rng.setdefault(i // range_size, []).append((i, tok))
    for rng, docs in by_rng.items():
        seq, filled = 0, 0
        for i, tok in docs:
            if filled > 0 and filled + tok > budget:
                seq, filled = seq + 1, tok
            else:
                filled += tok
            out[i] = rng * stride + seq
    return out


def test_pack_matches_reference_and_constraints(spark):
    import numpy as np

    from open_data_linter_spark.functions.packing import (
        pack_sequences,
        packing_stats,
    )

    rng = np.random.default_rng(3)
    rows = [
        (int(i), " ".join(["w"] * int(rng.integers(1, 200))))
        for i in range(250)
    ]
    rows.append((250, " ".join(["w"] * 800)))  # oversized: own bin
    rows.append((251, ""))                      # empty doc: 0 tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, budget=512, range_size=100)
    got = {r.id: r.bin_id for r in packed.collect()}
    want = _ref_pack(
        [(i, 0 if not t else len(t.split())) for i, t in rows], 512
    )
    assert got == want
    # constraint summary: every doc assigned once, no multi-doc bin above
    # budget, totals exact
    s = packing_stats(packed, 512).collect()[0]
    assert s.n_docs == 252
    assert s.invalid_overflow_bins == 0
    assert s.max_bin_tokens == 800  # the oversized single-doc bin
    assert s.total_tokens == sum(0 if not t else len(t.split()) for _, t in rows)


def test_pack_layout_independent(spark):
    from open_data_linter_spark.functions.packing import pack_sequences

    rows = [(int(i), " ".join(["w"] * (i % 37 + 1))) for i in range(300)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df8 = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string"
    ).repartition(8)
    a = sorted((r.id, r.bin_id) for r in pack_sequences(df1, 256).collect())
    b = sorted((r.id, r.bin_id) for r in pack_sequences(df8, 256).collect())
    assert a == b  # partitioning and input order don't change the packing
