"""Fuzzy join on edit distance: record linkage for noisy string keys.

The reference can only reject a malformed key (``csv_linter.py``'s
domain/RI checks); linking the dirty record back to its catalog entry
is the repair step every ingest pipeline wants. A naive fuzzy join is
the quadratic ``levenshtein(l, r) <= d`` cross product — 10^6 × 10^6
rows is 10^12 comparisons, never viable.

Spark-first design — PassJoin partitioning (Li, Deng, Feng 2011;
public algorithm), entirely in Catalyst:

- Pigeonhole: split every right string into ``d+1`` contiguous
  segments. At edit distance ≤ d, at least one segment survives
  UNTOUCHED in the left string, shifted by at most d positions. So
  candidates = pairs sharing one exact (segment, index, right-length)
  key — a hash join on selective keys, not a similarity scan.
- Right side emits its d+1 segments; the left side emits every
  substring that could BE such a segment (for each plausible right
  length L ∈ [len−d, len+d] and each segment index, the substrings at
  the segment's position ± d). Probe fan-out is O((d+1)·(2d+1)²) keys
  per row — constant, ~18 for d=1.
- Candidate pairs are deduped, then verified with the builtin
  ``levenshtein(l, r, threshold)`` (early-exit JVM DP). The blocking
  is LOSSLESS — verified against brute force in tests — so the join
  is exact, not approximate.
- Strings shorter than d+1 can't be segmented; they live in a
  separate short block (length ≤ d on the right can only match
  length ≤ 2d on the left — both sides collapse to their few DISTINCT
  tiny strings, broadcast cross + verify).

Matching is computed once per DISTINCT value pair (the value frames
are deduped before blocking), then joined back to the row frames —
so repeated keys cost one verification, not n².

Skew caveat (documented, inherent to segment blocking): a shared
affix — every key starting ``'Customer#'`` — makes that segment a hot
key and candidates degenerate toward quadratic. Strip known common
affixes first, or raise ``max_distance`` segmentation granularity by
normalizing keys. The demo uses multi-word part names where segments
are selective.

Cites: reference ``csv_linter.py:546-633`` (checks 1-12/1-13) for the
exact-domain counterpart this generalizes.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seglen(i: str, L: str, d: int) -> str:
    return f"({L} div {d + 1}) + IF({i} < {L} % {d + 1}, 1, 0)"


def _segstart(i: str, L: str, d: int) -> str:
    return f"{i} * ({L} div {d + 1}) + least({i}, {L} % {d + 1})"


def _segments(col: str, d: int) -> Column:
    """d+1 (sub, i, L) segment keys of a right-side string (len≥d+1)."""
    sl = _seglen("i", f"length({col})", d)
    st = _segstart("i", f"length({col})", d)
    return F.expr(
        f"""transform(sequence(0, {d}), i -> struct(
              substring({col}, {st} + 1, {sl}) AS sub,
              i AS i, length({col}) AS L))"""
    )


def _probes(col: str, d: int) -> Column:
    """All (sub, i, L) keys a left string could share with a right
    string of length L ∈ [len−d, len+d] (len≥1 guaranteed upstream)."""
    sl = _seglen("i", "L", d)
    st = _segstart("i", "L", d)
    return F.expr(
        f"""array_distinct(flatten(transform(
              sequence(greatest(length({col}) - {d}, {d + 1}),
                       length({col}) + {d}),
              L -> flatten(transform(sequence(0, {d}), i ->
                transform(
                  filter(sequence({st} - {d}, {st} + {d}),
                         p -> p >= 0 AND p + {sl} <= length({col})),
                  p -> struct(substring({col}, p + 1, {sl}) AS sub,
                              i AS i, L AS L)))))))"""
    )


def fuzzy_value_pairs(
    lv: DataFrame,
    rv: DataFrame,
    max_distance: int = 1,
) -> DataFrame:
    """Distinct-VALUE matches ``(__lv, __rv, distance)`` within
    ``max_distance`` edits, via PassJoin segment blocking + early-exit
    levenshtein verify.

    ``lv`` / ``rv`` are single-column frames named ``__lv`` / ``__rv``;
    callers pass DISTINCT, non-null values. Exposed so callers that know
    their row-frame shapes (e.g. a tiny match table that fits in a
    broadcast) can attach the value pairs themselves with an explicitly
    partition-preserving join instead of ``fuzzy_join``'s generic
    join-back."""
    d = int(max_distance)
    if not 1 <= d <= 3:
        raise ValueError("max_distance must be in [1, 3]")

    segs = (
        rv.where(F.length("__rv") >= d + 1)
        .select("__rv", F.explode(_segments("__rv", d)).alias("k"))
        .select("__rv", "k.sub", "k.i", "k.L")
    )
    probes = (
        lv.where(F.length("__lv") >= 1)
        .select("__lv", F.explode(_probes("__lv", d)).alias("k"))
        .select("__lv", "k.sub", "k.i", "k.L")
    )
    cand = probes.join(segs, ["sub", "i", "L"]).select("__lv", "__rv")

    # short block: right strings too short to segment (len <= d) can
    # only reach left strings of len <= 2d; both distinct sets are
    # alphabet-bounded tiny
    short = lv.where(F.length("__lv") <= 2 * d).crossJoin(
        F.broadcast(rv.where(F.length("__rv") <= d))
    )

    lev = F.levenshtein("__lv", "__rv", d)  # early-exit: -1 past d
    return (
        cand.union(short)
        .distinct()
        .withColumn("distance", lev)
        .where(F.col("distance") >= 0)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows whose key strings are within ``max_distance``
    edits: ``left.* + right.*(suffixed on collision) + distance``."""
    d = int(max_distance)
    if not 1 <= d <= 3:
        raise ValueError("max_distance must be in [1, 3]")

    lv = (
        left.where(F.col(left_col).isNotNull())
        .select(F.col(left_col).alias("__lv"))
        .distinct()
    )
    rv = (
        right.where(F.col(right_col).isNotNull())
        .select(F.col(right_col).alias("__rv"))
        .distinct()
    )
    pairs = fuzzy_value_pairs(lv, rv, d)

    # The join-back EXPANDS: each matched value pair fans out to every
    # (left row x right row) carrying those values, so the probe side must
    # run at session parallelism — a single-file scan arrives as ONE
    # partition and would serialize the whole expansion onto one core
    # (guide §2/§6; the repo-wide single-partition-scan trap).
    par = left.sparkSession.sparkContext.defaultParallelism
    if left.rdd.getNumPartitions() < par:
        left = left.repartition(par)

    renames = {
        c: (c + suffix if c in left.columns else c) for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns]
    )
    return (
        left.join(pairs, F.col(left_col) == F.col("__lv"))
        .join(r, F.col(renames[right_col]) == F.col("__rv"))
        .drop("__lv", "__rv")
    )
