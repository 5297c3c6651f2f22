"""Vector expressions over ``array<float>`` embedding columns.

Pure Catalyst (F.aggregate / F.zip_with) — no UDF in the hot path. Used by
similarity search and embedding near-dup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_given_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine(a, b)`` with the operand norms precomputed per ROW.

    The similarity family's inner loop scores O(pairs) candidates; plain
    ``cosine`` evaluates THREE array-fold HOFs per pair (dot + both
    norms), re-deriving each operand's norm for every pair it appears in.
    Projecting ``norm(v)`` once per row before the join and passing it
    here leaves ONE HOF (the dot) per pair — the expression is the same
    ``dot/(na*nb)`` with the same zero guard, so float results are
    bit-identical to ``cosine``. (Projections don't collapse across a
    join boundary, so the per-row norm is computed exactly once per side:
    at hash-relation build for the broadcast side, pre-join for the
    stream side.)"""
    d = na * nb
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def bucket_signatures(vec_col: str, planes_3d) -> Column:
    """All LSH table buckets in one vectorized pass: array<long> of length
    ``tables`` for a (tables, bits, dim) plane tensor.

    One numpy matmul per Arrow batch — (rows × dim) @ (dim × tables·bits) —
    then sign-bit packing. The Catalyst-literal path (``hyperplane_bucket``)
    grows an O(tables·bits·dim) expression tree that stalls codegen past a
    few dozen planes; this stays O(1) plan size at any table count and the
    matmul is BLAS-backed. Planes are captured in the UDF closure
    (driver-seeded, tiny) — effectively a broadcast.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(planes_3d, dtype=np.float64)
    tables, bits, dim = planes.shape
    flat = planes.reshape(tables * bits, dim).T  # (dim, tables*bits)
    weights = (1 << np.arange(bits, dtype=np.int64))

    @pandas_udf("array<long>")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (rows, dim)
        proj = mat.astype(np.float64) @ flat  # (rows, tables*bits)
        signs = (proj >= 0).reshape(len(mat), tables, bits)
        buckets = (signs * weights).sum(axis=2)  # (rows, tables)
        return pd.Series(list(buckets))

    return _sig(vec_col)


def hyperplane_bucket(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed to a long.

    ``planes`` are driver-generated deterministic unit vectors (seeded numpy)
    embedded as literals — broadcast-free, constant-folded per row.
    """
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(a, F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def nearest_centroids(vec_col: str, centroids, n: int) -> Column:
    """Indices of the ``n`` nearest centroids (by cosine, vectors treated
    as L2-normalized) as array<int> — one matmul per Arrow batch, same
    pattern as bucket_signatures. ``centroids`` is a (k, dim) array
    captured in the closure (driver-trained, tiny)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def _nearest(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T  # (rows, k)
        top = np.argsort(-sims, axis=1)[:, :n].astype(np.int32)
        return pd.Series(list(top))

    return _nearest(vec_col)
