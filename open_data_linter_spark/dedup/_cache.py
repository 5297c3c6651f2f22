"""Scoped persist() with one-generation retention.

The dedup/ANN builders persist intermediates (partition-spread sources,
hashed shingle sets, band rows) that the returned LAZY plans consume, so
the builder can't unpersist before returning and the caller never holds a
handle. Spark's CacheManager keeps strong references, so bare persist()
calls would accumulate forever in a long-lived session (round-3 code
review finding).

``persist_scoped(scope, df)`` keeps exactly ONE generation per call-site
scope: persisting a new DataFrame under a scope first unpersists the
previous one. Unpersisting a cache another in-flight query still reads is
SAFE in Spark — the plan silently recomputes — so concurrent calls of the
same builder degrade to recompute rather than break; a session's storage
footprint stays bounded by one generation per site.
"""

from __future__ import annotations

from threading import Lock

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}
_LOCK = Lock()


def persist_scoped(scope: str, df: DataFrame) -> DataFrame:
    """persist() ``df``, evicting the previous generation of ``scope``."""
    with _LOCK:
        old = _LIVE.get(scope)
        if old is not None:
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass  # session may be gone; eviction is best-effort
        out = df.persist()
        _LIVE[scope] = out
    return out


def spread_and_pin(scope: str, df: DataFrame) -> DataFrame:
    """Repartition a narrower-than-parallelism input up to the session
    default parallelism, then ``persist_scoped`` it.

    The persist pins the exchange boundary BELOW later projections:
    Catalyst collapses a column-independent projection under a round-robin
    exchange, which would run the expensive expression on the narrow
    pre-shuffle side (the round-2 single-partition trap, 80-90% of the
    minhash/jaccard wall). Persisting an already-wide input is intentional
    — every caller reuses the frame from multiple consumers."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return persist_scoped(scope, df)


def nudge_context_cleaner(spark) -> None:
    """Prompt release of dropped ``localCheckpoint`` generations.

    ``DataFrame.unpersist()`` does NOT free localCheckpoint blocks: they
    belong to the internal checkpointed RDD, which is not registered in
    the CacheManager (verified live — the persistent-RDD set is
    unchanged after ``unpersist(blocking=True)``). The public-API
    release path is Spark's ContextCleaner, which tracks RDDs by WEAK
    reference and unpersists them when the JVM object is garbage
    collected. So: the caller drops every Python reference to the old
    generation, then calls this — a Python ``gc.collect()`` flushes the
    py4j proxies (releasing the JVM-side Dataset/RDD refs) and a JVM
    ``System.gc()`` lets ContextCleaner's reference queue pick the RDD
    up. Cleanup completes asynchronously on the cleaner thread, but
    promptly — instead of whenever the driver happens to GC.

    Iterative operators that re-checkpoint per round (dedup/cluster.py,
    functions/bpe.py, the curation CLI funnel) call this after each
    generation handoff; without it every round's full materialized
    blocks accumulate for the life of the job (code-review finding).
    """
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    except Exception:
        pass  # a dying session just means nothing left to release


def clear_scoped(blocking: bool = False) -> int:
    """Unpersist and forget EVERY retained generation (all scopes).

    The one-generation retention above still keeps the FINAL DataFrame of
    each call-site scope (and a reference to its SparkSession) alive for
    process lifetime; long-lived hosts call this at session teardown /
    between tenants to release them. Returns the number of scopes cleared.
    In-flight queries over a cleared cache silently recompute (Spark
    semantics), so calling this concurrently is safe, never corrupting.
    """
    with _LOCK:
        n = len(_LIVE)
        for df in _LIVE.values():
            try:
                df.unpersist(blocking=blocking)
            except Exception:
                pass  # session already stopped; forgetting is the point
        _LIVE.clear()
    return n
