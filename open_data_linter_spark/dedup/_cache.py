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
