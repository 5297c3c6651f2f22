"""Session-window aggregation — the native Structured Streaming twin
of ``functions/sessions.py``.

The batch sessionizer (lag + cumsum over a key window) needs the whole
history per key; a live stream wants sessions to FINALIZE as soon as
the watermark passes their close. Spark's ``session_window`` is the
built-in for exactly that: per-key windows that extend while events
keep arriving within ``gap`` and emit once, final, in append mode when
the watermark passes ``last_event + gap``. State is bounded by open
sessions, not stream length.

The same ``groupBy(session_window(...))`` expression also runs on a
static frame, so this module exposes one aggregation used two ways —
and the batch form is CROSS-CHECKED in tests against the independent
lag/cumsum formulation of ``functions/sessions.py``: two different
algorithms, same sessions.

Boundary parity note: ``session_window`` merges an event arriving
EXACTLY ``gap`` after the previous one (its half-open window
``[ts, ts+gap)`` is extended by the merge pass on touching-or-
overlapping ranges), which matches the batch rule's strict
``diff > gap`` split — the equality case stays in-session in both
implementations (pinned in tests).

Output columns mirror ``session_stats``: session bounds are the
OBSERVED min/max event times (``session_window.end`` is
``last_event + gap`` — an implementation detail, not reported).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(df: DataFrame, key_cols: list[str], ts_col: str, gap_s: float):
    if gap_s <= 0:
        raise ValueError("gap_s must be positive")
    win = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*key_cols, win.alias("__w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            ((F.max(m) - F.min(m)) / F.lit(1_000_000.0)).alias("duration_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__w")
    )


def session_window_stats(
    df: DataFrame, key_cols: list[str], ts_col: str, gap_s: float
) -> DataFrame:
    """Batch form: one row per session,
    ``(*keys, session_start, session_end, duration_s, n_events)`` —
    the session_window-based twin of
    ``functions.sessions.session_stats`` (same rows minus the ordinal
    ``session_idx``)."""
    return _agg(df, key_cols, ts_col, gap_s).orderBy(
        *key_cols, "session_start"
    )


def streaming_session_stats(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming form for append mode: sessions emit ONCE, final, when
    the watermark passes ``last_event + gap``. Late events beyond the
    watermark are dropped by the engine (the completeness rules' job,
    not silent merging)."""
    return _agg(
        stream_df.withWatermark(ts_col, watermark), key_cols, ts_col, gap_s
    )
