"""Stateful / windowed streaming operators over the clip stream.

Two north-rule streaming shapes beyond foreachBatch validation
(streaming/validate.py):

- ``windowed_histograms``: event-time windowed histogram of a drift column
  with a watermark — the streaming twin of rules/drift.py's batch
  histograms. Late rows beyond the watermark are dropped by the engine;
  in append mode a window emits once, when the watermark passes its end.
- ``running_codec_stats``: a CUSTOM stateful operator via
  ``applyInPandasWithState`` — per-codec running clip count / duration
  mean that survives across micro-batches (the state is two numbers per
  codec, so state size is bounded by codec cardinality, not stream
  length). This is the pattern for any cross-batch accumulator the
  built-in windowed aggs can't express.

Both keep all per-row work vectorized: the windowed agg is pure Catalyst;
the stateful operator sees pandas frames per (codec, batch).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_histograms(
    stream_df: DataFrame,
    ts_col: str = "ingest_ts",
    column: str = "sr_hz",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-event-time-window histogram of ``column`` with late-data bound.

    Append-mode semantics: a (window, bin) row is final — downstream drift
    scoring (ks/chi² vs a frozen baseline, rules/drift.py) can consume it
    without reprocessing. Rows later than ``watermark`` past the max seen
    event time are dropped by the engine.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        # drop NULLs like the batch histogram (rules/drift.py) — a NULL bin
        # would silently vanish in windowed_drift_scores' bin-keyed joins
        # while still inflating its dof
        .where(F.col(column).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.col(column).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "bin",
            "cnt",
        )
    )


RUNNING_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_dur", T.DoubleType()),
    ]
)

RUNNING_STATS_OUTPUT = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("n_clips", T.LongType()),
        T.StructField("mean_dur_ms", T.DoubleType()),
    ]
)


def _update_codec_stats(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, sum_dur = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        dur = pdf["dur_ms"].dropna()
        n += int(len(dur))
        sum_dur += float(dur.sum())
    state.update((n, sum_dur))
    yield pd.DataFrame(
        {
            "codec": [key[0]],
            "n_clips": [n],
            "mean_dur_ms": [sum_dur / n if n else 0.0],
        }
    )


def running_codec_stats(stream_df: DataFrame) -> DataFrame:
    """Cross-batch per-codec running stats via applyInPandasWithState.

    Emits one updated row per codec per micro-batch (update output mode);
    the state (count, duration sum) is O(#codecs) regardless of stream
    length — the bounded-state discipline any 10^12-row stream requires.
    """
    return (
        stream_df.select("codec", "dur_ms")
        .groupBy("codec")
        .applyInPandasWithState(
            _update_codec_stats,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=RUNNING_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
