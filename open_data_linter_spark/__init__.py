"""open-data-linter-spark: a PySpark-native schema + constraint validation engine.

A from-scratch reimagining of the capabilities of ``volare-all/open-data-linter``
(reference at /root/reference, MIT) as a distributed, Catalyst-optimized
validation engine over large columnar tables — primarily an audio clip +
transcript table ``(clip_id, bytes, sr_hz, dur_ms, codec, transcript)`` at
10^12-row design scale.

Design principles (Spark-first, NOT a port):
- every lint rule is a native Catalyst ``Column`` predicate where expressible
  (whole-stage codegen), an Arrow-batched pandas UDF only where not
  (audio decode, encoding round-trips);
- all row-scoped rules for a table are fused into ONE scan producing
  per-partition summaries (the reference re-scans per rule,
  csv_linter.py:95-471 — we do not);
- shuffle-bearing rules (uniqueness, referential integrity, drift histograms)
  use partial aggregation, broadcast anti-joins and explicit salting;
- the ``bytes`` payload column is isolated from non-audio rules so Parquet
  column pruning never reads it on the cheap path.
"""

__version__ = "0.1.0"

from open_data_linter_spark.session import get_spark  # noqa: F401
