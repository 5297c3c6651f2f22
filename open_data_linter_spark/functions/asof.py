"""As-of (nearest-event) join: attach the latest right row at-or-before
each left row's timestamp, per key.

The reference has no temporal operators at all (its only time logic is
the era↔year literal check, ``csv_linter.py:495-530``); this is the
standard enrichment primitive every event pipeline needs — attach the
prevailing price/config/calibration to each observation — and one Spark
famously lacks as a builtin (pandas has ``merge_asof``, DuckDB has
``ASOF JOIN``).

Spark-first design — the union trick, NOT a range join:

- A naive implementation joins on key with ``r.ts <= l.ts`` and ranks:
  that is a per-key cartesian in the join followed by a top-1 — at
  100 TB the intermediate explodes quadratically in per-key row count.
- Instead both sides are unioned into ONE stream tagged by side, hash
  partitioned by key ONCE, sorted by (time, side) per key, and the
  match is ``last(payload, ignorenulls=True)`` over the running frame:
  each left row sees exactly the most recent right payload. Linear in
  rows, ONE Exchange, no intermediate blowup. Forward direction is the
  mirrored ``first()`` over the following frame.
- Ties: a right row at exactly the left timestamp matches (inclusive,
  same as DuckDB ``ASOF JOIN`` / pandas ``merge_asof``). Multiple right
  rows at the same (key, time) are nondeterministic (pick-one), also
  like DuckDB — deduplicate the right side if that matters.
- NULL semantics: right rows with NULL time never match; left rows
  with NULL time get a NULL match (they sort into the NULLS FIRST
  prefix where no right payload precedes them, so this falls out of
  the frame definition rather than a special case — right NULL-time
  rows are filtered BEFORE the union precisely so they cannot sit in
  that prefix and leak into real frames).
- ``tolerance`` (seconds) nulls out matches staler than
  ``left_time − tolerance`` while keeping the left row (left-outer
  semantics throughout), computed on exact epoch microseconds.

Skew note: one hot key serializes its window into a single task. The
standard fix (time-bucket salting + boundary fix-up) is deliberately
not built in; for validation workloads keys are users/devices and the
per-key stream is small. Shuffle count is the scale story here.
"""

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"
_TIME = "__asof_t"


def _micros(c: Column) -> Column:
    # unix_micros rejects timestamp_ntz; the session pins UTC so the
    # wall-clock reading is preserved by the cast
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join of ``right`` onto ``left`` per ``on`` key.

    ``direction="backward"`` (default) matches the latest right row with
    ``right_time <= left_time``; ``"forward"`` the earliest with
    ``right_time >= left_time``. Right payload columns (default: all
    except keys) are appended, renamed with ``suffix`` on collision
    with a left column name; the matched ``right_time`` is appended
    under the same rule.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_time]
    out_names = {
        c: (c + suffix if c in left.columns else c)
        for c in [right_time] + right_cols
    }
    if len(set(out_names.values())) != len(out_names):
        # e.g. right has both 'v' and 'v_r' while left has 'v': suffixing
        # would emit duplicate field names and make getField ambiguous
        raise ValueError(
            f"asof_join: suffixed right column names collide: "
            f"{sorted(out_names.values())}"
        )

    payload = F.struct(
        F.col(right_time).alias(out_names[right_time]),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    r = (
        right.where(F.col(right_time).isNotNull())
        .select(*on, F.col(right_time).alias(_TIME), payload.alias(_PAYLOAD))
        .withColumn(_SIDE, F.lit(0 if direction == "backward" else 1))
    )
    l = left.withColumn(_TIME, F.col(left_time)).withColumn(
        _SIDE, F.lit(1 if direction == "backward" else 0)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    base = Window.partitionBy(*on).orderBy(_TIME, _SIDE)
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first(_PAYLOAD, ignorenulls=True).over(w)

    # window FIRST (over both sides), THEN drop the right rows — a
    # pre-window filter would remove the very rows being matched
    u = u.withColumn(_PAYLOAD, matched).where(
        F.col(_SIDE) == F.lit(1 if direction == "backward" else 0)
    )
    if direction == "forward":
        # NULL-time left rows sort into the NULLS FIRST prefix, where the
        # [currentRow, unboundedFollowing] frame spans the whole partition
        # and first() would match the key's EARLIEST right row; the
        # documented contract is a NULL match (backward gets it for free
        # from the frame definition — no right payload precedes the
        # prefix)
        u = u.withColumn(
            _PAYLOAD, F.when(F.col(left_time).isNotNull(), F.col(_PAYLOAD))
        )
    if tolerance_s is not None:
        mt = F.col(_PAYLOAD).getField(out_names[right_time])
        lag = _micros(mt) - _micros(F.col(left_time))
        within = (
            lag >= F.lit(-int(tolerance_s * 1_000_000))
            if direction == "backward"
            else lag <= F.lit(int(tolerance_s * 1_000_000))
        )
        u = u.withColumn(_PAYLOAD, F.when(within, F.col(_PAYLOAD)))

    ordered = [out_names[right_time]] + [out_names[c] for c in right_cols]
    return u.select(
        *left.columns,
        *[F.col(_PAYLOAD).getField(n).alias(n) for n in ordered],
    )
