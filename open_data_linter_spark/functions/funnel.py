"""Funnel analysis: how far each user progresses through an ordered
sequence of event types — the conversion query every event pipeline
runs (ClickHouse ships ``windowFunnel`` as a builtin; Spark has
nothing).

The reference has no event semantics at all (static CSV grids,
``csv_linter.py``); within this engine the funnel doubles as a
validation signal — a step whose reach collapses between snapshots is
an instrumentation bug upstream (the drift rules see value
distributions, not ORDER of events).

Semantics (greedy earliest-chain, the standard):

- A user reaches step i if events of types ``steps[0..i-1]`` exist at
  STRICTLY increasing timestamps. The greedy chain — take the earliest
  step-1 event, then the earliest step-2 event strictly after it, … —
  decides reachability exactly (if any chain exists, the greedy one
  does), and is what the chained min-CTE SQL formulation computes, so
  the oracle twin is exact by construction.
- Equal-timestamp events never chain (strictness); NULL timestamps are
  ignored; event types outside ``steps`` are irrelevant and filtered
  before any per-user state is built.

Scale shape: rows are filtered to the step types FIRST (the big
reduction — a funnel over 3 of 50 event types drops ~94% of rows
before any shuffle), then ONE groupBy collects each user's surviving
(ts, type) pairs and a JVM ``aggregate`` fold over the sorted array
computes the reach level — no Python, no per-step self-joins (k-1
joins = k-1 shuffles and a combinatorial planner at large k). Per-user
state is bounded by that user's STEP-TYPED event count; a pathological
hot user can be capped with ``max_events_per_user`` (reach is then
computed over the user's EARLIEST N step-typed events — a documented
under-count when the true chain extends past the cap; default off,
exactness first).
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_levels(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_events_per_user: int | None = None,
) -> DataFrame:
    """One row per user having at least one step-typed event:
    ``(user, level)`` where level ∈ [0, len(steps)] is the deepest
    step reached (0 = has step events but never step 1)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("duplicate funnel step")

    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = df.where(
        F.col(ts_col).isNotNull() & F.col(type_col).isin(steps)
    ).select(
        F.col(user_col).alias("user"),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(type_col).alias("y"),
        ).alias("e"),
    )
    seq = F.array_sort(F.collect_list("e"))
    if max_events_per_user is not None:
        seq = F.slice(seq, 1, max_events_per_user)
    # fold state: (lvl, last matched micros); strict t > last
    fold = F.aggregate(
        seq,
        F.struct(
            F.lit(0).alias("lvl"), F.lit(-(1 << 62)).cast("long").alias("last")
        ),
        lambda st, x: F.when(
            (st.lvl < F.lit(len(steps)))
            & (x.y == F.element_at(steps_lit, st.lvl + 1))
            & (x.t > st.last),
            F.struct((st.lvl + 1).alias("lvl"), x.t.alias("last")),
        ).otherwise(st),
    )
    return (
        ev.groupBy("user")
        .agg(fold.alias("st"))
        .select("user", F.col("st.lvl").alias("level"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-step reach: ``(step_idx, step, n_users, frac_of_first)``
    — n_users reaching AT LEAST that step; zero-filled for steps
    nobody reaches. The final frame is k rows; its ranking window runs
    single-partition by design (k = funnel depth, not data)."""
    lv = funnel_levels(df, user_col, ts_col, type_col, steps)
    reached = (
        lv.where(F.col("level") >= 1)
        .select(
            F.explode(F.sequence(F.lit(1), F.col("level"))).alias("step_idx")
        )
        .groupBy("step_idx")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    spark = df.sparkSession
    frame = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    w = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        frame.join(F.broadcast(reached), "step_idx", "left")
        .withColumn("n_users", F.coalesce("n_users", F.lit(0)))
        .withColumn(
            "frac_of_first",
            F.round(
                F.try_divide(F.col("n_users"), F.first("n_users").over(w)), 6
            ),
        )
        .orderBy("step_idx")
    )
