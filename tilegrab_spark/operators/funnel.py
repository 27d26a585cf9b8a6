"""Funnel analysis over the event table — ordered step matching
(view → click → purchase), the standard product-analytics primitive,
expressed as ONE shuffle of step-typed events.

Semantics (the greedy-earliest convention every funnel engine uses):
``t_1`` = the user's earliest step-1 event; ``t_j`` = the earliest
step-j event at or after ``t_{j-1}`` (optionally within ``within_s``
seconds of it); a user "reaches" step j when ``t_j`` exists. Times are
microsecond-exact (``unix_micros``), so ties and sub-second funnels
are deterministic.

Plan shape at 100 TB: filter to the step types FIRST (the funnel's own
predicate prunes the scan), then one groupBy(user) building k sorted
per-step time arrays (map-side combinable collect_list); the
sequential gates are pure array expressions (``filter`` + ``get``
higher-order functions, whole-stage codegen) — no joins, no per-step
passes, no UDF. Per-user memory is bounded by that user's step-typed
events, the same per-group bound sessionize accepts. ``funnel_counts``
reduces the per-user frame to k rows.

Fully relational — the pytest pins both entry points against a DuckDB
oracle built from chained ``min() FILTER`` CTEs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["funnel_progress", "funnel_counts"]


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Microsecond epoch of the timestamp column, timezone-independent:
    TIMESTAMP_NTZ wall times count from the NTZ epoch (= treat-as-UTC,
    matching DuckDB's ``epoch_us`` on naive timestamps); instants use
    ``unix_micros`` directly."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _validated_steps(steps: Sequence[str]) -> list[str]:
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    return steps


def funnel_progress(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """Per user: ``t_1..t_k`` (microsecond epoch of each reached step,
    null once the chain breaks) and ``steps_completed``. Users with no
    step-1 event still appear (they had SOME step-typed event) with
    ``steps_completed = 0``."""
    steps = _validated_steps(steps)
    if within_s is not None and within_s <= 0:
        raise ValueError(f"within_s must be positive, got {within_s}")
    w_us = None if within_s is None else int(within_s * 1_000_000)

    ev = events.filter(F.col(type_col).isin(steps))
    us = _micros(events, ts_col)
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == F.lit(s), us))
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    g = ev.groupBy(F.col(user_col).alias("user")).agg(*aggs)

    out = g
    prev: Column | None = None
    for i in range(len(steps)):
        if i == 0:
            t = F.get(F.col("_a0"), 0)
        else:
            p = prev

            def make_gate(_p):
                # single-parameter lambda: a second Python parameter
                # would make pyspark bind it to the ARRAY INDEX
                def gate(x):
                    c = x >= _p
                    if w_us is not None:
                        c = c & (x - _p <= F.lit(w_us))
                    return c

                return gate

            t = F.when(
                p.isNotNull(), F.get(F.filter(F.col(f"_a{i}"), make_gate(p)), 0)
            )
        out = out.withColumn(f"t_{i + 1}", t)
        prev = F.col(f"t_{i + 1}")
    completed = sum(
        (F.col(f"t_{i + 1}").isNotNull().cast("int") for i in range(len(steps))),
        F.lit(0),
    )
    return out.withColumn("steps_completed", completed).drop(
        *[f"_a{i}" for i in range(len(steps))]
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """Per funnel step: ``[step, event_type, n_users, frac_of_step1]``
    — how many users reached it, and the conversion from step 1."""
    steps = _validated_steps(steps)
    prog = funnel_progress(
        events, steps, user_col=user_col, ts_col=ts_col,
        type_col=type_col, within_s=within_s,
    )
    sums = prog.agg(
        *[
            F.sum(F.col(f"t_{i + 1}").isNotNull().cast("long")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.coalesce(F.col(f"n{i}"), F.lit(0)).cast("long").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    n1 = F.coalesce(F.col("n0"), F.lit(0)).cast("double")
    return (
        sums.select(F.explode(rows).alias("r"), n1.alias("_n1"))
        .select(
            "r.step",
            "r.event_type",
            "r.n_users",
            F.when(F.col("_n1") > 0, F.col("r.n_users") / F.col("_n1")).alias(
                "frac_of_step1"
            ),
        )
    )
