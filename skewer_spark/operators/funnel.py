"""Ordered-step funnel analysis over an event stream.

The reference counts flat totals per (status, client, destination)
(`/root/reference/store/forwarder.go:192-208`); a funnel is the ordered
generalization every product/telemetry pipeline asks for next: of the
users who did step 1, how many went on to do step 2 *after* it, then
step 3 after that.

Semantics (strict ordering, earliest-completion):

* ``t1`` = user's earliest step-1 event;
* ``t_i`` = earliest step-i event STRICTLY AFTER ``t_(i-1)``;
* a user "reaches" step i iff ``t_i`` exists.

Scale shape: all per-user milestones are window minima over ONE
``partitionBy(user)`` exchange — the n steps are n conditional-min
columns over the same window, so Catalyst plans a single shuffle+sort
and n cheap passes, never n self-joins.  The final step counts are a
partial-aggregable sum.  Hot users cost one task's sort of their own
rows only (no quadratic blowup: no join against themselves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_milestones(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key milestone timestamps: one row per key with
    ``step1_ts .. stepN_ts`` (NULL where the funnel broke off)."""
    w = Window.partitionBy(key)
    out = df
    prev = None
    names = []
    for i, s in enumerate(steps, start=1):
        name = f"step{i}_ts"
        cond = F.col(type_col) == s
        if prev is not None:
            # strictly after the previous milestone; NULL prev → NULL
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
        names.append(name)
    return out.groupBy(key).agg(
        *[F.first(n).alias(n) for n in names]
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: one row per step with the number of keys that
    reached it (monotone non-increasing) and the conversion rate from
    the previous step, rounded to 6 dp."""
    m = funnel_milestones(df, steps, key, type_col, ts_col)
    counts = m.agg(
        *[
            F.count(f"step{i}_ts").alias(f"c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = []
    for i, s in enumerate(steps, start=1):
        prev = F.col(f"c{i-1}") if i > 1 else None
        rate = (
            F.round(F.col(f"c{i}") / F.nullif(prev, F.lit(0)), 6)
            if prev is not None
            else F.lit(1.0)
        )
        rows.append(
            F.struct(
                F.lit(i).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"c{i}").alias("n_reached"),
                rate.alias("conversion"),
            )
        )
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step", "r.step_name", "r.n_reached", "r.conversion")
