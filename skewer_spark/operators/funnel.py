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


def cohort_retention(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
    max_offset: int = 12,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen period ×
    how many were active again k periods later.

    The aggregate view behind every "retention curve" dashboard, and —
    in the training-data shape — the contributor-churn view over a
    transcript corpus (cohort = week a conv_id first appears).

    Fixed-width periods (``floor(epoch / period_seconds)``, epoch-
    anchored, never calendar-aware) keep the bucketing engine-exact.

    Output: ``(cohort_start, offset, n_active, cohort_size,
    retention)`` for offsets 0..``max_offset`` with n_active > 0;
    ``retention`` = n_active / cohort size, rounded 6dp.  offset-0
    rows carry retention 1.0 by construction.

    Scale shape: period assignment is a projection; the per-key first
    period is one partial-aggregable ``groupBy(key).min``; the matrix
    is a second groupBy on the (cohort, offset) pairs of the key-level
    DISTINCT activity set.  Everything shuffles compact (key, int)
    rows — 10^12 events reduce to |keys| × active-periods before the
    matrix agg.  The cohort-size join is a broadcast (≤ thousands of
    cohort rows)."""
    p = F.floor(
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6))
        / period_seconds
    ).cast("bigint")
    activity = (
        df.select(F.col(key).alias("_k"), p.alias("_p"))
        .groupBy("_k", "_p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    first = activity.groupBy("_k").agg(F.min("_p").alias("_cohort"))
    sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = activity.join(first, "_k").select(
        "_cohort", (F.col("_p") - F.col("_cohort")).alias("offset")
    )
    matrix = (
        joined.filter(F.col("offset") <= max_offset)
        .groupBy("_cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return matrix.join(F.broadcast(sizes), "_cohort").select(
        F.timestamp_seconds(F.col("_cohort") * period_seconds).alias(
            "cohort_start"
        ),
        F.col("offset").cast("int").alias("offset"),
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def transition_matrix(
    df: DataFrame,
    key: str = "user_id",
    order_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive states of each key's ordered sequence.

    In the agent-transcript shape this is the tool→next-tool usage
    graph (which tool follows a search, how often an error retries);
    in the log shape, the status-code flow.  Complements
    :func:`funnel_milestones` (fixed expected order) by LEARNING the
    order from data.

    Output: ``(state, next_state, n, prob)`` where ``prob`` row-
    normalizes over the outgoing state, rounded 6dp.  Sequence ends
    emit no transition (no synthetic terminal state).

    Scale shape: ONE exchange for the per-key ``lead`` window (compact
    (key, order, state) rows), then one partial-aggregable groupBy on
    the state pair — the |states|² result is tiny by construction.
    The row-normalizer joins back as a broadcast."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    pairs = (
        df.select(
            F.col(key),
            F.col(order_col),
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outgoing = pairs.groupBy("state").agg(F.sum("n").alias("_out"))
    return pairs.join(F.broadcast(outgoing), "state").select(
        "state",
        "next_state",
        "n",
        F.round(F.col("n") / F.col("_out"), 6).alias("prob"),
    )
