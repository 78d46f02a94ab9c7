"""Preference-data construction: chosen/rejected pair mining and
Bradley-Terry strength aggregation.

The RLHF/DPO leg of a training-data pipeline: given many scored
responses per prompt (teacher scores, human ratings, win/loss duels),
(1) mine the (chosen, rejected) pairs a DPO trainer consumes, and
(2) aggregate raw pairwise duels into per-item Bradley-Terry strength
scores (the model behind Chatbot-Arena-style leaderboards).  The
reference has no analog — its closest shape is per-destination
ACK/NACK tallies (`/root/reference/store/forwarder.go:192-208`);
these operators generalize tallies to *ordered comparisons*.

Determinism contract (repo-wide): no RNG anywhere; ties break on
explicit id columns; every emitted float is rounded 6dp, and the
Bradley-Terry iteration re-rounds strengths to the 6dp grid BETWEEN
iterations so any two engines that agree at step k agree at k+1
(per-item sums run over ≤|items| terms, so cross-engine float error
is ~1e-15 — far inside the 1e-6 grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    resp_col: str = "resp_id",
    score_col: str = "score",
) -> DataFrame:
    """Best-vs-worst (chosen, rejected) pair per prompt.

    ``chosen`` = highest score (ties → lowest ``resp_col``);
    ``rejected`` = lowest score (ties → lowest ``resp_col``).  Prompts
    whose best and worst scores are equal (including single-response
    prompts) emit nothing — a zero-margin pair teaches a DPO loss
    nothing and injects label noise.

    Scale shape: ONE exchange (the ``partitionBy(prompt)`` window);
    both extremes come off the same window sort, then a groupBy on the
    same key that AQE/Catalyst satisfies from the existing
    partitioning.  Compact rows only — response TEXT should be joined
    back by id downstream, never ride this shuffle.
    """
    w = Window.partitionBy(prompt_col)
    # nulls rank LAST in both directions (Spark's bare asc() is
    # nulls-first, which would elect a NULL-scored response as the
    # rejected extreme and silently drop the prompt — and diverge
    # from DuckDB's nulls-last default the first time a teacher
    # score is missing)
    best = w.orderBy(
        F.col(score_col).desc_nulls_last(), F.col(resp_col).asc()
    )
    worst = w.orderBy(
        F.col(score_col).asc_nulls_last(), F.col(resp_col).asc()
    )
    ranked = df.select(
        F.col(prompt_col),
        F.col(resp_col),
        F.col(score_col).cast("double").alias("_s"),
        F.row_number().over(best).alias("_rb"),
        F.row_number().over(worst).alias("_rw"),
    ).filter((F.col("_rb") == 1) | (F.col("_rw") == 1))
    agg = ranked.groupBy(prompt_col).agg(
        F.max(F.when(F.col("_rb") == 1, F.col(resp_col))).alias("chosen_id"),
        F.max(F.when(F.col("_rb") == 1, F.col("_s"))).alias("chosen_score"),
        F.max(F.when(F.col("_rw") == 1, F.col(resp_col))).alias(
            "rejected_id"
        ),
        F.max(F.when(F.col("_rw") == 1, F.col("_s"))).alias(
            "rejected_score"
        ),
    )
    return agg.filter(F.col("chosen_score") > F.col("rejected_score")).select(
        prompt_col,
        "chosen_id",
        "rejected_id",
        F.round("chosen_score", 6).alias("chosen_score"),
        F.round("rejected_score", 6).alias("rejected_score"),
        F.round(F.col("chosen_score") - F.col("rejected_score"), 6).alias(
            "margin"
        ),
    )


def bradley_terry(
    duels: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 2,
) -> DataFrame:
    """Per-item Bradley-Terry strengths from raw pairwise duels via
    the classic minorization-maximization update, fixed iteration
    count for determinism:

        s'_i = W_i / Σ_j n_ij / (s_i + s_j),   then normalize Σs = 1

    where ``W_i`` = total wins of i and ``n_ij`` = duels between i and
    j.  Strengths re-round to 6dp after each normalize (see module
    docstring).  Items that never win hold strength ~0 under MM (W=0)
    — kept, not dropped, so the output covers every item seen.

    Output: ``(item, n_wins, n_duels, strength)``.

    Scale shape: the duel log (10^9+ rows) reduces ONCE to the
    pair-count frame (|items|² ceiling, map-side combinable) and the
    per-item win totals; every MM iteration then runs on those compact
    frames only — two broadcast joins of the |items|-row strength
    frame onto the pair frame plus one partial-aggregable groupBy.
    The raw log is never rescanned inside the loop.
    """
    i_col = F.col(winner_col).alias("item")
    j_col = F.col(loser_col).alias("opp")
    # directed pair counts reduce the raw log once; union the two
    # directions so each (item, opp) row carries the full duel count.
    directed = duels.groupBy(
        i_col, j_col
    ).agg(F.count(F.lit(1)).alias("_w"))
    # both orientations via ONE explode (r6): the previous forward ∪
    # reverse union carried the full duel-log reduce in each branch —
    # the exchange was deduped at runtime but the final aggregate and
    # the branch projections replayed per side
    pair = (
        directed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("item"), F.col("opp"),
                        F.col("_w"), F.lit(0).cast("long").alias("_l"),
                    ),
                    F.struct(
                        F.col("opp").alias("item"),
                        F.col("item").alias("opp"),
                        F.lit(0).cast("long").alias("_w"),
                        F.col("_w").alias("_l"),
                    ),
                )
            ).alias("_e")
        )
        .select("_e.item", "_e.opp", "_e._w", "_e._l")
        .groupBy("item", "opp")
        .agg(F.sum("_w").alias("wins_vs"), F.sum(F.col("_w") + F.col("_l")).alias("n_vs"))
        .persist()
    )
    totals = pair.groupBy("item").agg(
        F.sum("wins_vs").alias("n_wins"), F.sum("n_vs").alias("n_duels")
    ).persist()
    # materializes BOTH cached frames (totals builds on pair), so the
    # raw duel log reduces exactly once and the MM loop below never
    # touches it again
    n_items = totals.count()
    try:
        s = totals.select(
            "item",
            F.lit(round(1.0 / max(n_items, 1), 6)).alias("strength"),
        )
        for it in range(iters):
            si = s.select(
                F.col("item"), F.col("strength").alias("_si")
            )
            sj = s.select(
                F.col("item").alias("opp"), F.col("strength").alias("_sj")
            )
            denom = (
                pair.join(F.broadcast(si), "item")
                .join(F.broadcast(sj), "opp")
                .groupBy("item")
                .agg(
                    F.sum(
                        F.col("n_vs") / (F.col("_si") + F.col("_sj"))
                    ).alias("_denom")
                )
            )
            raw = totals.join(denom, "item").select(
                "item",
                (F.col("n_wins") / F.greatest(F.col("_denom"), F.lit(1e-12))).alias(
                    "_raw"
                ),
            )
            # normalization constant via an unpartitioned window (one
            # reduce over the |items|-row frame) instead of a
            # crossJoin(broadcast(agg)) — the broadcast build was a
            # separate driver-side job per iteration (r6); the global
            # window is the same single-pass reduce without it
            from pyspark.sql import Window as _W

            s = raw.select(
                "item",
                F.round(
                    F.col("_raw")
                    / F.greatest(
                        F.sum("_raw").over(
                            _W.partitionBy().rowsBetween(
                                _W.unboundedPreceding, _W.unboundedFollowing
                            )
                        ),
                        F.lit(1e-12),
                    ),
                    6,
                ).alias("strength"),
            )
            if (it + 1) % 4 == 0 and it + 1 < iters:
                # each iteration references the strength frame twice, so
                # the logical plan doubles per round — cut lineage on the
                # tiny |items|-row frame (pagerank discipline)
                s = s.localCheckpoint(eager=True)
        out = (
            totals.join(s, "item")
            .select("item", "n_wins", "n_duels", "strength")
            .localCheckpoint(eager=True)  # detach from the loop caches
        )
    finally:
        # release even when an MM action throws mid-loop
        pair.unpersist()
        totals.unpersist()
    return out
