"""Annotation aggregation: majority vote, agreement, annotator quality.

Preference/label data for post-training is collected with several
annotators per item; before any of it becomes training signal the
pipeline must (a) reduce each item's votes to one label with a
DETERMINISTIC rule, (b) quantify how contested each item was, and
(c) score annotators against the consensus so chronic outliers can be
down-weighted or re-queued.  This module is that stage, batch-shaped:

* ``majority_labels`` — per item: winning label (most votes; ties
  broken by bytewise-smallest label so reruns/resumes agree), vote
  counts, and the agreement fraction ``majority_n / n_annotations``;
* ``annotator_agreement`` — per annotator: items judged and the
  fraction matching the item majority (computed WITHOUT excluding the
  annotator's own vote — the plain "agreement with consensus" metric;
  leave-one-out is a trivial variant on the same frames);
* ``fleiss_kappa_inputs`` — the (P_o, P_e) pair of Fleiss' kappa for a
  fixed-annotator-count design, exposed as data so the caller decides
  the final statistic (kappa itself is a driver-side scalar).

Scale shape (the 100 TB contract): ONE partial-aggregable
``groupBy(item, label)`` touches the raw vote stream; every window
after that runs on the compact (items × labels) counts frame,
partitioned by item — never a corpus-global window.
``annotator_agreement`` joins votes to the tiny per-item majority frame
on the item key (broadcastable whenever items ≪ votes, which a
many-votes-per-item design guarantees).

Reference parity: no analog in the reference; part of the
training-data toolbox the task brief adds (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _vote_counts(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Compact ``(item, label, cnt)`` frame — the single corpus-scale
    shuffle every function here builds on."""
    return df.groupBy(
        F.col(item_col).alias("item"), F.col(label_col).alias("label")
    ).agg(F.count("*").alias("cnt"))


def majority_labels(
    df: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-item consensus: ``(item, n_annotations, n_labels,
    majority_label, majority_n, agreement)``.

    Tie-break is (count DESC, label ASC) — deterministic across
    engines, resumes, and row orders.  ``agreement`` is rounded to 6dp
    (the cross-engine float-canonicalization contract every oracle
    pair in this repo uses).
    """
    counts = _vote_counts(df, item_col, label_col)
    w = Window.partitionBy("item").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    per_item = (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("n_annotations", F.sum("cnt").over(Window.partitionBy("item")))
        .withColumn("n_labels", F.count("*").over(Window.partitionBy("item")))
    )
    return (
        per_item.filter(F.col("rn") == 1)
        .select(
            "item",
            "n_annotations",
            "n_labels",
            F.col("label").alias("majority_label"),
            F.col("cnt").alias("majority_n"),
            F.round(
                F.col("cnt").cast("double") / F.col("n_annotations"), 6
            ).alias("agreement"),
        )
    )


def annotator_agreement(
    df: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-annotator consensus alignment: ``(annotator, n_votes,
    n_match, accuracy)`` — accuracy = fraction of this annotator's
    VOTES that equal their item's majority label (vote-weighted: a
    raw resubmit stream with several votes on one (item, annotator)
    counts each vote; dedupe upstream if item-weighting is wanted).

    The majority frame is items-sized (small side) and joins back to
    the vote stream on the item key; votes themselves shuffle once.
    """
    maj = majority_labels(df, item_col, annotator_col, label_col).select(
        "item", "majority_label"
    )
    votes = df.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("annotator"),
        F.col(label_col).alias("label"),
    )
    joined = votes.join(maj, "item")
    return joined.groupBy("annotator").agg(
        F.count("*").alias("n_votes"),
        F.sum(
            F.when(F.col("label") == F.col("majority_label"), 1).otherwise(0)
        ).alias("n_match"),
        F.round(
            F.sum(
                F.when(F.col("label") == F.col("majority_label"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("accuracy"),
    )


def fleiss_kappa_inputs(
    df: DataFrame,
    item_col: str = "item_id",
    label_col: str = "label",
) -> DataFrame:
    """One row ``(n_items, n_raters, p_o, p_e)`` for Fleiss' kappa.

    Requires the fixed-design invariant (every item has the same
    number of ratings n); raises if violated rather than returning a
    statistic whose formula no longer applies.  ``kappa = (p_o - p_e)
    / (1 - p_e)`` is left to the caller — it is a scalar on these two
    numbers.  All aggregation happens on the compact counts frame.
    """
    counts = _vote_counts(df, item_col, label_col)
    per_item = counts.groupBy("item").agg(
        F.sum("cnt").alias("n"),
        # sum_c n_ic * (n_ic - 1)
        F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("agree_pairs"),
    )
    design = per_item.agg(
        F.count("*").alias("n_items"),
        F.min("n").alias("n_min"),
        F.max("n").alias("n_max"),
    ).collect()[0]
    if design["n_min"] != design["n_max"]:
        raise ValueError(
            "fleiss_kappa_inputs requires the same number of ratings per "
            f"item; saw min={design['n_min']} max={design['n_max']}"
        )
    if design["n_min"] < 2:
        raise ValueError(
            "fleiss_kappa_inputs requires >= 2 ratings per item (the "
            "n(n-1) pair denominator is zero otherwise); saw "
            f"n={design['n_min']}"
        )
    n = design["n_min"]
    n_items = design["n_items"]
    p_o = per_item.agg(
        F.round(
            F.sum(F.col("agree_pairs")).cast("double")
            / F.lit(float(n_items * n * (n - 1))),
            6,
        ).alias("p_o")
    )
    # p_e = sum_c (share of all votes going to label c)^2
    label_tot = counts.groupBy("label").agg(F.sum("cnt").alias("tot"))
    p_e = label_tot.agg(
        F.round(
            F.sum(
                (F.col("tot").cast("double") / F.lit(float(n_items * n)))
                * (F.col("tot").cast("double") / F.lit(float(n_items * n)))
            ),
            6,
        ).alias("p_e")
    )
    return (
        p_o.crossJoin(p_e)
        .withColumn("n_items", F.lit(n_items).cast("long"))
        .withColumn("n_raters", F.lit(n).cast("long"))
        .select("n_items", "n_raters", "p_o", "p_e")
    )
