"""Collocation mining: PMI-scored adjacent bigrams over a corpus.

The classic corpus-statistics operator (Church & Hanks 1990): which
word pairs co-occur far more than chance?  Training-data pipelines use
it to find multi-word expressions worth protecting from tokenizer
splits, boilerplate phrases worth ablating, and domain vocabulary for
mixture diagnostics.  ``pmi = log2( p(x,y) / (p(x)·p(y)) )`` with
``p(x,y)`` over adjacent-bigram occurrences and ``p(x)`` over unigram
occurrences; a ``min_count`` floor removes the low-frequency pairs
whose PMI is pure noise (the standard correction).

Scale shape (the 100 TB contract): unigrams and bigrams each explode
once and reduce through ONE partial-aggregable ``groupBy`` (hot words
combine map-side); the two corpus totals collapse to a 1-row frame
that broadcast-joins onto the counts; the final PMI join runs on the
two COMPACT count frames (vocab- and pair-sized, never corpus-sized).
The bigram stream is built by zipping each document's token array with
its own tail — a narrow map, NOT a window or self-join per document.

Reference parity: no analog in the reference; part of the
training-data toolbox the task brief adds (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import _tokens


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """``(w1, w2, n_pair, n_w1, n_w2, pmi)`` for every adjacent bigram
    occurring >= ``min_count`` times.  PMI rounded 6dp (the
    cross-engine canonicalization contract); occurrence counts (not
    document counts) on both margins."""
    words = df.select(_tokens(text_col).alias("w"))
    # both explodes are OUTER + a cheap attribute null-filter: a plain
    # explode makes the optimizer infer a `size(...) > 0` predicate
    # with the whole tokenize (resp. zip_with-slice) chain inlined and
    # push it below the parallelism repartition — single-partition
    # evaluation of the heaviest expression (r6); the outer variant
    # infers nothing and the NULL rows empty/short docs emit die in the
    # attribute filter — identical counts, chains evaluated once, in
    # parallel
    uni = (
        words.select(F.explode_outer("w").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    big_all = (
        words.select(
            F.explode_outer(
                F.zip_with(
                    F.slice(
                        F.col("w"), F.lit(1), F.greatest(F.size("w") - 1, F.lit(0))
                    ),
                    F.slice(
                        F.col("w"), F.lit(2), F.greatest(F.size("w") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
    )
    big = big_all.filter(F.col("n_pair") >= min_count)
    # both corpus totals derive from the COMPACT count frames (the
    # margin sums), never a third tokenization pass over the corpus —
    # Catalyst does not CSE independent subtrees (the linkage.py
    # lesson), so a words-based total would re-scan and re-regex
    # everything
    totals = uni.agg(F.sum("n_tok").alias("n_uni_total")).crossJoin(
        big_all.agg(F.sum("n_pair").alias("n_big_total"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_w2"))
    joined = big.join(u1, "w1").join(u2, "w2").crossJoin(F.broadcast(totals))
    p_xy = F.col("n_pair").cast("double") / F.col("n_big_total").cast("double")
    p_x = F.col("n_w1").cast("double") / F.col("n_uni_total").cast("double")
    p_y = F.col("n_w2").cast("double") / F.col("n_uni_total").cast("double")
    return joined.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        F.round(F.log2(p_xy / (p_x * p_y)), 6).alias("pmi"),
    )
