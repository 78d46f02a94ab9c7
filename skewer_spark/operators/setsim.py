"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The LSH stack in :mod:`skewer_spark.operators.dedup` trades recall for
speed — banded MinHash *misses* pairs whose signatures never collide.
This module is the complementary EXACT path: every pair of documents
with token-set Jaccard >= t is returned, none invented, none missed
(the guarantee a dedup-compliance pass needs).  Algorithm family:
AllPairs (Bayardo et al., WWW'07) / PPJoin (Xiao et al., WWW'08) prefix
filtering, re-expressed as three DataFrame shuffles.

Prefix-filtering principle (Chaudhuri et al., ICDE'06): order every
set's tokens by one global total order; if ``J(x, y) >= t`` then the
first ``|x| - ceil(t*|x|) + 1`` tokens of x and the first
``|y| - ceil(t*|y|) + 1`` tokens of y share at least one token.  So an
equi-join on *prefix* tokens generates a candidate superset, and an
exact verify keeps only true pairs.  The global order is
(document-frequency ascending, token) — rarest-first, so the tokens
that land in prefixes are the most selective ones and hot stopwords
never generate candidates unless a doc is almost all stopwords.

Scale shape (the 100 TB contract):

* index build = TWO corpus-scale shuffles: one ``groupBy(token)`` for
  document frequencies, one token-keyed join to stamp df back onto the
  exploded token stream, then a per-doc ``sort_array(struct(df, tok))``
  aggregate.  Both are partial-aggregable / sort-merge shapes.
* candidate generation = equi-join of the exploded PREFIX stream with
  itself on the token, ``id_a < id_b`` AND the size-ratio filter
  ``t*|x| <= |y| <= |x|/t`` *inside* the join condition (never
  materialize the unfiltered product).  The prefix stream is
  ``repartition(n, tok)`` explicitly: AQE sizes post-shuffle partitions
  by the shuffle's INPUT bytes and would coalesce this
  quadratic-OUTPUT join onto too few tasks (same guard as
  ``dedup._band_pairs``).
* verify = the candidate frame (narrow ``(id_a, id_b)``) joins the
  per-doc token arrays twice and computes exact Jaccard via
  ``array_intersect`` in codegen — candidates x tokens never becomes a
  shuffled row explosion (same shape as ``ngram_jaccard_pairs``).

Unlike the LSH operators there is NO bucket cap: a cap would break the
exactness contract.  The worst case — a corpus where many documents
share their *rarest* tokens — is exactly the case where those pairs are
real near-duplicates, i.e. the output itself is large; prefix + size
filtering bounds the candidates that FAIL verification.

Reference parity: the reference has no similarity search at all (it is
a syslog router); this operator is part of the training-data toolbox
the task brief adds on top (SURVEY.md "beyond the reference" section).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import _tokens


def _doc_token_frame(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """``(doc_id, tok)`` distinct set elements per doc.

    ``shingle_n=1`` → word tokens (lowercase, non-alphanumeric split —
    the tokenizer contract shared with the DuckDB oracles via
    :mod:`skewer_spark.operators.search`); ``shingle_n>1`` → word
    n-gram shingles over those tokens (space-joined).  Shingles are
    the right granularity for near-dup detection on small-vocabulary
    corpora where plain word SETS of unrelated docs already overlap
    heavily (measured on the driver fixture: 74% of all doc pairs have
    word-set Jaccard >= 0.5, but only the 25 planted near-dup pairs
    have bigram-shingle Jaccard >= 0.5)."""
    words = _tokens(text_col)
    if shingle_n <= 1:
        elems = F.array_distinct(words)
    else:
        n = shingle_n
        elems = F.array_distinct(
            F.when(
                F.size(words) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(elems).alias("tok")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 1,
    shuffle_parts: int | None = None,
) -> DataFrame:
    """All pairs with set Jaccard >= ``threshold`` — EXACT.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and jaccard
    rounded to 6 dp (driver-oracle determinism contract).  Documents
    with zero set elements never pair (Jaccard undefined → excluded),
    which matches the brute-force oracle that only enumerates docs with
    non-empty sets.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    t = float(threshold)

    toks = _doc_token_frame(df, text_col, id_col, shingle_n)

    # global order: document frequency ascending, token as tiebreak.
    # |vocab| rows; the join back onto the token stream is the index
    # build's second corpus shuffle (sort-merge on tok at scale).
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "tok"))
            ).alias("_ord")
        )
        .select(
            "doc_id",
            F.transform("_ord", lambda s: s["tok"]).alias("toks"),
            F.size("_ord").alias("sz"),
        )
        .filter(F.col("sz") > 0)
    )

    # probing prefix: |x| - ceil(t*|x|) + 1 rarest tokens.  ceil via
    # integer arithmetic (no float rounding at the boundary).
    prefix_len = F.col("sz") - F.ceil(F.col("sz") * F.lit(t)).cast("int") + 1
    prefix = ordered.select(
        "doc_id",
        "sz",
        F.explode(F.slice("toks", 1, prefix_len)).alias("tok"),
    )

    sc = df.sparkSession
    n_parts = shuffle_parts or int(
        sc.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # explicit fixed-width exchange: AQE would size this self-join's
    # post-shuffle partitions by INPUT bytes and coalesce the
    # quadratic-output join onto one task (CLAUDE.md / _band_pairs)
    prefix = prefix.repartition(n_parts, "tok")

    a = prefix.select(
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        "tok",
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        "tok",
    )
    # size-ratio filter in the join condition: J >= t forces
    # t*|x| <= |y| <= |x|/t; with id_a < id_b both directions apply.
    cands = (
        a.join(
            b,
            on=[
                a["tok"] == b["tok"],
                a["id_a"] < b["id_b"],
                b["sz_b"] * F.lit(t) <= a["sz_a"],
                a["sz_a"] * F.lit(t) <= b["sz_b"],
            ],
        )
        .select("id_a", "id_b")
        .distinct()
    )

    sets_a = ordered.select(
        F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a")
    )
    sets_b = ordered.select(
        F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b")
    )
    n_inter = F.size(F.array_intersect("toks_a", "toks_b"))
    denom = F.size("toks_a") + F.size("toks_b") - n_inter
    jac = F.round(n_inter / denom, 6)
    return (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(t))
    )
