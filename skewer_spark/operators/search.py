"""Full-text search: inverted index + BM25 top-k.

The reference ships an Elasticsearch *sink* (documents are pushed out
for someone else to search, ``/root/reference/store/dests/
elasticsearch.go:215-273``); a standalone analytics engine has to be
able to answer the search itself.  This module is the batch-native
equivalent: materialize an inverted index over the corpus once, then
score ad-hoc queries with BM25 (the Lucene/Elasticsearch default
similarity) without ever re-reading document text.

Scale shape (the 100 TB contract):

* :func:`build_inverted_index` — ONE explode + ONE groupBy((term,
  doc)) shuffle over the corpus; emits ``(term, doc_id, tf, dl)``
  postings.  At 10^12 docs this is the thing you write to a
  term-bucketed table and reuse for every query; the per-doc length is
  denormalized onto the posting so scoring never joins back to the
  corpus.
* :func:`bm25_topk` — scoring touches ONLY the query's postings: the
  ``term IN (...)`` literal filter prunes at the scan (predicate
  pushdown into the postings table's term buckets), document
  frequencies for a handful of terms are a tiny aggregate broadcast
  back, and the final top-k is a ``TakeOrderedAndProject`` (no global
  sort).  Nothing in the query path is proportional to corpus size
  except the pruned postings scan.
* Scoring arithmetic is pure JVM expressions; scores are rounded to
  6 dp *before* ordering so rank ties break deterministically on
  doc_id in any engine (driver-oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tokenizer contract shared with the DuckDB oracles: lowercase,
#: split on runs of non-alphanumerics, drop empty tokens.
_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda t: t != ""
    )


def build_inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Postings frame ``(term, doc_id, tf, dl)``.

    ``tf`` = term frequency in the doc, ``dl`` = doc length in tokens
    (denormalized so scoring is self-contained).  One explode + one
    (term, doc) groupBy; at scale, write this partitioned/bucketed by
    ``term`` so query-time term filters prune partitions.
    """
    # materialize the token array ONCE: Catalyst does not CSE the
    # lower+regex-split across the explode and size expressions, and
    # tokenization is the dominant per-row cost of the corpus pass
    # explode_OUTER + an attribute null-filter: a plain explode makes
    # the optimizer infer `size(_t) > 0` with the whole tokenize chain
    # inlined and push it below the parallelism repartition
    # (single-partition evaluation, r6); the outer variant infers
    # nothing, and the NULL-term row an empty doc emits is dropped by
    # the cheap post-generate filter — identical postings, chain
    # evaluated once, in parallel
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_t")
    ).select(
        "doc_id", F.explode_outer("_t").alias("term"), F.size("_t").alias("dl")
    ).filter(F.col("term").isNotNull())
    return toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row frame ``(n_docs, avgdl)`` — computed once per index
    build, broadcast into every query."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )


def bm25_topk(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs for ``query_terms`` by BM25.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's
    non-negative variant); per-term contribution
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

    Returns ``(doc_id, n_terms_hit, score)`` ordered by
    ``(score desc, doc_id)``; ``score`` is rounded to 6 dp before the
    ordering so the cut at rank k is engine-independent.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    hit = postings.filter(F.col("term").isin(terms))
    # df per query term: tiny (≤ |terms| rows) → broadcast back
    dfreq = hit.groupBy("term").agg(
        F.count("*").alias("df")
    )
    scored = (
        hit.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum("_contrib"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Index-and-search in one call (for ad-hoc use and the driver
    query; production builds the index once via
    :func:`build_inverted_index` and reuses it)."""
    return bm25_topk(
        build_inverted_index(docs, text_col, id_col),
        corpus_stats(docs, text_col),
        query_terms,
        k=k,
        k1=k1,
        b=b,
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 10,
    k_const: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of candidate lists (Cormack et al.,
    SIGIR'09) — the standard way to combine lexical (BM25) and dense
    (embedding ANN) retrieval into one hybrid ranking.

    Each input frame is an ALREADY-TRUNCATED top-k' candidate list
    shaped ``(id_col, score_col)``; ranks are re-derived here with
    ``row_number`` over ``(score desc, id)`` so the fusion is
    engine-exact as long as upstream scores are rounded (both
    ``bm25_topk`` and ``brute_force_topk`` round to 6 dp).  Fused score
    = Σ over lists of ``1/(k_const + rank)``, rounded to 6 dp before
    the final ``(rrf desc, id)`` cut.

    Scale shape: the unpartitioned rank window runs over k'-row
    candidate frames (tens to thousands of rows), never the corpus —
    the expensive work already happened inside the per-modality
    retrievers, which are bucketed/pruned (see ``bm25_topk`` /
    ``ivf_topk``).  Returns ``(id_col, n_lists, rrf_score)``.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    parts = [
        r.select(id_col, score_col).withColumn(
            "_rank", F.row_number().over(w)
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_lists"),
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k_const)) + F.col("_rank"))),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval-evaluation metrics: recall@k, MRR@k, nDCG@k.

    ``results``: (query_id, doc_id, rank) with rank starting at 1 —
    the output shape of ``bm25_topk`` / the ANN operators after a
    rank column is attached.  ``qrels``: (query_id, doc_id, rel) with
    graded relevance >= 1 (binary qrels pass rel=1).  Both inputs are
    expected (query, doc)-unique — the TREC run/qrels contract;
    duplicates would double-count hits.

    Definitions (standard TREC forms):

    * recall@k  = |relevant retrieved in top-k| / |relevant|
    * MRR@k     = 1 / rank of the first relevant hit (0 if none)
    * nDCG@k    = DCG@k / IDCG@k with DCG = sum rel_i / log2(rank_i + 1)
      and IDCG the DCG of the ideal (relevance-sorted) ordering,
      truncated at k.

    Per-query rows are the audit artifact; means over queries are one
    further tiny aggregate (the caller's choice of macro-averaging).

    Scale shape: ONE hash join of the top-k results against qrels on
    (query, doc) — both sides are narrow int/rank frames, the corpus
    text never appears; per-query aggregates partial-combine, and the
    IDCG side reduces qrels per query independently (no window over
    results).  Safe at millions of queries x thousands of qrels.
    """
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    )
    qr = qrels.filter(F.col(rel_col) >= 1).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    # hits: relevant docs that were retrieved in the top-k
    hits = res.join(qr, ["_q", "_d"]).groupBy("_q").agg(
        F.count(F.lit(1)).alias("_n_hit"),
        F.min("_rank").alias("_first_rank"),
        F.sum(
            F.col("_rel") / F.log2(F.col("_rank").cast("double") + 1.0)
        ).alias("_dcg"),
    )
    # ideal DCG from qrels alone: rel sorted descending, truncated at k
    ideal = qr.groupBy("_q").agg(
        F.count(F.lit(1)).alias("_n_rel"),
        F.aggregate(
            F.zip_with(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.col("_rel") * -1.0)
                    ),
                    1,
                    k,
                ),
                F.sequence(F.lit(1), F.least(F.count(F.lit(1)), F.lit(k)).cast("int")),
                lambda r, i: (-r) / F.log2(i.cast("double") + 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
        ).alias("_idcg"),
    )
    return (
        ideal.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.col("_n_rel").cast("bigint").alias("n_rel"),
            F.coalesce(F.col("_n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(
                F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double")
                / F.col("_n_rel"),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_first_rank").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr_at_k"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"), 6
            ).alias("ndcg_at_k"),
        )
    )
