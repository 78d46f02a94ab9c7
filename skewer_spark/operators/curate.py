"""Composite curation decision: the keep/drop verdict a training-data
pipeline actually ships.

Combines the individual hygiene signals this repo already provides —
exact-dedup keeper, language ID, quality score, benchmark
decontamination — into one per-document decision with the FIRST failing
rule as the reason, in fixed priority order::

    duplicate > language > low_quality > contaminated > kept

Every rule is a deterministic pure expression or an already-oracled
operator, so the whole decision has an exact ANSI-SQL twin (DuckDB
oracle ``q_curation`` in ``__spark_entry__.py``).

Scale shape: language + quality are narrow codegen expressions
(Catalyst pushes them below the exchanges, so text bytes never ride a
shuffle); the dedup keeper is one exchange partitioned on
``md5(text)``; the contamination leg reuses
:func:`~skewer_spark.operators.decontaminate.contamination_report`
(broadcast benchmark shingles) and joins back on id, which costs one
id-keyed exchange per join side.  Total: three corpus-sized exchanges
(md5 window + the two sides of the id join), all of narrow
score/flag rows on compact keys — verified on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skewer_spark.functions.text import lang_id, quality_score
from skewer_spark.operators.decontaminate import contamination_report


def curation_decisions(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_allow: tuple[str, ...] = ("en",),
    min_quality: float = 0.75,
    n: int = 3,
    decontam_threshold: float = 0.1,
) -> DataFrame:
    """Per-document curation verdict.

    Returns ``(id, keeper_id, lang, quality, overlap_frac, reason,
    keep)``; ``keep`` is true iff every gate passes, ``reason`` names
    the first failing gate (or ``'kept'``).  The exact-dedup gate keeps
    the LOWEST id of each identical-text group (``keeper_id``), so
    exactly one member of every duplicate class can survive.
    """
    w = Window.partitionBy(F.md5(F.col(text_col)))
    scored = df.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("keeper_id"),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("quality"),
    )
    contam = contamination_report(
        df, bench_df, text_col, id_col, n, decontam_threshold
    ).select(id_col, "overlap_frac", "contaminated")

    j = scored.join(contam, id_col, "left")
    reason = (
        F.when(F.col(id_col) != F.col("keeper_id"), F.lit("duplicate"))
        .when(~F.col("lang").isin(*lang_allow), F.lit("language"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.coalesce(F.col("contaminated"), F.lit(False)),
              F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        id_col,
        "keeper_id",
        "lang",
        "quality",
        F.coalesce(F.col("overlap_frac"), F.lit(0.0)).alias("overlap_frac"),
        reason.alias("reason"),
        (reason == F.lit("kept")).alias("keep"),
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicate DOWN-WEIGHTING instead of dropping (the SlimPajama /
    DoReMi-style soft alternative to exact dedup): every member of an
    identical-text group of size ``k`` gets ``weight = 1/k``, and a
    deterministic Bernoulli draw keeps each doc with that probability —
    so in expectation each duplicate CLASS contributes one document,
    but which copy survives is an unbiased, reproducible function of
    the id (no RNG state, resume-safe).

    Returns ``(id, n_copies, weight, u, kept)``; ``u`` is the uniform
    draw ``uint32(md5(id)) / 2^32``.  One shuffle on ``md5(text)``
    (same class as :func:`~skewer_spark.operators.dedup.exact_dedup`);
    the draw is a pure expression.
    """
    from skewer_spark.functions.draws import md5_uniform

    w = Window.partitionBy(F.md5(F.col(text_col)))
    u = md5_uniform(id_col)
    n_copies = F.count("*").over(w)
    return df.select(
        F.col(id_col),
        n_copies.alias("n_copies"),
        F.round(F.lit(1.0) / n_copies, 6).alias("weight"),
        F.round(u, 6).alias("u"),
        (u * n_copies < F.lit(1.0)).alias("kept"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword /
    topic-signal extraction over a corpus.

    ``tfidf = (tf / n_tokens) * ln(N / df_term)`` with raw document
    frequency (no smoothing — deterministic and oracle-exact).  Shapes:
    one token explode feeding BOTH aggregates (term-per-doc counts and
    the distinct-doc frequency), doc count ``N`` as a scalar broadcast
    via cross join of a 1-row aggregate, final per-doc top-k via a
    rank-limited window (WindowGroupLimit — never buffers whole
    groups).  Ties break on the term string so results are total-order
    deterministic.
    """
    n_docs = df.select(F.count("*").alias("_N"))
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    doc_len = tf.groupBy(id_col).agg(F.sum("_tf").alias("_len"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        tf.join(doc_len, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            # rounded to 6 dp BEFORE the rank cut (same contract as
            # bm25_topk / weighted_sample): Spark's and the oracle's
            # libm ln() can differ by 1 ulp, and an unrounded order-by
            # would let two near-tied terms swap across the rank<=k
            # boundary between engines
            F.round(
                (F.col("_tf") / F.col("_len"))
                * F.log(F.col("_N") / F.col("_df")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("_score").alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram log-probability — the CCNet-style LM
    perplexity gate (docs whose token transitions are unlike the
    corpus score low; gate on a percentile of ``avg_logprob``).

    Add-``alpha`` smoothed bigram model trained on the corpus itself:
    ``log P(w2|w1) = ln((c(w1,w2)+α) / (c(w1)+α·V))`` with ``V`` the
    corpus unigram vocabulary size.  In production the counts come
    from a fixed reference corpus (CCNet trains on Wikipedia) — swap
    the count frames; the scoring join is identical.

    Returns ``(id, n_bigrams, avg_logprob)``; docs with < 2 tokens get
    0 bigrams and a 0.0 score.  Shapes: one map-side bigram explode
    feeds both count aggregates; scoring joins on the compact bigram
    key; one final per-doc aggregate — every shuffle is on counts or
    narrow keys, text never re-shuffles.
    """
    from skewer_spark.functions.hof import bind

    # bind the split array: element_at(raw-split-expr, i) inside the
    # per-position lambda would re-run the split per bigram (O(n²)/row)
    big = df.select(
        F.col(id_col),
        F.explode(
            bind(
                F.split(F.col(text_col), " "),
                lambda tk: F.when(
                    F.size(tk) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - 1),
                        lambda i: F.struct(
                            F.element_at(tk, i).alias("w1"),
                            F.element_at(tk, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                ),
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")
    bg_counts = big.groupBy("w1", "w2").agg(F.count("*").alias("_cb"))
    # vocabulary from the already-compact (w1, w2, count) frame, not a
    # second corpus-sized distinct over the exploded bigram stream —
    # every w1/w2 of `big` appears as a bg_counts key, so the set is
    # identical and the aggregate touches O(vocab²) rows at most
    un_counts = bg_counts.select(F.col("w1").alias("w")).union(
        bg_counts.select("w2")
    )
    # unigram counts must match "count of tokens", not "count of bigram
    # endpoints": c(w1) as a bigram LEFT context = occurrences of w as
    # non-final token, which is exactly the per-w1 sum of bigram counts
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("_cb").alias("_cw"))
    vocab = un_counts.agg(
        F.count_distinct("w").alias("_V")
    )
    scored = (
        big.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("_cb") + F.lit(alpha))
                / (F.col("_cw") + F.lit(alpha) * F.col("_V"))
            ).alias("_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("avg_logprob"), F.lit(0.0)).alias("avg_logprob"),
        )
    )


def remove_boilerplate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb span-dedup
    curation step): any word ``n``-gram appearing in ≥ ``min_docs``
    DISTINCT documents is boilerplate; every token covered by at least
    one boilerplate n-gram occurrence is cut from its document.

    Returns ``(id, n_tokens, n_removed, text_clean)`` — one row per
    input document (fully-boilerplate docs come back with empty text).

    Scale shape — everything is exploded ROWS, never per-row quadratic
    work (the straggler trap :func:`~skewer_spark.functions.scrub
    .top_word_ratio` had):

    1. map-side posexplode of tokens and of md5'd n-gram positions;
    2. boilerplate vocabulary = distinct (shingle, doc) → count per
       shingle ≥ min_docs — two compact-key exchanges on 32-bit hash
       prefixes, text never shuffles;
    3. covered token positions = shingle-hash join back + sequence
       explode + distinct (doc, pos);
    4. kept tokens = LEFT ANTI join of (doc, pos, token) rows against
       covered positions — Catalyst makes it a shuffled hash join on
       (doc, pos);
    5. rebuild per doc: one groupBy(doc) with
       ``array_sort(collect_list(struct(pos, tok)))`` — order restored
       without a sort-within-partitions pass.

    Four corpus-token-sized exchanges total; at 10^12 docs this is the
    same cost class as the parse pipeline (the token stream rides the
    shuffle once as narrow (id, pos, tok) rows).  The tokenize/shingle
    and rebuild halves are shared with ``dedup.dedup_substring_spans``
    via :mod:`~skewer_spark.operators.spans`.
    """
    from skewer_spark.operators.spans import (
        covered_positions, rebuild_minus_covered, tokenize_and_shingle,
    )

    base, tok_rows, sh_rows = tokenize_and_shingle(df, text_col, id_col, n)
    boiler = (
        sh_rows.select("sh", id_col)
        .distinct()
        .groupBy("sh")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("sh")
    )
    covered = covered_positions(sh_rows.join(boiler, "sh"), id_col, n)
    return rebuild_minus_covered(base, tok_rows, covered, id_col)


def _uni_bigram_array(text_col: str):
    """Array of unigram + bigram features for a whitespace-token text.

    Shared by :func:`dsir_importance_weights` and
    :func:`hashed_classifier_score` — both hash these grams to compact
    bucket keys so the feature stream that shuffles is (id, int) rows,
    never text bytes.
    """
    from skewer_spark.functions.hof import bind

    # bound split array — same O(n²) re-evaluation guard as above
    return bind(
        F.split(F.col(text_col), " "),
        lambda tk: F.concat(
            tk,
            F.when(
                F.size(tk) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(tk, i), F.element_at(tk, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )


def _md5_bucket(col, n_buckets: int):
    """32-bit md5-prefix hash of ``col`` modulo ``n_buckets`` (the same
    compact-key idiom the dedup/DSIR operators use; DuckDB mirrors it
    as ``('0x' || substr(md5(f), 1, 8))::BIGINT % n``)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def dsir_importance_weights(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log importance ratio of two hashed-n-gram bag models — one
    trained on the ``target`` domain, one on the rest of the corpus —
    then keep/sample by score.  The reference repo has no analog; this
    is part of the training-data-pipeline surface.

    ``target`` is a boolean Column marking target-domain rows (e.g.
    ``F.col('lang') == 'en'``).  Features are unigrams AND bigrams
    hashed to ``n_buckets`` buckets via the 32-bit md5 prefix (the same
    compact-key trade the dedup operators use); both bag models are
    add-``alpha`` smoothed over the bucket vocabulary, and the score is
    the per-feature MEAN of ``ln(p_target(b) / p_ref(b))`` so length
    does not dominate (the paper's sum-form is ``score * n_feats``).

    Returns ``(id, n_feats, dsir_score)``.

    Scale shape: one map-side feature explode carries a boolean target
    flag; BOTH models come from a single groupBy(bucket) with
    conditional sums (one compact-key exchange, ``n_buckets`` rows
    out); per-(doc, bucket) counts are one id-keyed narrow exchange;
    scoring joins the broadcast ``n_buckets``-row stats frame; one
    final per-doc aggregate.  Text bytes never ride a shuffle.
    """
    feats = df.select(
        F.col(id_col),
        target.cast("boolean").alias("_tgt"),
        F.explode(_uni_bigram_array(text_col)).alias("_f"),
    ).select(
        id_col,
        "_tgt",
        _md5_bucket(F.col("_f"), n_buckets).alias("_b"),
    )
    stats = feats.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("_cr"),
    )
    # corpus totals via a global window over the n_buckets-row stats
    # frame (tiny by construction) — avoids a self-lineage cross join
    wall = Window.partitionBy(F.lit(0))
    a, ab = F.lit(alpha), F.lit(alpha * n_buckets)
    bucket_lr = stats.select(
        "_b",
        F.log(
            ((F.col("_ct") + a) / (F.sum("_ct").over(wall) + ab))
            / ((F.col("_cr") + a) / (F.sum("_cr").over(wall) + ab))
        ).alias("_lr"),
    )
    doc_b = feats.groupBy(id_col, "_b").agg(F.count("*").alias("_n"))
    lr = F.col("_lr")
    return (
        doc_b.join(F.broadcast(bucket_lr), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_feats"),
            F.round(
                F.sum(F.col("_n") * lr) / F.sum("_n"), 6
            ).alias("dsir_score"),
        )
    )


def hashed_classifier_score(
    df: DataFrame,
    weights: dict[int, int] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1000,
) -> DataFrame:
    """fastText-style linear quality-classifier INFERENCE at corpus
    scale (the GPT-3 / CCNet "quality filter" stage: a small linear
    model over hashed bag-of-n-gram features scores every document;
    docs under a threshold are dropped or down-sampled).

    Training happens out of band on labeled samples (fastText, sklearn
    — tiny data); what must scale is inference, and that is pure
    DataFrame ops here.  ``weights`` maps feature bucket → INTEGER
    weight in [-scale, scale] (an exported model, quantized); the score
    is::

        clf_score = bias + (Σ_b n_b · w_b) / (n_feats · scale)

    i.e. bias + mean feature weight in [-1, 1].  The dot product is an
    exact BIGINT sum — independent of partition order, so the DuckDB
    oracle reproduces the hash bit-for-bit (same trick as
    ``kmeans_update``).  With ``weights=None`` a deterministic LCG
    assigns demo weights ``(b·1103515245 + 12345) % 2001 − 1000`` —
    exercised by the correctness harness, where the weight lookup
    collapses to a pure expression (no join at all).

    Returns ``(id, n_feats, clf_score, keep)``.

    Scale shape: one map-side feature explode → one groupBy(id, bucket)
    exchange on compact keys → weight attach (pure expression for LCG
    weights; broadcast of the ≤ ``n_buckets``-row weight frame for a
    real model) → one per-doc aggregate.  Text bytes never shuffle.
    """
    feats = df.select(
        F.col(id_col), F.explode(_uni_bigram_array(text_col)).alias("_f")
    ).select(id_col, _md5_bucket(F.col("_f"), n_buckets).alias("_b"))
    doc_b = feats.groupBy(id_col, "_b").agg(F.count("*").alias("_n"))
    if weights is None:
        w = (F.col("_b") * F.lit(1103515245) + F.lit(12345)) % F.lit(2001) - F.lit(1000)
        weighted = doc_b.withColumn("_w", w.cast("long"))
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(int(b), int(wt)) for b, wt in sorted(weights.items())],
            "_b long, _w long",
        )
        weighted = doc_b.join(F.broadcast(wdf), "_b", "left").fillna(
            {"_w": 0}
        )
    return (
        weighted.groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_feats"),
            F.round(
                F.lit(float(bias))
                + F.sum(F.col("_n") * F.col("_w")).cast("double")
                / (F.sum("_n") * F.lit(float(scale))),
                6,
            ).alias("clf_score"),
        )
        .withColumn("keep", F.col("clf_score") >= F.lit(float(threshold)))
    )


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: list[str] | None = None,
    blocked_tlds: tuple[str, ...] = ("zip", "xxx"),
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """URL-based document filter (the C4/RefinedWeb pre-content stage:
    drop documents by source URL before ever touching the text).

    Extracts ``scheme`` / ``host`` / approximate registrable
    ``domain`` / ``tld`` with pure regex expressions (Java∩RE2 syntax
    so a DuckDB oracle evaluates the identical patterns), then applies
    rules in fixed priority order — first failing rule is the
    ``reason``::

        missing url > scheme ∉ allowed > unparseable host
        > blocked domain > blocked TLD > kept

    The missing-url rule is first and EXPLICIT: with it absent, a NULL
    url makes every other condition evaluate NULL, so the CASE falls
    through to ``kept`` and an unidentifiable document silently passes
    the filter (the one outcome a fail-closed pre-content gate must
    never produce).

    Returns ``(id, url, scheme, host, domain, tld, keep, reason)``.

    Scale shape: scheme/host/tld are narrow codegen expressions riding
    the scan (zero shuffles); the domain blocklist — UT1-style lists
    run to ~10^6 entries, far past ``isin`` literal folding — joins as
    an explicit ``broadcast`` on the compact domain key, so the corpus
    never shuffles.  "Registrable domain" is the last two host labels
    (documented approximation: a public-suffix-list join plugs in at
    the same broadcast point).
    """
    spark = df.sparkSession
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)", 1
        )
    )
    host_nw = F.regexp_replace(host, r"^www\.", "")
    tld = F.regexp_extract(host_nw, r"\.([a-z0-9-]+)$", 1)
    dom2 = F.regexp_extract(host_nw, r"([a-z0-9-]+\.[a-z0-9-]+)$", 1)
    domain = F.when(dom2 != "", dom2).otherwise(host_nw)

    parsed = df.select(
        F.col(id_col),
        url.alias("url"),
        scheme.alias("scheme"),
        host_nw.alias("host"),
        domain.alias("domain"),
        tld.alias("tld"),
    )
    block = spark.createDataFrame(
        [(d,) for d in sorted(set(blocked_domains or []))] or [("",)],
        "domain string",
    ).withColumn("_blocked", F.lit(True))
    joined = parsed.join(F.broadcast(block), "domain", "left")

    reason = (
        F.when(F.col("url").isNull() | (F.col("url") == ""), F.lit("no_url"))
        .when(~F.col("scheme").isin(*allowed_schemes), F.lit("scheme"))
        .when(F.col("host") == "", F.lit("no_host"))
        .when(F.col("_blocked").isNotNull(), F.lit("blocked_domain"))
        .when(F.col("tld").isin(*blocked_tlds), F.lit("blocked_tld"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        id_col, "url", "scheme", "host", "domain", "tld",
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "kept")
