"""Corpus selection & mixing — the last-mile operators between curation
and sequence packing in a training-data pipeline: pick which documents
to train on (token-budget selection), decide how much of each domain to
sample (temperature mixing weights), and lay the result out in
deterministic shuffled shards for the trainer.

No reference analog (the reference is a log gateway,
/root/reference/README.md:1); this extends the training-data-pipeline
surface alongside operators/curate.py and operators/pack.py.

Scale shapes (all plan-guarded in tests/test_plans.py):

- ``token_budget_select`` is a distributed prefix sum over *score*
  order — the same range-bucket two-phase form as
  :func:`skewer_spark.operators.pack.pack_sequences` (per-bucket
  running totals + broadcast base offsets), never a single-partition
  corpus-wide window.
- ``mixture_weights`` aggregates to one row per group first; the only
  global window runs over that tiny frame.
- ``shard_and_shuffle`` partitions its ordering window by the shard id,
  so the sort parallelizes across ``n_shards`` (at 100 TB you run
  ~10^5 shards and every sort is shard-local).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from skewer_spark.functions.draws import md5_uniform
from skewer_spark.functions.text import token_count


def token_budget_select(
    df: DataFrame,
    score: Column,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    tie_safe: bool = True,
) -> DataFrame:
    """Greedy token-budget corpus selection: walk documents in
    ``(score DESC, id ASC)`` order and keep each whole document while
    the running token total stays within ``budget_tokens``.

    Returns one row per input document::

        (id, n_tokens, score, cum_tokens, selected)

    where ``cum_tokens`` is the running total *including* the row and
    ``selected`` marks the kept prefix (``cum_tokens <= budget``).

    The running total is the bucketed two-phase prefix sum: documents
    bucket monotonically along the ``(score DESC, id)`` order,
    per-bucket running sums run in parallel, and the ``n_buckets``-row
    totals frame supplies broadcast base offsets.  Bit-equal to the
    global ``SUM() OVER (ORDER BY score DESC, id)`` the oracle runs.

    Bucketing mode — ``tie_safe`` (default) vs value-range:

    * ``tie_safe=True`` assigns buckets with ``repartitionByRange`` on
      the full sort key ``(score DESC, id)`` + ``spark_partition_id``.
      The range partitioner SAMPLES the data for balanced boundaries
      and splits score ties across buckets by id — essential for real
      quality scores, which are coarse (4-decimal grid): at 10^12 docs
      a single popular score value holds a large corpus fraction, and
      any bucket map that is a function of the score alone sends the
      whole tie group to ONE bucket (single-task straggler).  Costs
      one extra exchange (the range repartition) + the sampling pass.
    * ``tie_safe=False`` derives the bucket from the score value via a
      broadcast min/max range map — one fewer exchange, no sampling
      job, but every tie group shares a bucket; use only when scores
      are known continuous/high-cardinality.

    Both modes produce bit-identical output (bucket boundaries never
    affect the sum); the equality is pinned by tests.
    """
    n_tokens = token_count(text_col)
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        n_tokens.alias("n_tokens"),
        score.cast("double").alias("score"),
    )
    if tie_safe:
        # balanced, tie-splitting buckets: range partitions on the full
        # sort key are monotone w.r.t. (score DESC, id) by construction
        bucketed = base.repartitionByRange(
            n_buckets, F.col("score").desc(), F.col(id_col)
        ).withColumn("_bkt", F.spark_partition_id())
    else:
        bounds = base.agg(
            F.min("score").alias("_lo"), F.max("score").alias("_hi")
        )
        bucketed = base.crossJoin(F.broadcast(bounds)).select(
            id_col,
            "n_tokens",
            "score",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("_hi") - F.col("score"))
                            * F.lit(n_buckets)
                            / (F.col("_hi") - F.col("_lo"))
                        ),
                    ),
                )
            )
            .cast("int")
            .alias("_bkt"),
        )
    in_bucket = F.sum("n_tokens").over(
        Window.partitionBy("_bkt")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = bucketed.withColumn("_run", in_bucket)
    base_off = (
        rows.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "_bkt",
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_base"),
        )
    )
    cum = (F.col("_base") + F.col("_run")).alias("cum_tokens")
    return rows.join(F.broadcast(base_off), "_bkt").select(
        id_col,
        "n_tokens",
        "score",
        cum,
        (F.col("_base") + F.col("_run") <= F.lit(budget_tokens)).alias(
            "selected"
        ),
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 2.0,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixing weights (the multilingual /
    multi-domain sampling scheme of mT5 & UniMax): a group holding
    fraction ``p`` of the corpus tokens is sampled with probability
    proportional to ``p^(1/T)``, flattening the head and boosting the
    tail as ``T`` grows (``T=1`` = natural mix, ``T→∞`` = uniform).

    Returns one row per group::

        (group, n_docs, n_tokens, p_raw, mix_weight)

    with ``p_raw`` the natural token share and ``mix_weight`` the
    temperature-normalized sampling weight (both rounded to 6).

    Shape: one compact-key groupBy; the normalizations are global
    windows over the resulting *n_groups*-row frame (tiny by
    construction) — corpus rows never meet a global window.
    """
    n_tokens = token_count(text_col)
    per_group = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_tokens).cast("long").alias("n_tokens"),
    )
    wall = Window.partitionBy(F.lit(0))
    p_raw = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(wall)
    scaled = F.pow(p_raw, 1.0 / temperature)
    return per_group.select(
        "group",
        "n_docs",
        "n_tokens",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(scaled / F.sum(scaled).over(wall), 6).alias("mix_weight"),
    )


def apply_mixture(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
    temperature: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a temperature mix: give every document the number of
    training epochs (copies) that realizes :func:`mixture_weights`
    under a total token budget.

    A group with mixing weight ``w`` gets a target of ``w * budget``
    tokens, i.e. a per-document rate ``r = w * budget / group_tokens``
    (> 1 ⇒ the domain is up-sampled / multi-epoch, < 1 ⇒ down-sampled).
    Each document draws a deterministic uniform ``u`` from the 60-bit
    md5 of its id and receives ``n_copies = floor(r) + (u < frac(r))``
    — so expected group tokens hit the target exactly, the decision is
    reproducible across runs/resumes (no RNG state), and whole
    documents are kept or dropped (never split).

    Returns ``(id, group, n_tokens, rate, n_copies)`` with ``rate``
    rounded to 6.

    Shape: one compact-key groupBy builds the *n_groups*-row weight
    frame (global windows only over that frame), which broadcast-joins
    back onto the corpus; the per-doc draw is pure expression
    arithmetic.  Corpus rows never shuffle.
    """
    weights = mixture_weights(df, group_col, temperature, text_col)
    n_tokens = token_count(text_col)
    # 60-bit uniform (2^-32 quantization would bias tiny expected
    # epoch counts): oracle mirror is
    # ('0x' || substr(md5(id), 1, 15))::BIGINT / 2^60
    u = md5_uniform(id_col, hex_chars=15)
    rate = (
        F.lit(float(budget_tokens))
        * F.col("mix_weight")
        / F.col("n_tokens_group").cast("double")
    )
    return (
        df.select(
            F.col(id_col),
            F.col(group_col).alias("group"),
            n_tokens.alias("n_tokens"),
            u.alias("_u"),
        )
        .join(
            F.broadcast(
                weights.select(
                    "group",
                    F.col("n_tokens").alias("n_tokens_group"),
                    "mix_weight",
                )
            ),
            "group",
        )
        .select(
            id_col,
            "group",
            "n_tokens",
            F.round(rate, 6).alias("rate"),
            (
                F.floor(rate)
                + F.when(
                    F.col("_u") < rate - F.floor(rate), F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_copies"),
        )
    )


def shard_and_shuffle(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every
    document gets a pseudo-random 60-bit key (md5 of its id — stable
    across runs and resumes, no RNG state), a shard assignment, and its
    position within the shard's key-sorted order.

    Returns ``(id, shard, shard_pos)`` — the trainer reads shards in
    any order and each shard's rows in ``shard_pos`` order, giving a
    reproducible corpus-wide shuffle without ever materializing a
    global sort: the ordering window partitions by ``shard``, so the
    sort is shard-local and parallel (run ~10^5 shards at 100 TB).

    60-bit key (15 hex digits) keeps the value positive in a signed
    64-bit long on both engines, matching the oracle's
    ``('0x' || substr(md5(id), 1, 15))::BIGINT``.
    """
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    keyed = df.select(
        F.col(id_col),
        key.alias("_k"),
    ).select(
        id_col,
        F.pmod(F.col("_k"), F.lit(n_shards)).cast("int").alias("shard"),
        "_k",
    )
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy(F.col("_k"), F.col(id_col))
    )
    return keyed.select(
        id_col, "shard", pos.cast("long").alias("shard_pos")
    )


def per_domain_quantile_select(
    df: DataFrame,
    score_col: str = "score",
    domain_col: str = "domain",
    id_col: str = "doc_id",
    q: float = 0.75,
) -> DataFrame:
    """Per-domain quantile thresholding (the FineWeb-style selection
    rule: keep each domain's top ``1 - q`` fraction by score, so one
    prolific low-quality domain cannot crowd out the corpus and small
    high-quality domains are not globally outbid).

    Returns ``(id, domain, score, thr, keep)`` with
    ``keep = score >= thr`` where ``thr`` is domain's exact ``q``-th
    interpolated percentile of ``score``.

    Scale shape: ONE compact-key aggregate computes all thresholds
    (``percentile`` partials combine map-side; the grouped frame is one
    row per domain), then the thresholds come back as an explicit
    ``broadcast`` join — the corpus itself never shuffles, text never
    moves.  Exact ``percentile`` is used here because the driver oracle
    (DuckDB ``quantile_cont``) demands bit-equality; at 100 TB swap in
    ``approx_percentile(score, q, accuracy)`` at the same call site —
    the t-digest partials are mergeable, the rest of the plan is
    unchanged.
    """
    base = df.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.col(score_col).cast("double").alias("score"),
    )
    thr = base.groupBy("domain").agg(
        F.percentile("score", F.lit(float(q))).alias("thr")
    )
    return base.join(F.broadcast(thr), "domain").select(
        id_col,
        "domain",
        "score",
        "thr",
        (F.col("score") >= F.col("thr")).alias("keep"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    per_group: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis & Spirakis 2006): draw ``n`` rows with inclusion
    probability proportional to ``weight_col``, reproducibly.

    Each row gets the uniform ``u = uint32(md5(id)) / 2^32`` (the same
    stateless draw as ``curate.soft_dedup_weights`` — no RNG state, so
    resumes/retries see identical samples) and the A-ES key
    ``r = u^(1/w)``; the sample is the top ``n`` rows by
    ``(round(r, 6) DESC, id)`` — rounded BEFORE the rank cut with an
    id tie-break so the boundary is engine-independent (the BM25
    contract).  Zero/negative weights are excluded outright.

    With ``per_group`` set, the top-n is per group (stratified weighted
    sampling) via a rank window partitioned by the group.

    Scale shape: the key is a narrow pure expression riding the scan;
    the global cut is a ``TakeOrderedAndProject`` (no global sort) and
    the grouped cut is one window exchange partitioned by the group —
    both partial (heap-k per partition) rather than full sorts.
    """
    u = md5_uniform(id_col)
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w > 0).withColumn(
        "sample_key", F.round(F.pow(u, F.lit(1.0) / w), 6)
    )
    if per_group is None:
        return keyed.orderBy(
            F.desc("sample_key"), F.col(id_col).cast("string")
        ).limit(int(n))
    rank = F.row_number().over(
        Window.partitionBy(per_group).orderBy(
            F.desc("sample_key"), F.col(id_col).cast("string")
        )
    )
    return (
        keyed.withColumn("_rk", rank)
        .filter(F.col("_rk") <= int(n))
        .drop("_rk")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Content-keyed train/val/test split assignment.

    A document's split is a pure function of ``md5(salt || '|' || id)``
    — never of its position, shard, or a RNG stream — so the
    assignment is stable under resharding, corpus growth, and job
    retries (adding documents NEVER moves an existing one across
    splits, unlike ``row_number``-based percentage cuts which reshuffle
    every boundary on each insert).  This is the standard web-corpus
    holdout contract: eval leakage is controlled by the key, and the
    same ``(salt, id)`` yields the same split on any engine.

    Mechanics: ``u = uint32`` of the first 8 hex chars of the digest;
    the cut points are the Python-side integers ``int(cum_frac * 2^32)``
    baked in as literals, so both Spark and any oracle compare the same
    integers (no float boundary drift).  Salt rotation = a fresh
    independent assignment (the md5 uniform family trick used across
    ``weighted_sample`` / ``apply_mixture``).

    Scale shape: one narrow expression riding the scan — no shuffle,
    no state; the split column pushes down into partition pruning when
    the output is written partitioned by it.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.select(
        F.col(id_col), _split_branches(u, fractions).alias("split")
    )


def _split_branches(u: Column, fractions: dict[str, float]) -> Column:
    names = list(fractions)
    cum = 0.0
    expr: Column | None = None
    branches = []
    for name in names[:-1]:
        cum += fractions[name]
        branches.append((int(cum * 2**32), name))
    for bound, name in branches:
        cond = u < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])


def split_assign_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-safe holdout split: the split is a pure function of the
    GROUP key, so every member of a group (a near-duplicate cluster, a
    conversation, a user) lands in the same split — near-dups can never
    straddle train/test, the leak that id-keyed splits
    (:func:`split_assign`) silently allow whenever dedup is
    approximate or applied after splitting.

    Same md5-uniform + integer-literal-boundary contract as
    ``split_assign`` (stable under resharding and corpus growth; same
    ``(salt, group)`` → same split on any engine).  One narrow
    expression riding the scan — the group key is already on the row,
    so there is no cluster join and no shuffle here; pair with
    ``dedup.dedup_clusters`` upstream when the group is a dedup label.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(group_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        F.col(group_col),
        _split_branches(u, fractions).alias("split"),
    )
