"""Key-skew diagnostics: measure a join/agg key's distribution BEFORE
committing 100 TB to a shuffle on it.

Every skew mitigation in this repo — the ``(conv_id, turn_idx/8192)``
sub-bucketing in ``dedup_and_rank``, the as-of join's coarse-time
buckets, the LSH bucket caps — was motivated by a skewed key
distribution.  This operator is the *measurement* those decisions
should start from: given a candidate key, report how hot its hottest
values are, how much of the table they own, and the summary numbers a
planner needs (max/mean ratio, top-k coverage, Shannon entropy vs the
uniform bound).

Output of :func:`key_skew_report`: the ``top_n`` heaviest keys, each
row carrying the global stats alongside — ``(key…, cnt, share, rank,
n_rows, n_keys, skew_ratio, top_share, entropy, entropy_max)``.  Read
it as: ``skew_ratio`` ≈ 1 → uniform, safe; ``skew_ratio`` > ~20 with
``top_share`` concentrated → salt the key or sub-bucket before joining
on it.

Scale shape (the 100 TB contract): ONE partial-aggregable
``groupBy(key)`` touches the corpus (count combines map-side; a hot
key's billions of rows arrive at the reducer as one partial per map
task, so measuring skew does not itself suffer the skew); everything
after — summary aggregate, top-k cut — runs on the compact
|distinct keys| frame, and the top-k is a ``row_number`` window over a
single global ordering of that compact frame (TakeOrdered-sized, with
the deterministic (cnt DESC, key ASC) tie-break).

Reference parity: no analog in the reference; part of the
scale-engineering toolbox the task brief adds (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Top-``top_n`` heaviest key values with global skew stats.

    ``entropy`` is the Shannon entropy (bits) of the key distribution,
    ``entropy_max = log2(n_keys)`` its uniform ceiling — the gap is
    the usual one-number skew summary.  All floats rounded 6dp (the
    cross-engine canonicalization contract)."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    summary = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("_max_cnt"),
        # Shannon entropy in bits: -sum(p log2 p); exact on the compact
        # counts frame (sum of per-key terms is partial-aggregable)
        F.sum(
            F.col("cnt").cast("double") * F.log2(F.col("cnt").cast("double"))
        ).alias("_sum_nlogn"),
    )
    # top-k via sort+limit = TakeOrderedAndProject (per-partition heaps
    # + driver merge — never a corpus-global single-partition window
    # over all distinct keys); rank is then a window over the tiny
    # ≤ top_n row frame only
    order = [F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols]]
    top = counts.orderBy(*order).limit(top_n)
    top = top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    out = top.crossJoin(F.broadcast(summary))
    n_rows_d = F.col("n_rows").cast("double")
    entropy = F.log2(n_rows_d) - F.col("_sum_nlogn") / n_rows_d
    return out.select(
        *key_cols,
        "cnt",
        F.round(F.col("cnt").cast("double") / n_rows_d, 6).alias("share"),
        "rank",
        "n_rows",
        "n_keys",
        F.round(
            F.col("_max_cnt").cast("double")
            / (n_rows_d / F.col("n_keys").cast("double")),
            6,
        ).alias("skew_ratio"),
        F.round(
            F.sum(F.col("cnt")).over(
                Window.partitionBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).cast("double")
            / n_rows_d,
            6,
        ).alias("top_share"),
        F.round(entropy, 6).alias("entropy"),
        F.round(F.log2(F.col("n_keys").cast("double")), 6).alias("entropy_max"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """EXACT inner-equi-join output size, computed WITHOUT running the
    join: ``|A ⋈ B| = Σ_k c_A(k)·c_B(k)`` over the two compact key
    histograms.  The pre-flight check before committing a 100 TB join
    — a blowup shows up here as a huge product on a handful of keys,
    at the cost of two count aggregates instead of the join itself.

    Returns the ``top_n`` largest-contribution keys with global
    context: ``(*key_cols, n_left, n_right, pairs, rank, total_pairs,
    n_join_keys, top_frac)`` — ``pairs`` = that key's output rows,
    ``total_pairs`` the exact full join size, ``top_frac`` the share
    the listed keys own (≈1 ⇒ the blowup is concentrated: salt those
    keys or cap them, the :func:`~skewer_spark.operators.dedup.
    cap_per_group` decision).

    Scale shape: one partial-aggregable ``groupBy(key)`` per side, an
    inner join of the two COMPACT count frames, TakeOrderedAndProject
    top-k (plan shape shared with :func:`key_skew_report`), summary
    broadcast back onto ≤ top_n rows."""
    lc = left.groupBy(*key_cols).agg(F.count("*").alias("n_left"))
    rc = right.groupBy(*key_cols).agg(F.count("*").alias("n_right"))
    # products in DOUBLE: two 4e9-row sides give 1.6e19 pairs, past
    # int64 — in non-ANSI mode a BIGINT product would WRAP NEGATIVE and
    # rank the blowup key last, green-lighting the very join this
    # operator exists to flag; double loses ULPs above 2^53 but stays
    # monotone
    prod = lc.join(rc, key_cols).withColumn(
        "pairs", F.col("n_left").cast("double") * F.col("n_right").cast("double")
    )
    summary = prod.agg(
        F.sum("pairs").alias("total_pairs"),
        F.count("*").alias("n_join_keys"),
    )
    order = [F.col("pairs").desc(), *[F.col(c).asc() for c in key_cols]]
    top = prod.orderBy(*order).limit(top_n)
    top = top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    out = top.crossJoin(F.broadcast(summary))
    topsum = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.select(
        *key_cols,
        "n_left",
        "n_right",
        "pairs",
        "rank",
        "total_pairs",
        "n_join_keys",
        F.round(
            F.sum("pairs").over(topsum)
            / F.greatest(F.col("total_pairs"), F.lit(1.0)),
            6,
        ).alias("top_frac"),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation: per-key count/sum/min/max that a
    single hot key cannot bottleneck.

    The generic form of the skew discipline `enrich.dedup_and_rank`
    applies to hot conversations: stage 1 groups by ``(key, salt)`` so
    a key holding 10% of 10^12 rows spreads over ``n_salts`` reducers;
    stage 2 re-reduces the ``n_salts`` partial rows per key to finals.
    count/sum/min/max are all associative, so the two-stage result is
    EXACTLY the one-stage result — the paired oracle is a plain
    GROUP BY, which is the point: same answer, bounded per-task work.

    The salt mixes the row's value hash with its physical partition id
    — a hot key whose values are all IDENTICAL (the common log shape)
    still spreads.  The salt influences only WHERE partials compute,
    never the result (associative re-reduce), so salt nondeterminism
    is harmless — the repo determinism contract binds results, and the
    oracle equality holds for any salt assignment by construction.
    Pass ``salt_col`` to reuse an existing shard column instead.
    Note partial-aggregation (map-side combine) already handles skew
    for THESE metrics when Catalyst plans it; the explicit salt stage
    is the pattern needed the moment the agg is NOT map-combinable
    (exact distincts, collect_list, percentile buffers) — this
    operator pins the shape with the simple metrics so the plan test
    can assert both exchanges stay partial-aggregable.

    Output: one row per key: ``(key…, n_rows, sum_v, min_v, max_v,
    avg_v)`` with sum/avg rounded 6dp.
    """
    v = F.col(value_col).cast("double")
    salt = (
        F.col(salt_col)
        if salt_col is not None
        else F.pmod(F.hash(v, F.spark_partition_id()), F.lit(n_salts))
    )
    partial = df.groupBy(
        *[F.col(c) for c in key_cols], salt.alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).alias("_s"),
        F.min(v).alias("_mn"),
        F.max(v).alias("_mx"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n_rows"),
        F.round(F.sum("_s"), 6).alias("sum_v"),
        F.min("_mn").alias("min_v"),
        F.max("_mx").alias("max_v"),
        F.round(F.sum("_s") / F.sum("_n"), 6).alias("avg_v"),
    )


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 10,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-group top-k WITHOUT a full per-group sort — the "top
    k docs per domain by quality score" primitive at 10^12 rows.

    The window formulation (``row_number() over (partition by key
    order by v desc)``) sorts EVERY row of every group and puts each
    whole group on one task — a hot group is both a straggler and a
    spill.  Top-k is associative, so it two-stages like
    :func:`salted_agg`:

    * stage 1 groups by ``(key, salt)`` and keeps each partial's top-k
      as a sorted k-array (``slice(array_sort(collect_list(...)))`` —
      bounded at k·n_salts rows per key, never the group's row count);
    * stage 2 flattens the ≤ n_salts arrays per key and re-takes the
      global top-k on ≤ k·n_salts elements — driver-grade work per
      key, fully parallel across keys.

    Exactness: every global top-k element is in its salt's top-k, so
    stage 2 sees all of them.  Determinism: ties order by
    ``(v DESC, id ASC)``; the salt only routes partials
    (associativity, see salted_agg).  Output explodes back to rows
    ``(key…, rank, id, v)``, rank 1-based.

    Caveat: stage 1's ``collect_list`` holds one group-partial's rows
    in the agg buffer before slicing; the salt bounds that at
    |group|/n_salts.  For extreme groups raise ``n_salts`` (or
    pre-slice with an extra salt tier) — the knob the docstring of
    key_skew_report exists to inform.
    """
    v = F.col(value_col).cast("double")
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salts))
    # sort ascending on (-v, id): highest value first, id tie-break
    item = F.struct((-v).alias("nv"), F.col(id_col).alias("id"))
    partial = (
        df.groupBy(*[F.col(c) for c in key_cols], salt.alias("_salt"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(item)), 1, k
            ).alias("_top")
        )
    )
    merged = partial.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list(F.col("_top")))), 1, k
        ).alias("_top")
    )
    exploded = merged.select(
        *key_cols, F.posexplode(F.col("_top")).alias("_pos", "_e")
    )
    return exploded.select(
        *key_cols,
        (F.col("_pos") + 1).cast("int").alias("rank"),
        F.col("_e.id").alias(id_col),
        (-F.col("_e.nv")).alias(value_col),
    )
