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
