"""Mergeable distinct-count sketches for incremental / resumable metrics.

The pipeline's snapshot model (``plans/checkpoint.py``) appends data in
slices: per-bucket waves today, time-sliced ingest on a real cluster.
Counter metrics compose across slices because SUM is associative — but
``COUNT(DISTINCT ...)`` does not: per-slice distinct counts can only be
summed when the slice key partitions the distinct key (true for the
conv-hash buckets, false for time slices, where one conversation spans
many snapshots).  The reference sidesteps this by keeping one global
process counter (``metrics.go`` gauges); at 10^12 turns the Spark-native
answer is a MERGEABLE sketch column stored with each slice's metrics:
new slice → build the slice's partial sketch (one pass over the slice
only) → union with the stored sketches → exact-or-bounded distinct
count for the whole table, never rescanning history.

Two sketch families, both JVM built-ins (no Python in the hot path):

* ``hll_*`` — Apache DataSketches HLL via ``hll_sketch_agg`` /
  ``hll_union_agg``: ~1.6 % error at the default lgK=12, 2–4 KB per
  group, any key type.  Union of partials estimates the union within
  the same error bound as a single-pass sketch (register-wise max);
  at low cardinality (sparse/coupon mode) both are exact, but the two
  build paths are NOT guaranteed bit-identical mid-promotion —
  measured ≤1 % apart at ~800 distinct (pinned by test).  Merging the
  same partials is always deterministic.
* ``bitmap_*`` — exact distinct for integer keys via
  ``bitmap_construct_agg`` / ``bitmap_or_agg``: one bit per potential
  key in 4 KB buckets of 32768 positions.  Exact and mergeable — the
  right tool for dense ids (user ids, event ids); HLL for strings or
  sparse/huge domains.

Scale shape: both build sides are partial-aggregable (map-side combine
on the group keys — the sketch IS the combiner state), the merge side
runs over the tiny metrics frames only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_partials",
    "hll_merge",
    "bitmap_partials",
    "bitmap_merge",
    "bitmap_distinct",
]

_DEFAULT_LGK = 12


def hll_partials(
    df: DataFrame,
    key: str | Column,
    group_cols: list[str],
    lgk: int = _DEFAULT_LGK,
) -> DataFrame:
    """One slice → per-group HLL partial sketches (binary ``hll``).

    Store this next to the slice's counter metrics; it is the only
    state needed to fold the slice into any future distinct count.
    """
    key = F.col(key) if isinstance(key, str) else key
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key, F.lit(lgk)).alias("hll")
    )


def hll_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union stored partials → per-group ``n_distinct`` estimate."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll"))
        .cast("bigint")
        .alias("n_distinct")
    )


def bitmap_partials(
    df: DataFrame,
    key: str | Column,
    group_cols: list[str],
) -> DataFrame:
    """One slice → per-(group, bucket) exact bitmaps for an int key.

    ``(bitmap_bucket_number, bitmap_bit_position)`` is a bijection on
    int64, so distinct keys ↔ distinct set bits: the count is EXACT.
    """
    key = F.col(key) if isinstance(key, str) else key
    return (
        df.select(
            *group_cols,
            F.bitmap_bucket_number(key).alias("bkt"),
            F.bitmap_bit_position(key).alias("pos"),
        )
        .groupBy(*group_cols, "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )


def bitmap_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """OR stored bitmaps bucket-wise, then sum set bits per group."""
    return (
        partials.groupBy(*group_cols, "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy(*group_cols)
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct"))
    )


def bitmap_distinct(
    df: DataFrame,
    key: str | Column,
    group_cols: list[str],
) -> DataFrame:
    """Exact per-group distinct count of an integer key via bitmaps,
    end-to-end (build + merge in one plan).  Same result as
    ``countDistinct`` but the intermediate state is mergeable — split
    the input into arbitrary slices, ``bitmap_partials`` each, and
    ``bitmap_merge`` later gives the identical count (pinned by test).
    """
    return bitmap_merge(bitmap_partials(df, key, group_cols), group_cols)
