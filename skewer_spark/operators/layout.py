"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Parquet/Iceberg scans prune on per-file min/max statistics.  Sorting a
table by ONE column makes that column's stats tight and every other
column's stats useless; interleaving the bits of several columns
(the Morton / Z space-filling curve — Delta ``OPTIMIZE ZORDER BY`` and
Iceberg's ``sort_order`` z-transform do exactly this) keeps each file
covering a small HYPER-RECTANGLE of the key space, so selective filters
on ANY participating column skip most files.  At 100 TB this is the
difference between a point-ish query opening a handful of files and
opening all of them: the layout cost is paid once at write time.

Mechanics, all pure JVM arithmetic (flat add/shift expression tree —
whole-stage codegen, no UDF, no HOF):

* ``interleave_bits`` — the Morton core: bit ``j`` of column ``c``
  lands at position ``j * k + c`` of the z-value.  Positions are
  disjoint, so the combine is a plain sum — the same formula any SQL
  oracle can state.
* ``zorder_key`` — normalizes real columns onto the ``[0, 2^bits)``
  grid with driver-side min/max literals (one tiny aggregate, the
  kmeans/IVF broadcast-literal pattern), then interleaves.  For
  heavily skewed columns swap the linear min/max literals for sampled
  ``approx_percentile`` boundaries (what Delta does) — the interleave
  core is unchanged.
* ``zorder_repartition`` — ``repartitionByRange(zkey)`` +
  ``sortWithinPartitions(zkey)``: each output file owns one contiguous
  z-range = one tile of the key space, and range partitioning samples
  boundaries so tiles stay balanced even when the z-space is unevenly
  populated.

The locality win is pinned by test: a 64×64 grid written as 16 files,
box-filtered on the NON-sorted dimension, touches all 16 files of a
linearly-sorted layout but only a corner's worth of z-ordered ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "interleave_bits",
    "zorder_key",
    "zorder_repartition",
    "write_bucketed",
]


def interleave_bits(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``k`` integer columns already in [0, 2^bits).

    ``k * bits`` must fit a signed int64 (≤ 62).  Inputs outside the
    grid would collide silently, so callers normalize first
    (``zorder_key``); this core stays branch-free.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("interleave needs >= 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows int64")
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    z = F.lit(0).cast("bigint")
    for ci, col in enumerate(cols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * k + ci
            )
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Morton key over ``cols``, min/max-normalized to the grid.

    One tiny aggregate collects per-column min/max (driver literals —
    the data rows never shuffle for this); each column is then
    linearly bucketed into [0, 2^bits) and interleaved.  A constant or
    all-null column contributes 0 to every key (harmless: its bits are
    constant anyway).
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    n = 1 << bits
    tmp_names = []
    out = df
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        name = f"_zb_{c}"
        tmp_names.append(name)
        if mn is None or mx is None or mx <= mn:
            part = F.lit(0).cast("bigint")
        else:
            scaled = (F.col(c).cast("double") - F.lit(mn)) * F.lit(
                n / (mx - mn)
            )
            # max value scales to exactly n -> clamp into the top cell;
            # nulls sort as cell 0
            part = F.coalesce(
                F.least(F.floor(scaled).cast("bigint"), F.lit(n - 1)),
                F.lit(0),
            )
        out = out.withColumn(name, part)
    z = interleave_bits(tmp_names, bits=bits)
    return out.withColumn(out_col, z).drop(*tmp_names)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort by the Morton key: ``n_files`` output
    tasks, each owning one contiguous z-range (one key-space tile)."""
    keyed = zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions(
        "zkey"
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a hash-BUCKETED table (Hive bucketing / Iceberg
    bucket-partition-transform analog): the shuffle-elimination layout.

    Z-order (above) buys scan pruning; bucketing buys JOIN and
    AGGREGATE pruning.  A table bucketed by ``conv_id`` satisfies the
    hash-clustering requirement of every downstream
    ``join``/``groupBy`` on ``conv_id`` AT THE SCAN, so two co-bucketed
    tables sort-merge-join with ZERO exchange on either side and a
    ``groupBy(conv_id)`` aggregates with no shuffle at all — at 100 TB
    the single biggest cost in a repeated-join pipeline (re-keying the
    corpus once per join) is paid once, at write time.  Equality
    filters on the bucket column additionally prune to 1/n_buckets of
    the files (``SelectedBucketsCount`` in the scan node).

    Mechanics:

    * the frame is pre-``repartition(n_buckets, bucket_cols)``-ed:
      Spark's writer assigns bucket ids with the same
      ``pmod(murmur3, n)`` family as hash partitioning, so each task
      then holds exactly ONE bucket and writes exactly ONE file —
      without this, every task writes a sliver of every bucket
      (n_tasks × n_buckets small files), and multi-file buckets void
      the ``sortBy`` ordering guarantee that lets the join skip its
      per-partition Sort.
    * ``sort_cols`` (default: the bucket columns) makes each bucket
      file internally sorted, so a sort-merge join reads it as-is.
    * ``path`` makes the table external (data at ``path``, metadata in
      the catalog) — on a real cluster this is the warehouse/Iceberg
      location; in tests a tmpdir.

    Pick ``n_buckets`` so one bucket ≈ 128–512 MB at the target scale
    (10^12 turns ≈ 100 TB → ~2^18 buckets); both join sides must use
    the SAME bucket count and key for the exchange-free plan.
    """
    if sort_cols is None:
        sort_cols = list(bucket_cols)
    out = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    w = (
        out.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def range_partition_plan(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 8,
) -> DataFrame:
    """Range-partitioner boundary planning: the percentile boundaries
    a global sort/write would use, plus the per-range row counts that
    prove they balance.

    This is the explicit version of what ``repartitionByRange`` does
    internally with reservoir sampling — computed exactly and
    deterministically so the layout decision (how many output ranges,
    where the cuts land, whether a hot key swamps one range) is
    auditable BEFORE paying for the 100 TB sort.  Iceberg
    ``sort_order`` planning and Spark's own exchange both consume
    boundaries of exactly this shape.

    Semantics: boundaries are the exact ``i/n`` quantiles
    (``F.percentile`` — the DuckDB ``quantile_cont``-proven pairing,
    rounded 6dp; ``approx_percentile`` is the documented 100 TB swap),
    and a row belongs to partition ``#{boundaries strictly below its
    key}`` — keys equal to a boundary go LEFT, so every engine that
    agrees on the rounded boundaries agrees on the assignment.

    Output: one row per non-empty range — ``(pid, n_rows, frac,
    lo_bound, hi_bound)`` where the outer bounds are NULL (unbounded).

    Scale shape: one exact-percentile aggregate (1-row broadcast),
    assignment as a pure projection (``size(filter(...))`` over the
    n-1 element boundary array literal — codegen, no join per row),
    one partial-aggregable groupBy(pid).  The corpus never reshuffles
    on the key; only compact (pid, count) rows move.
    """
    v = F.col(key_col).cast("double")
    fracs = [i / n_partitions for i in range(1, n_partitions)]
    bounds = df.agg(
        F.array(
            *[F.round(F.percentile(v, F.lit(p)), 6) for p in fracs]
        ).alias("_bnds")
    )
    assigned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.size(F.filter("_bnds", lambda b: v > b)).alias("pid"),
            F.col("_bnds"),
        )
    )
    counts = assigned.groupBy("pid", "_bnds").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("pid").cast("int").alias("pid"),
            "n_rows",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("frac"),
            F.when(
                F.col("pid") > 0, F.col("_bnds")[F.col("pid") - 1]
            ).alias("lo_bound"),
            F.when(
                F.col("pid") < n_partitions - 1,
                F.col("_bnds")[F.col("pid")],
            ).alias("hi_bound"),
        )
    )
