"""Table-maintenance planning: small-file compaction + zone-map skipping.

The reference durably stores every message in per-destination badger
queues and relies on the store's own value-log GC to keep disk usage
bounded (`/root/reference/store/store.go` — badger ValueLogGC loop).
An Iceberg-backed pipeline at 10^12 turns has the same hygiene problem
in a different shape: every micro-batch commit appends small parquet
files, and scan efficiency decays until a compaction pass rewrites
them into target-sized files.  These operators compute the *plan* —
which files go into which rewrite group, and which files a predicate
scan may skip — as plain DataFrames, so the planning itself is
distributed and the actual rewrite is an embarrassingly parallel
per-group job.

Scale shape:

* ``compaction_plan`` does ONE shuffle: a window over
  ``partition_cols`` ordered by (bytes DESC, file tiebreak).  Bin
  assignment is next-fit on the sorted order via running-sum algebra —
  no sequential driver loop, no UDF; each table partition plans
  independently (the realistic Iceberg layout: compaction never crosses
  partition boundaries).
* ``zonemap_stats`` is one partial-aggregable groupBy(file); the skip
  decision is a pure projection over the min/max columns.  This is
  exactly what Iceberg manifests/parquet footers give a real scan for
  free — computing it explicitly makes the *benefit* measurable
  (``skip_fraction``) before paying for a layout rewrite (see
  ``layout.zorder_layout`` for the rewrite that improves it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def compaction_plan(
    files: DataFrame,
    partition_cols: list[str],
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Assign each small file to a rewrite group of ~``target_bytes``.

    Within each table partition, files are ordered largest-first
    (ties broken by ``file_col`` for determinism) and packed next-fit:
    a file joins the group of ``floor(preceding_bytes / target)``
    where ``preceding_bytes`` is the running total *before* the file.
    Sorting size-descending first keeps big files from straddling
    group boundaries (the classic first-fit-decreasing approximation,
    restricted to the window-expressible next-fit placement).

    Output: one row per file with its ``grp`` plus per-group totals
    (``grp_bytes``, ``grp_files``), so the rewrite driver can launch
    one task per (partition, grp).
    """
    order = [F.col(bytes_col).desc(), F.col(file_col).asc()]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    run = F.sum(bytes_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.select(
        *partition_cols,
        F.col(file_col),
        F.col(bytes_col),
        F.floor((run - F.col(bytes_col)) / F.lit(target_bytes))
        .cast("bigint")
        .alias("grp"),
    )
    gw = Window.partitionBy(*partition_cols, "grp")
    return planned.select(
        "*",
        F.sum(bytes_col).over(gw).alias("grp_bytes"),
        F.count(F.lit(1)).over(gw).alias("grp_files"),
    )


def zonemap_stats(
    df: DataFrame,
    file_col: str,
    value_col: str,
) -> DataFrame:
    """Per-file zone map (min/max/count) for ``value_col``.

    One partial-aggregable groupBy — at 10^12 rows the min/max combine
    map-side and only (file, 2 scalars, count) ride the shuffle.
    """
    return df.groupBy(F.col(file_col)).agg(
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def zonemap_skip(
    zonemaps: DataFrame,
    lo: float,
    hi: float,
    file_col: str = "file_id",
) -> DataFrame:
    """Evaluate which files a ``BETWEEN lo AND hi`` scan may skip.

    A file is skippable iff its zone range is disjoint from the
    predicate range (``max_v < lo OR min_v > hi``) — the same footer
    test parquet row-group pruning applies.  Emits per-file rows plus
    corpus-level ``skip_fraction`` (fraction of *rows* in skippable
    files): the before/after metric for layout rewrites.
    """
    flagged = zonemaps.select(
        F.col(file_col),
        "min_v",
        "max_v",
        "n_rows",
        ((F.col("max_v") < F.lit(lo)) | (F.col("min_v") > F.lit(hi)))
        .cast("int")
        .alias("skipped"),
    )
    totals = flagged.agg(
        F.sum("n_rows").alias("_total_rows"),
        F.sum(F.col("n_rows") * F.col("skipped")).alias("_skip_rows"),
        F.sum("skipped").alias("n_files_skipped"),
    ).select(
        "n_files_skipped",
        F.round(
            F.col("_skip_rows") / F.greatest(F.col("_total_rows"), F.lit(1)),
            6,
        ).alias("skip_fraction"),
    )
    # 1-row broadcast cross join: every file row carries the summary.
    return flagged.crossJoin(F.broadcast(totals))
