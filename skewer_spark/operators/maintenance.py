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


def orphan_files(
    listing: DataFrame,
    manifest: DataFrame,
    path_col: str = "file_id",
    bytes_col: str = "bytes",
    mtime_col: str = "mtime",
    min_age_seconds: int = 3 * 86400,
    now_epoch: int | None = None,
) -> DataFrame:
    """Orphan-file detection: files present in the storage listing but
    referenced by NO live snapshot manifest, old enough to be outside
    any in-flight commit window (Iceberg's remove_orphan_files).

    ``now`` derives from the LISTING's own max mtime when not given —
    the repo-wide "now() substitutions use the data's own clock"
    determinism contract.  The age guard is the correctness-critical
    part: a file written by an uncommitted concurrent writer looks
    orphaned until its commit lands, so anything younger than
    ``min_age_seconds`` is never flagged.

    Output: one row per orphan with its bytes/age plus corpus totals
    (``n_orphans``, ``reclaim_bytes``) riding every row via a 1-row
    broadcast — the number a storage bill actually cares about.

    Scale shape: ONE left-anti hash join of the listing against the
    manifest's distinct path set (compact keys both sides; the
    manifest side of a healthy table is far smaller than the listing
    and broadcastable), then a projection + tiny total.  No windows,
    no payload shuffle.
    """
    live = manifest.select(F.col(path_col)).distinct()
    now_f = (
        F.lit(float(now_epoch))
        if now_epoch is not None
        else F.unix_micros(F.max(F.col(mtime_col)).cast("timestamp"))
        / F.lit(1e6)
    )
    clock = listing.agg(now_f.alias("_now"))
    aged = (
        listing.join(F.broadcast(live), path_col, "left_anti")
        .crossJoin(F.broadcast(clock))
        .select(
            F.col(path_col),
            F.col(bytes_col),
            F.floor(
                F.col("_now")
                - F.unix_micros(F.col(mtime_col).cast("timestamp"))
                / F.lit(1e6)
            )
            .cast("bigint")
            .alias("age_seconds"),
        )
        .filter(F.col("age_seconds") >= min_age_seconds)
    )
    totals = aged.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.coalesce(F.sum(bytes_col), F.lit(0)).cast("bigint").alias(
            "reclaim_bytes"
        ),
    )
    return aged.crossJoin(F.broadcast(totals))


def snapshot_expiry(
    snapshots: DataFrame,
    snapshot_col: str = "snapshot_id",
    committed_col: str = "committed_ts",
    keep_last: int = 5,
    keep_seconds: int = 7 * 86400,
    now_epoch: int | None = None,
) -> DataFrame:
    """Snapshot-retention plan (Iceberg expire_snapshots): keep the
    newest ``keep_last`` snapshots plus everything committed within
    ``keep_seconds`` of now; the rest are expirable.

    ``now`` = the log's own max commit time unless pinned (same
    determinism contract as :func:`orphan_files`).  Both criteria are
    OR'd — the belt-and-suspenders default real tables run with, so a
    stalled writer can still roll back and a hot table doesn't hoard
    history.  Ties on the commit time break by snapshot id (newest-id
    wins) so two engines rank identically.

    Output: every snapshot with its ``recency_rank``, ``age_seconds``
    and ``expire`` verdict (int 0/1 — the plan, not the deletion).

    Scale shape: the snapshot log is metadata-sized (thousands of
    rows at worst) — one window over a single exchange plus a 1-row
    broadcast clock.  Trivial by design; it exists so the MAINTENANCE
    decision is itself testable, versioned pipeline code instead of
    an ops runbook.
    """
    ts_s = (
        F.unix_micros(F.col(committed_col).cast("timestamp")) / F.lit(1e6)
    )
    now_f = (
        F.lit(float(now_epoch))
        if now_epoch is not None
        else F.max(ts_s)
    )
    clock = snapshots.agg(now_f.alias("_now"))
    w = Window.orderBy(
        F.col(committed_col).desc(), F.col(snapshot_col).desc()
    )
    ranked = (
        snapshots.select(
            F.col(snapshot_col),
            F.col(committed_col),
            F.row_number().over(w).alias("recency_rank"),
            ts_s.alias("_ts"),
        )
        .crossJoin(F.broadcast(clock))
        .select(
            snapshot_col,
            F.date_format(committed_col, "yyyy-MM-dd HH:mm:ss").alias(
                "committed_ts"
            ),
            "recency_rank",
            F.floor(F.col("_now") - F.col("_ts")).cast("bigint").alias(
                "age_seconds"
            ),
            F.when(
                (F.col("recency_rank") <= keep_last)
                | (F.col("_now") - F.col("_ts") <= keep_seconds),
                0,
            )
            .otherwise(1)
            .cast("int")
            .alias("expire"),
        )
    )
    return ranked
