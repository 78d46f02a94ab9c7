"""Snapshot diff: derive the change log between two table versions.

The inverse of :func:`skewer_spark.operators.cdc.apply_cdc_log` —
given two snapshots of a keyed table (yesterday's corpus vs today's),
EXTRACT what changed: which keys appeared, disappeared, or changed
content.  This is how a pipeline without upstream CDC still gets
incremental semantics (feed the extracted log to downstream
incremental consumers; pair with ``plans/job.read_sink_diff`` which
diffs by BUCKET membership where this diffs by ROW content).

Change detection compares an md5 CONTENT HASH over the non-key
columns (explicit, schema-ordered, NULL-sentineled) — two snapshots of
a 100 TB table join on the key carrying one 32-char hash each, never
their full payloads.

Scale shape (the 100 TB contract): one narrow hash projection per
side riding each scan, ONE full-outer sort-merge join on the key
(both sides shuffle compact ``(key, hash)`` rows), verdict in codegen;
``diff_summary`` reduces the verdict frame with a single
partial-aggregable groupBy.  No window, no collect, no payload
shuffle.

NULL handling / injectivity: each value serializes as
``1<length>:<value>`` (NULL as ``0``) before the unit-separator join —
the LENGTH PREFIX makes the encoding injective even when data itself
contains the separator byte (``("a\\x1f1b", "c")`` vs
``("a", "b\\x1f1c")`` produce different lengths, hence different
hashes; a bare separator join would collide — the repo-wide
sentinel-safety stance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # ASCII unit separator — never appears in the tag scheme


def row_content_hash(df: DataFrame, key_cols: list[str]) -> Column:
    """md5 over all non-key columns in SCHEMA order (deterministic,
    engine-replicable: values cast to string, presence-tagged so NULL
    never collides with any real value)."""
    value_cols = [c for c in df.columns if c not in key_cols]
    if not value_cols:
        raise ValueError("row_content_hash requires >= 1 non-key column")
    parts = []
    for c in value_cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(F.col(c).isNull(), F.lit("0")).otherwise(
                F.concat(F.lit("1"), F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Per-key verdict frame ``(*key_cols, status)`` with status in
    ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    Keys must be unique per snapshot (it is a keyed-table diff, not a
    multiset diff); feed duplicated snapshots through
    :mod:`.cdc`-style collapse first."""
    o = old.select(
        *[F.col(c) for c in key_cols],
        row_content_hash(old, key_cols).alias("_h_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        row_content_hash(new, key_cols).alias("_h_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """``(status, n_keys)`` — one partial-aggregable reduce over the
    verdict frame."""
    return diff.groupBy("status").agg(F.count("*").alias("n_keys"))
