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


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two batches of a numeric
    column — the standard scored-distribution drift gate (PSI < 0.1
    stable, 0.1–0.25 moderate shift, > 0.25 retrain/alert).

    Companion to :func:`snapshot_diff` (which detects per-ROW change):
    PSI detects DISTRIBUTION change with no key at all — yesterday's
    quality-score batch vs today's, reference-window teacher scores vs
    the live window.  Fixed equi-width bins over ``[lo, hi]`` with
    both tails clamped into the edge bins (bin 0 and ``n_bins-1``), so
    the binning is data-independent and two engines agree exactly.

    ``contrib = (p_cur - p_ref) * ln(p_cur / p_ref)`` per bin with
    ``epsilon`` smoothing on empty bins; ``psi_total`` (the sum over
    bins) rides every row.  Fractions and contributions are rounded
    6dp — the repo's cross-engine float canonicalization contract.

    Scale shape: each side is one partial-aggregable
    groupBy(bin) — 10^12 rows reduce map-side to ``n_bins`` counts —
    then all remaining algebra runs on two n_bins-row frames
    (broadcast-joined).  Nothing wide ever shuffles.
    """
    width = (hi - lo) / n_bins

    def _binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / width)
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
        return df.groupBy(b.cast("int").alias("bin")).agg(
            F.count(F.lit(1)).alias(out)
        )

    r = _binned(ref, "_n_ref")
    c = _binned(cur, "_n_cur")
    merged = r.join(c, "bin", "full_outer").na.fill(
        {"_n_ref": 0, "_n_cur": 0}
    )
    # totals from the already-reduced n_bins-row frame — each input
    # side is scanned exactly ONCE (totals off the raw sides would
    # rescan the corpus)
    joined = merged.crossJoin(
        F.broadcast(
            merged.agg(
                F.sum("_n_ref").alias("_t_ref"),
                F.sum("_n_cur").alias("_t_cur"),
            )
        )
    )
    p_ref = F.greatest(
        F.col("_n_ref") / F.greatest(F.col("_t_ref"), F.lit(1)),
        F.lit(epsilon),
    )
    p_cur = F.greatest(
        F.col("_n_cur") / F.greatest(F.col("_t_cur"), F.lit(1)),
        F.lit(epsilon),
    )
    per_bin = joined.select(
        "bin",
        F.col("_n_ref").alias("n_ref"),
        F.col("_n_cur").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("contrib"),
    )
    total = per_bin.agg(F.round(F.sum("contrib"), 6).alias("psi_total"))
    return per_bin.crossJoin(F.broadcast(total))
