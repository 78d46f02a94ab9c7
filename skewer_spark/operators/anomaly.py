"""Windowed rate anomaly detection (robust z-score).

The reference exposes flat per-(client, destination) message counters
(`/root/reference/store/forwarder.go:192-208`, metrics.go) and leaves
"is this rate abnormal?" to the operator reading Grafana.  A standalone
analytics engine should answer it: per key (event type, client, sink),
bucket time into fixed windows, then flag windows whose event count is
a robust outlier against that key's own history.

Outlier score = the Iglewicz–Hoaglin modified z-score
``M = 0.6745 * (n - median) / MAD`` (median absolute deviation), with
the standard fallback to the mean absolute deviation
``M = (n - median) / (1.253314 * meanAD)`` when MAD is zero (constant
baseline — exactly the case where a spike matters most), and 0 when
both deviations are zero (a perfectly flat series has no outliers).
``|M| > threshold`` (default 3.5, the Iglewicz–Hoaglin recommendation)
marks the anomaly — in both directions, so silent outages (rate drops)
flag as well as spikes.

Zero-event windows do not exist in a ``groupBy`` — an outage would be
invisible.  ``fill_gaps=True`` (default) densifies each key's window
sequence between its first and last active window (``sequence()`` +
explode on the per-key 1-row span frame) so vanished traffic scores.

Scale shape (the 100 TB contract): the raw stream is touched by ONE
partial-aggregable ``groupBy(key, window)`` shuffle; everything after
operates on the compact (keys × windows) counts frame — the span/gap
explode is O(windows) per key, the median/MAD frames are
O(keys) rows and broadcast back onto the counts.  Catalyst reuses the
counts exchange across the self-referencing aggregates (one scan).
Exact ``percentile`` is fine at any realistic keys×windows
cardinality (the frame is ~10^6 rows even for 10^4 keys × 100 days of
minutes); there is no per-event state anywhere downstream of the first
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    fill_gaps: bool = True,
    max_windows_per_key: int = 1_000_000,
) -> DataFrame:
    """Per-(key, window) event counts ``(k, w, n_events)``; with
    ``fill_gaps`` every window between a key's first and last active
    window is present (zero-filled).

    ``max_windows_per_key`` guards the densification: one corrupt
    timestamp (epoch 0, year 9999) would otherwise make a key's
    ``sequence(lo, hi)`` materialize tens of millions of timestamps in
    ONE row (hundreds of MB before the explode — executor OOM), and
    even valid-but-wide spans silently inflate the counts frame far
    past the real data.  The guard rides the span expression itself
    (no extra pass over the raw stream) and fails loud with the
    offending key."""
    c = (
        df.groupBy(
            F.window(ts_col, window).alias("_w"), F.col(key).alias("k")
        )
        .agg(F.count("*").alias("n_events"))
        .select("k", F.col("_w.start").alias("w"), "n_events")
    )
    if not fill_gaps:
        return c
    span = c.groupBy("k").agg(F.min("w").alias("lo"), F.max("w").alias("hi"))
    # seconds per window, from the interval literal itself (UTC session)
    ivl_s = F.expr(
        f"unix_timestamp(timestamp'1970-01-01 00:00:00' + INTERVAL {window})"
    )
    n_windows = (
        (F.unix_timestamp("hi") - F.unix_timestamp("lo")) / ivl_s + 1
    )
    guarded_seq = F.when(
        n_windows <= F.lit(max_windows_per_key),
        F.sequence("lo", "hi", F.expr(f"INTERVAL {window}")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("fill_gaps: key "),
                F.col("k").cast("string"),
                F.lit(" spans "),
                n_windows.cast("long").cast("string"),
                F.lit(
                    f" windows (> max_windows_per_key={max_windows_per_key})"
                    " — corrupt timestamp or raise the limit"
                ),
            )
        )
    )
    allw = span.select("k", F.explode(guarded_seq).alias("w"))
    return allw.join(c, ["k", "w"], "left").select(
        "k",
        "w",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def rate_anomalies(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    threshold: float = 3.5,
    fill_gaps: bool = True,
) -> DataFrame:
    """Flag (key, window) buckets whose count is a robust outlier for
    that key.

    Returns ``(<key>, window_start, n_events, med, mad, z_score,
    is_anomaly)``; ``z_score`` is rounded to 6 dp and ``is_anomaly``
    compares the ROUNDED score (engine-independent contract, same move
    as the BM25 rank cut).
    """
    c = windowed_counts(df, key, ts_col, window, fill_gaps)
    m1 = c.groupBy("k").agg(F.percentile("n_events", 0.5).alias("med"))
    # NO F.broadcast hint on the stat frames: their size is
    # proportional to KEY CARDINALITY, not a constant — forced onto a
    # 10^8-key column the hint would collect the full frame to the
    # driver (OOM / broadcast hard limit).  AQE's size-based planning
    # still picks broadcast for the common small-key case (plan test).
    e = c.join(m1, "k").withColumn(
        "ad", F.abs(F.col("n_events") - F.col("med"))
    )
    m2 = e.groupBy("k").agg(
        F.percentile("ad", 0.5).alias("mad"),
        F.avg("ad").alias("mean_ad"),
    )
    z = (
        F.when(
            F.col("mad") > 0,
            F.lit(0.6745) * (F.col("n_events") - F.col("med")) / F.col("mad"),
        )
        .when(
            F.col("mean_ad") > 0,
            (F.col("n_events") - F.col("med"))
            / (F.lit(1.253314) * F.col("mean_ad")),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        e.join(m2, "k")
        .withColumn("z_score", F.round(z, 6))
        .select(
            F.col("k").alias(key),
            F.col("w").alias("window_start"),
            "n_events",
            "med",
            "mad",
            "z_score",
            (F.abs(F.col("z_score")) > F.lit(float(threshold))).alias(
                "is_anomaly"
            ),
        )
    )
