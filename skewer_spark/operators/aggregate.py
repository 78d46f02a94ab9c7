"""Aggregate stage: the metric tables (SURVEY.md §2.7).

The reference's only aggregations are Prometheus counters; each becomes
a count table here:

* incoming by source dims — ``skw_incoming_messages_total``
  (``/root/reference/services/base/metrics.go:17-23``).
* parse errors by parser — ``skw_parsing_errors_total``
  (``metrics.go:33-39``).
* filter verdicts by (status, client-analog, destination) —
  ``skw_message_filtering_total`` (``store/store.go:77-84``,
  ``store/forwarder.go:193-207``).
* per-sink delivered counts — ``skw_store_acks_total``
  (``store/store.go:69-75``).
* distinct conversations — ``skw_client_connections_total`` analog
  (``metrics.go:25-31``) via approx_count_distinct at scale.

Plus the batch-native **windowed** rollup the north rule asks for:
``groupBy(window(ts, '1 hour'), sink, severity_name, tool).count()``.

All are partial-aggregating hash aggregates (map-side combine free from
Catalyst); the only shuffle key is the group-by key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skewer_spark.operators.route import SINKS


def metric_grouping_sets(routed: DataFrame) -> DataFrame:
    """All counter-style metric tables in ONE scan + ONE shuffle.

    GROUPING SETS ((filter_status, role), (parser_name, parse_ok),
    (role)) — the per-set results are split back out by the caller
    (grouping-set id column ``gid``).  The combined result cardinality
    is tiny at any input scale (products of enum dims), so callers can
    collect it and write the final tables driver-side without extra
    Spark jobs — this halves the fixed job count per slice, which is
    what dominates wall time for small slices.
    """
    return (
        routed.groupingSets(
            [["filter_status", "role"], ["parser_name", "parse_ok"], ["role"]],
            "filter_status", "role", "parser_name", "parse_ok",
        )
        .agg(
            F.count("*").alias("n_messages"),
            # approx HLL: exact count_distinct under grouping sets
            # expands the input 3x before the shuffle — far too heavy
            # for a metrics side-channel
            F.approx_count_distinct("conv_id").alias("n_convs"),
            # mergeable sketch state (operators/sketches.py): stored
            # with the slice's partials so whole-table distincts come
            # from unioning sketches, valid under ANY slicing (time
            # slices too, where summing per-slice counts double-counts)
            F.hll_sketch_agg("conv_id", F.lit(12)).alias("convs_hll"),
            F.grouping_id().alias("gid"),
        )
    )


def incoming_counts(df: DataFrame) -> DataFrame:
    return df.groupBy("role").agg(
        F.count("*").alias("n_messages"),
        F.approx_count_distinct("conv_id").alias("approx_convs"),
    )


def parse_error_counts(df: DataFrame) -> DataFrame:
    return (
        df.filter(~F.col("parse_ok"))
        .groupBy("parser_name")
        .agg(F.count("*").alias("n_errors"))
    )


def filter_counts(routed: DataFrame) -> DataFrame:
    """(status, role) verdict counts — skw_message_filtering_total."""
    return routed.groupBy("filter_status", "role").agg(
        F.count("*").alias("n_messages")
    )


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink routed-row counts by severity name (ack-total analog).

    Single pass: explode the matching-sink array instead of N filtered
    unions — one scan regardless of destination count.
    """
    from skewer_spark.operators.route import with_sink_labels

    return (
        with_sink_labels(routed)
        .groupBy("sink", "severity_name")
        .agg(F.count("*").alias("n_messages"))
        .select("sink", "severity_name", "n_messages")
    )


def windowed_counts_from_labeled(labeled: DataFrame, window: str = "1 hour") -> DataFrame:
    """Hourly rollup on an already sink-labeled frame."""
    return (
        labeled
        .groupBy(
            F.window("ts", window).alias("w"), "sink", "severity_name", "tool"
        )
        .agg(F.count("*").alias("n_messages"))
        .select(
            F.col("w.start").alias("window_start"),
            "sink", "severity_name", "tool", "n_messages",
        )
    )


def windowed_counts(routed: DataFrame, window: str = "1 hour") -> DataFrame:
    """Hourly rollup per (sink, severity_name, tool) — one exploded pass."""
    from skewer_spark.operators.route import with_sink_labels

    return (
        with_sink_labels(routed)
        .groupBy(
            F.window("ts", window).alias("w"), "sink", "severity_name", "tool"
        )
        .agg(F.count("*").alias("n_messages"))
        .select(
            F.col("w.start").alias("window_start"),
            "sink", "severity_name", "tool", "n_messages",
        )
    )
