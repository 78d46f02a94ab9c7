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
    """Per-sink routed-row counts by severity name (ack-total analog)."""
    parts = []
    for name, pred in SINKS.items():
        parts.append(
            routed.filter(F.expr(pred))
            .groupBy("severity_name")
            .agg(F.count("*").alias("n_messages"))
            .withColumn("sink", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("sink", "severity_name", "n_messages")


def windowed_counts(routed: DataFrame, window: str = "1 hour") -> DataFrame:
    """Hourly rollup per (sink, severity_name, tool) over PASS rows."""
    parts = []
    for name, pred in SINKS.items():
        parts.append(
            routed.filter(F.expr(pred)).withColumn("sink", F.lit(name))
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return (
        un.groupBy(
            F.window("ts", window).alias("w"), "sink", "severity_name", "tool"
        )
        .agg(F.count("*").alias("n_messages"))
        .select(
            F.col("w.start").alias("window_start"),
            "sink", "severity_name", "tool", "n_messages",
        )
    )
