"""Routing stage: four-way filter + topic / partition-key resolution.

Semantics from the reference forwarder + JS filter environment
(SURVEY.md §2.4):

* Filter verdict ``PASS / DROPPED / REJECTED / ERROR``
  (``/root/reference/javascript/vm.go:45-60, 399-442``) with dispatch
  per ``store/forwarder.go:192-208``.  Fixture rules (FIXTURES.md §3):
  severity==7 → DROPPED; message contains ``REJECTME`` → REJECTED;
  parse failure → ERROR; else PASS.
* Topic: template ``syslog-{{.Appname}}`` with ``unknown`` fallback
  (``skewer.example.toml:14-23``), validated against
  ``^[A-Za-z0-9._-]{1,249}$`` with fallback ``default-topic``
  (``javascript/vm.go:497-535``, ``store/forwarder.go:174``).
* Partition key: ``mypk-{{.Hostname}}`` (``skewer.example.toml:26``).
* Partition number: hash of the key mod partition count — sarama's
  default "hash" partitioner (``conf/defaults.go:307``); here
  ``pmod(xxhash64(partition_key), n)``.
* Sink fan-out (destination bitmask analog,
  ``conf/destinations.go:11-44``): every PASS row goes to every sink
  whose predicate it matches; sinks per FIXTURES.md §3.

Everything is native Column expressions — whole-stage codegen, no
Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOPIC_RE = "^[A-Za-z0-9._-]{1,249}$"
DEFAULT_TOPIC = "default-topic"
N_PARTITIONS = 10

PASS, DROPPED, REJECTED, ERROR = "PASS", "DROPPED", "REJECTED", "ERROR"

# sink predicates over a routed row (FIXTURES.md §3); evaluated on PASS
# rows except sink_rejects which captures REJECTED/ERROR.
SINKS: dict[str, str] = {
    "sink_alerts": "filter_status = 'PASS' AND severity <= 3",
    "sink_tools": "filter_status = 'PASS' AND tool <> 'none'",
    "sink_firehose": "filter_status = 'PASS'",
    "sink_rejects": "filter_status IN ('REJECTED','ERROR')",
}


def filter_status_col() -> Column:
    """Four-way verdict in fixture precedence order."""
    return (
        F.when(F.col("severity") == 7, F.lit(DROPPED))
        .when(F.col("message").contains("REJECTME"), F.lit(REJECTED))
        .when(~F.col("parse_ok"), F.lit(ERROR))
        .otherwise(F.lit(PASS))
    )


def topic_col() -> Column:
    """syslog-{{.Appname}} template + validation fallback."""
    raw = F.concat(
        F.lit("syslog-"),
        F.coalesce(F.nullif(F.col("appname"), F.lit("")), F.lit("unknown")),
    )
    return F.when(raw.rlike(TOPIC_RE), raw).otherwise(F.lit(DEFAULT_TOPIC))


def partition_key_col() -> Column:
    return F.concat(F.lit("mypk-"), F.coalesce(F.col("hostname"), F.lit("")))


def partition_number_col(n_partitions: int = N_PARTITIONS) -> Column:
    return F.pmod(F.xxhash64(partition_key_col()), F.lit(n_partitions)).cast("int")


def route(df: DataFrame, n_partitions: int = N_PARTITIONS) -> DataFrame:
    """enriched → routed (adds filter_status/topic/partition_* columns)."""
    return (
        df.withColumn("filter_status", filter_status_col())
        .withColumn("topic", topic_col())
        .withColumn("partition_key", partition_key_col())
        .withColumn("partition_number", partition_number_col(n_partitions))
    )


def sink_frames(routed: DataFrame) -> dict[str, DataFrame]:
    """Destination fan-out: N filtered views of the routed frame.

    Callers should persist/write ``routed`` once and derive the sinks
    from it (ingest-once / reference-per-destination,
    ``store/store.go:1161-1177``) — see plans.job.
    """
    return {name: routed.filter(F.expr(pred)) for name, pred in SINKS.items()}


DROPPED_SINK = "_dropped"

# every message lands in exactly one of these (PASS → firehose,
# REJECTED/ERROR → rejects, DROPPED → audit) — so per-message metrics
# can be derived from the sink files alone, no second scan of the input
CANONICAL_SINKS = ("sink_firehose", "sink_rejects", DROPPED_SINK)


def sink_label_col(include_dropped: bool = False) -> Column:
    """Array of sink names a row fans out to (destination bitmask analog,
    conf/destinations.go:94-112).  ``explode`` of this gives the
    one-pass multi-sink write: a single scan replicates each row into
    every matching destination.  With ``include_dropped`` the DROPPED
    verdict goes to an audit sink so no message is lost from metrics
    (the reference counts dropped messages too, store/store.go:77-84).
    """
    cols = [
        F.when(F.expr(pred), F.lit(name)).otherwise(F.lit(None))
        for name, pred in SINKS.items()
    ]
    if include_dropped:
        cols.append(
            F.when(F.col("filter_status") == "DROPPED", F.lit(DROPPED_SINK))
            .otherwise(F.lit(None))
        )
    return F.array_compact(F.array(*cols))


def with_sink_labels(routed: DataFrame, include_dropped: bool = False) -> DataFrame:
    """One row per (message, destination) — the fan-out frame."""
    return routed.withColumn("sink", F.explode(sink_label_col(include_dropped)))
