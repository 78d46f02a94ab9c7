"""skewer_spark — a from-scratch PySpark-native log pipeline.

Reproduces the semantics of the reference syslog gateway
(stephane-martin/skewer, read-only at /root/reference) as a batch /
incremental Spark job over tables of multi-turn conversation / agent
transcripts: parse (RFC3164 / RFC5424 / JSON grok) → enrich (broadcast
dictionary joins, deterministic uid) → route (four-way filter, topic /
partition-key resolution) → fan-out sinks → windowed aggregates, with
per-partition checkpoints and lineage.

This is NOT a port: the reference is a multi-process Go daemon with a
badger durable queue; this package expresses the same semantics as a
declarative DataFrame plan that Catalyst/Tungsten optimize, designed
for 1000-executor clusters over ~100 TB of transcripts while testable
on local[N].
"""

__version__ = "0.1.0"
