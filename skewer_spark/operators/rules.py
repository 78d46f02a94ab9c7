"""Config-driven routing rules — the FilterSubConfig analog.

The reference attaches a ``FilterSubConfig`` {filter func, topic
template/func, partition-key template/func, partition-number func} to
every source config, persists it by ConfID, and looks it up per message
(``/root/reference/conf/types.go:368-375``,
``store/store.go:708-746``, ``store/forwarder.go:133-156``).

Spark version: a rule is a row of SQL expression strings; the rule set
compiles into nested ``when`` Columns keyed on ``conf_id`` — pure
whole-stage-codegen, no per-row lookup structure.  This replaces the
reference's JavaScript plugin surface (``javascript/vm.go``) with
SQL-expression plugins: same expressive slots (filter verdict, topic,
partition key), sandbox-safe, and Catalyst-optimizable.

Topic validation + ``default-topic`` fallback semantics per
``javascript/vm.go:497-535`` / ``store/forwarder.go:174``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skewer_spark.operators.route import (
    DEFAULT_TOPIC, TOPIC_RE, partition_key_col, N_PARTITIONS,
)


@dataclass
class RoutingRule:
    """One source-config's routing behavior (SQL expression strings)."""
    conf_id: str
    # expression → PASS/DROPPED/REJECTED/ERROR
    filter_expr: str = (
        "CASE WHEN severity = 7 THEN 'DROPPED' "
        "WHEN message LIKE '%REJECTME%' THEN 'REJECTED' "
        "WHEN NOT parse_ok THEN 'ERROR' ELSE 'PASS' END"
    )
    topic_expr: str = (
        "concat('syslog-', coalesce(nullif(appname, ''), 'unknown'))"
    )
    partition_key_expr: str = "concat('mypk-', coalesce(hostname, ''))"
    n_partitions: int = N_PARTITIONS


DEFAULT_RULE = RoutingRule(conf_id="__default__")


def _per_conf(rules: list[RoutingRule], attr: str) -> Column:
    """Nested when-chain: conf_id → compiled expression."""
    expr = F.expr(getattr(DEFAULT_RULE, attr))
    for r in rules:
        expr = F.when(
            F.col("conf_id") == r.conf_id, F.expr(getattr(r, attr))
        ).otherwise(expr)
    return expr


def route_with_rules(
    df: DataFrame, rules: list[RoutingRule] | None = None
) -> DataFrame:
    """enriched (+ conf_id column) → routed, per-config rules applied.

    Without a conf_id column (single-source job) the default rule
    applies to every row — identical to operators.route.route().
    """
    rules = rules or []
    if "conf_id" not in df.columns:
        df = df.withColumn("conf_id", F.lit("__default__"))

    raw_topic = _per_conf(rules, "topic_expr")
    topic = F.when(raw_topic.rlike(TOPIC_RE), raw_topic).otherwise(
        F.lit(DEFAULT_TOPIC)
    )
    pkey = _per_conf(rules, "partition_key_expr")
    return (
        df.withColumn("filter_status", _per_conf(rules, "filter_expr"))
        .withColumn("topic", topic)
        .withColumn("partition_key", pkey)
        .withColumn(
            "partition_number",
            F.pmod(F.xxhash64(pkey), F.lit(DEFAULT_RULE.n_partitions)).cast("int"),
        )
    )
