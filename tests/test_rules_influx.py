"""Config-driven routing rules + InfluxDB line-protocol decoder."""

from __future__ import annotations

import json
from datetime import datetime


def _df(spark, rows, extra="conf_id string"):
    return spark.createDataFrame(
        rows,
        f"severity int, message string, parse_ok boolean, appname string, "
        f"hostname string, {extra}",
    )


def test_route_with_rules_default(spark):
    from skewer_spark.operators.rules import route_with_rules
    df = _df(spark, [
        (7, "x", True, "app", "h", "c1"),
        (3, "contains REJECTME here", True, "app", "h", "c1"),
        (3, "ok", False, "app", "h", "c1"),
        (3, "ok", True, "app", "h", "c1"),
    ])
    out = {(r.severity, r.message, r.parse_ok): r.filter_status
           for r in route_with_rules(df).collect()}
    assert out[(7, "x", True)] == "DROPPED"
    assert out[(3, "contains REJECTME here", True)] == "REJECTED"
    assert out[(3, "ok", False)] == "ERROR"
    assert out[(3, "ok", True)] == "PASS"


def test_route_with_rules_per_conf(spark):
    from skewer_spark.operators.rules import RoutingRule, route_with_rules
    rules = [RoutingRule(
        conf_id="strict",
        filter_expr="CASE WHEN severity >= 4 THEN 'DROPPED' ELSE 'PASS' END",
        topic_expr="concat('audit-', appname)",
    )]
    df = _df(spark, [
        (5, "m", True, "app", "h", "strict"),
        (5, "m", True, "app", "h", "other"),
        (2, "m", True, "app", "h", "strict"),
    ])
    rows = {(r.conf_id, r.severity): r for r in route_with_rules(df, rules).collect()}
    assert rows[("strict", 5)].filter_status == "DROPPED"
    assert rows[("other", 5)].filter_status == "PASS"   # default rule
    assert rows[("strict", 2)].topic == "audit-app"
    assert rows[("other", 5)].topic == "syslog-app"


def test_route_with_rules_topic_validation(spark):
    from skewer_spark.operators.rules import RoutingRule, route_with_rules
    rules = [RoutingRule(conf_id="bad", topic_expr="'has spaces!'")]
    df = _df(spark, [(1, "m", True, "a", "h", "bad")])
    r = route_with_rules(df, rules).collect()[0]
    assert r.topic == "default-topic"


def test_parse_influx(spark):
    from skewer_spark.operators.decode_influx import parse_influx
    lines = [
        'cpu,host=server01,region=us west usage_idle=87.5,count=4i,ok=true,'
        'note="hi" 1700000000000000000',
        "mem value=1.5",
        "not a valid line",
    ]
    # note: tag value "us west"? no — unescaped space splits; use clean line
    lines[0] = ('cpu,host=server01,region=uswest usage_idle=87.5,count=4i,'
                'ok=true,note="hi" 1700000000000000000')
    df = spark.createDataFrame(
        [(ln, datetime(2026, 1, 1)) for ln in lines], "text string, ts timestamp"
    )
    rows = parse_influx(df).collect()
    r0 = next(r for r in rows if r.message == "cpu")
    assert r0.appname == "influxdb" and (r0.facility, r0.severity) == (16, 6)
    assert r0.hostname == "server01"
    props = json.loads(r0.properties_json)
    assert props["influxdb_tags"] == {"host": "server01", "region": "uswest"}
    assert props["influxdb_fields"]["count_integer"] == "4"
    assert props["influxdb_fields"]["ok_boolean"] == "true"
    assert props["influxdb_fields"]["note_string"] == "hi"
    assert props["influxdb_fields"]["usage_idle_float"] == "87.5"
    assert str(r0.time_reported) == "2023-11-14 22:13:20"
    r1 = next(r for r in rows if r.message == "mem")
    assert r1.parse_ok and r1.hostname == ""
    r2 = next(r for r in rows if not r.parse_ok)
    assert r2.parser_name == "influx"
