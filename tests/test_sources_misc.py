"""journald / macOS / accounting source projections + pre-parse helpers."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F


def test_parse_journald(spark):
    from skewer_spark.sources.misc import parse_journald
    entry = {
        "_COMM": "sshd", "_PID": "42", "PRIORITY": "3",
        "SYSLOG_FACILITY": "4", "_HOSTNAME": "jh1",
        "_SOURCE_REALTIME_TIMESTAMP": "1767225600000000",
        "MESSAGE": "login failed", "_UID": "0",
        "SYSLOG_IDENTIFIER": "ssh",
    }
    df = spark.createDataFrame([(json.dumps(entry),)], "text string")
    r = parse_journald(df).collect()[0]
    assert (r.facility, r.severity, r.priority) == (4, 3, 35)
    assert r.appname == "sshd" and r.procid == "42" and r.hostname == "jh1"
    assert r.message == "login failed"
    assert str(r.time_reported) == "2026-01-01 00:00:00"
    props = json.loads(r.properties_json)
    assert props["journald"]["_uid"] == "0"
    assert props["skewer"]["client"] == "jh1"
    # fallback to SYSLOG_IDENTIFIER when _COMM missing
    e2 = {"SYSLOG_IDENTIFIER": "idapp", "MESSAGE": "m"}
    r2 = parse_journald(
        spark.createDataFrame([(json.dumps(e2),)], "text string")
    ).collect()[0]
    assert r2.appname == "idapp"


def test_parse_macos(spark):
    from skewer_spark.sources.misc import parse_macos
    rec = {
        "category": "net", "processID": 77, "messageType": "Error",
        "timestamp": "2026-01-01 00:00:05+00:00", "subsystem": "com.x",
        "eventMessage": "oops", "processImagePath": "/usr/bin/finder",
    }
    df = spark.createDataFrame([(json.dumps(rec),)], "text string")
    r = parse_macos(df).collect()[0]
    assert r.severity == 3 and r.facility == 1
    assert r.appname == "finder" and r.procid == "77"
    assert r.message == "oops"
    props = json.loads(r.properties_json)
    assert props["macos"]["subsystem"] == "com.x"


def test_accounting_records(spark):
    from skewer_spark.sources.misc import accounting_records
    df = spark.createDataFrame(
        [("ls", 0, 7, 0, datetime(2026, 1, 1))],
        "comm string, uid int, tty int, exitcode int, ts timestamp",
    )
    r = accounting_records(df).collect()[0]
    assert r.appname == "accounting" and (r.facility, r.severity) == (1, 6)
    assert r.message == "ls"
    assert json.loads(r.properties_json)["accounting"]["uid"] == "0"


def test_strip_octet_count(spark):
    from skewer_spark.sources.misc import strip_octet_count
    df = spark.createDataFrame(
        [("25 <34>Jan 10 x",), ("<34>plain",), ("123 not syslog",)],
        "text string",
    )
    out = [r.s for r in df.select(strip_octet_count(F.col("text")).alias("s")).collect()]
    assert out == ["<34>Jan 10 x", "<34>plain", "123 not syslog"]


def test_decode_charset(spark):
    from skewer_spark.sources.misc import decode_charset
    df = spark.createDataFrame([(bytearray("héllo".encode("utf-8")),)], "raw binary")
    r = decode_charset(df, "raw").collect()[0]
    assert r.text == "héllo"
    r2 = decode_charset(
        spark.createDataFrame([(bytearray("héllo".encode("latin-1")),)], "raw binary"),
        "raw", "ISO-8859-1",
    ).collect()[0]
    assert r2.text == "héllo"
