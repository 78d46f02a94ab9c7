"""Destination layouts + encoder registry (SURVEY.md §2.5)."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _routed_fixture(spark):
    rows = [
        # conv, turn, role, tool, ts, fac, sev, host, app, proc, msgid, msg
        ("c1", 1, "user", "none", datetime(2024, 1, 10, 8, 0, 0),
         4, 2, "h1", "appA", "77", "M1", "hello world"),
        ("c1", 2, "assistant", "bash", datetime(2024, 1, 11, 9, 0, 0),
         1, 6, "h2", "", "", "", "second"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string, "
        "ts timestamp, facility int, severity int, hostname string, "
        "appname string, procid string, msgid string, message string",
    )
    return (
        df.withColumn("priority", F.col("facility") * 8 + F.col("severity"))
        .withColumn("version", F.lit(1))
        .withColumn("time_reported", F.col("ts"))
        .withColumn("time_generated", F.col("ts"))
        .withColumn("facility_name", F.lit("auth"))
        .withColumn("severity_name", F.lit("crit"))
        .withColumn("structured", F.lit(""))
        .withColumn("properties_json", F.lit(None).cast("string"))
        .withColumn("parse_ok", F.lit(True))
        .withColumn("uid", F.sha2(F.concat_ws("|", "conv_id", "turn_idx"), 256))
    )


def test_file_sink_date_appname_layout(spark, tmp_path):
    from skewer_spark.sinks.destinations import write_file_sink

    out = str(tmp_path / "filesink")
    write_file_sink(_routed_fixture(spark), out)
    dirs = set()
    for root, _, files in os.walk(out):
        for f in files:
            if f.endswith(".txt") or f.startswith("part-"):
                dirs.add(os.path.relpath(root, out))
    # /var/log/skewer/{{.Date}}/{{.AppName}}.log analog:
    assert "date=2024-01-10/appname_dir=appA" in dirs
    assert "date=2024-01-11/appname_dir=unknown" in dirs
    back = spark.read.text(out).collect()
    assert any("hello world" in r.value for r in back)


def test_elasticsearch_frame_and_templates(spark, tmp_path):
    from skewer_spark.sinks.destinations import (
        elasticsearch_frame, template_col, write_elasticsearch_sink,
    )

    r = _routed_fixture(spark)
    # default index template is the literal 'skewer' (conf/defaults.go:63)
    frame = elasticsearch_frame(r).collect()
    assert {x.es_index for x in frame} == {"skewer"}
    assert all(x.es_type == "syslogmsg" for x in frame)
    # doc id = message UID (elasticsearch.go:265)
    uids = {x.uid for x in r.select("uid").collect()}
    assert {x.doc_id for x in frame} == uids
    body = json.loads(frame[0].body)
    assert body["facility"] == "auth" and "timereported" in body

    # templated index: one partition dir per (date-derived) index
    out = str(tmp_path / "es")
    write_elasticsearch_sink(r, out, "skewer-{{.Date}}")
    idx = {
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("es_index=")
    }
    assert idx == {"skewer-2024-01-10", "skewer-2024-01-11"}

    with pytest.raises(ValueError):
        template_col("{{.NoSuchField}}")


def test_fulljson_envelope(spark):
    from skewer_spark.sinks.encoders import encode_fulljson, with_envelope

    r = with_envelope(_routed_fixture(spark), source_port=0)
    r = r.withColumn("client_addr", F.lit("10.1.2.3:5514")).withColumn(
        "source_type", F.lit("relp")
    )
    enc = r.orderBy("turn_idx").select(encode_fulljson().alias("e")).collect()
    d = json.loads(enc[0].e)
    # RegularFullMessage shape (model/types.go:310-317)
    assert list(d)[:2] == ["client_addr", "source_type"]
    assert d["client_addr"] == "10.1.2.3:5514"
    assert d["source_type"] == "relp"
    assert "source_path" not in d          # omitempty
    assert d["source_port"] == 0           # NO omitempty → always present
    assert d["uid"] and d["fields"]["message"] == "hello world"
    assert d["fields"]["msgid"] == "M1"


def test_content_type_negotiation(spark):
    from skewer_spark.sinks.encoders import (
        ENCODERS, MIMETYPES, encoder_for_content_type,
    )

    assert encoder_for_content_type("application/json") is ENCODERS["json"]
    assert encoder_for_content_type("text/plain") is ENCODERS["rfc5424"]
    assert MIMETYPES["fulljson"] == "application/json"
    with pytest.raises(ValueError):
        encoder_for_content_type("application/x-unknown")
