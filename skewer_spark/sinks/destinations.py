"""Destination layouts (SURVEY.md §2.5): file-sink path template and
Elasticsearch bulk-index analog.

* ``write_file_sink`` — the reference's file destination writes each
  message to ``/var/log/skewer/{{.Date}}/{{.AppName}}.log``
  (``conf/defaults.go:184``, ``store/dests/filedest.go:225-254``; empty
  AppName → "unknown").  The Spark-native equivalent is a text write
  ``partitionBy(date, appname)``: same on-disk layout keyed by the same
  template fields, but produced in parallel with one scan — at 100 TB
  the template becomes partition pruning for readers instead of an
  open-files cache.
* ``elasticsearch_frame`` — the ES destination bulk-indexes each
  message with ``Index(indexName).Id(msg.Uid)`` and a JSON body
  (``store/dests/elasticsearch.go:215-273``); the index name comes from
  ``index_name_template`` (default ``skewer``, ``conf/defaults.go:63``).
  The analog is a frame of (es_index, es_type, doc_id, body) — what a
  Spark ES/OpenSearch bulk connector consumes — written
  ``partitionBy(es_index)`` so one index's load never fans across all
  tasks' connections.

``template_col`` resolves the Go-template fields the reference's
templates use over a parsed message ({{.Date}}, {{.AppName}},
{{.HostName}}, {{.MsgId}}, {{.Procid}} — ``model/types.go:451-453``
for Date).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skewer_spark.sinks.encoders import encode_file, encode_json

_TOKEN = re.compile(r"\{\{\.(\w+)\}\}")

_FIELD_COLS = {
    "Date": lambda: F.date_format("time_reported", "yyyy-MM-dd"),
    "AppName": lambda: F.coalesce(
        F.nullif(F.col("appname"), F.lit("")), F.lit("unknown")
    ),
    "HostName": lambda: F.col("hostname"),
    "Procid": lambda: F.col("procid"),
    "MsgId": lambda: F.col("msgid"),
    "Message": lambda: F.col("message"),
}


def template_col(template: str) -> Column:
    """Go-template string → concat expression over message columns."""
    parts: list[Column] = []
    last = 0
    for m in _TOKEN.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last:m.start()]))
        field = m.group(1)
        if field not in _FIELD_COLS:
            raise ValueError(f"unsupported template field: {field}")
        parts.append(_FIELD_COLS[field]())
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    if not parts:
        parts = [F.lit("")]
    return F.concat(*parts)


def write_file_sink(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """{{.Date}}/{{.AppName}}.log layout as a partitioned text write."""
    out = df.select(
        _FIELD_COLS["Date"]().alias("date"),
        _FIELD_COLS["AppName"]().alias("appname_dir"),
        encode_file().alias("value"),
    )
    out.write.partitionBy("date", "appname_dir").mode(mode).text(path)


def elasticsearch_frame(
    routed: DataFrame,
    index_name_template: str = "skewer",
    messages_type: str = "syslogmsg",
) -> DataFrame:
    """Bulk-index request frame: doc id = message UID (idempotent
    replays — the reference relies on this for at-least-once into ES),
    body = the Regular JSON view."""
    return routed.select(
        template_col(index_name_template).alias("es_index"),
        F.lit(messages_type).alias("es_type"),
        F.col("uid").alias("doc_id"),
        encode_json().alias("body"),
    )


def write_elasticsearch_sink(
    routed: DataFrame,
    path: str,
    index_name_template: str = "skewer",
    mode: str = "overwrite",
) -> None:
    frame = elasticsearch_frame(routed, index_name_template)
    frame.write.partitionBy("es_index").mode(mode).parquet(path)
