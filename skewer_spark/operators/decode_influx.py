"""InfluxDB line-protocol decoder (SURVEY.md §2.2, low-volume path).

Semantics from ``/root/reference/decoders/influxdb.go:13-95``:
``measurement[,tag=v...] field=v[,field=v...] [ts]`` →
appname="influxdb", facility=16 (local0), severity=6 (info), version 1,
message = measurement, tags → properties["influxdb_tags"] (tag ``host``
also fills hostname), fields → properties["influxdb_fields"] with a
type-suffixed key (``_integer`` / ``_float`` / ``_boolean`` /
``_string``).  ``ProcId`` carries the point hash in the reference; we
use a deterministic hash of the line (documented deviation — the
reference's HashID is a series-key FNV hash).

Vectorized pandas UDF (line splitting with escape handling is beyond
native regex) — matches the reference's own "parse in code" choice.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from skewer_spark.schema import PARSED_STRUCT

# split on unescaped comma / space / equals
_RE_UNESC_SPACE = re.compile(r"(?<!\\) ")
_RE_UNESC_COMMA = re.compile(r"(?<!\\),")
_RE_INT = re.compile(r"^-?\d+i$")
_RE_FLOAT = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def _parse_line(line: str) -> dict | None:
    parts = _RE_UNESC_SPACE.split(line.strip(), maxsplit=2)
    if len(parts) < 2 or not parts[0]:
        return None
    head = _RE_UNESC_COMMA.split(parts[0])
    measurement = head[0].replace("\\ ", " ").replace("\\,", ",")
    tags = {}
    for t in head[1:]:
        if "=" in t:
            k, v = t.split("=", 1)
            tags[k] = v
    fields = {}
    for fkv in _RE_UNESC_COMMA.split(parts[1]):
        if "=" not in fkv:
            return None
        k, v = fkv.split("=", 1)
        if _RE_INT.match(v):
            fields[k + "_integer"] = v[:-1]
        elif v in ("t", "T", "true", "True", "TRUE"):
            fields[k + "_boolean"] = "true"
        elif v in ("f", "F", "false", "False", "FALSE"):
            fields[k + "_boolean"] = "false"
        elif v.startswith('"') and v.endswith('"') and len(v) >= 2:
            fields[k + "_string"] = v[1:-1].replace('\\"', '"')
        elif _RE_FLOAT.match(v):
            # Go FormatFloat(-1) canonical form
            fields[k + "_float"] = repr(float(v)).rstrip("0").rstrip(".") \
                if "." in repr(float(v)) else repr(float(v))
        else:
            return None
    if not fields:
        return None
    ts = None
    if len(parts) == 3 and parts[2]:
        if not re.fullmatch(r"-?\d+", parts[2]):
            return None
        ts = int(parts[2])
    return {"measurement": measurement, "tags": tags, "fields": fields, "ts": ts}


@pandas_udf(PARSED_STRUCT)
def parse_influx_udf(text: pd.Series, ts: pd.Series) -> pd.DataFrame:
    import hashlib
    out = []
    for line in text.fillna(""):
        p = _parse_line(line)
        if p is None:
            out.append(dict(
                priority=0, facility=0, severity=0, version=0,
                time_reported=pd.NaT, hostname="", appname="", procid="",
                msgid="", structured="", message="", properties_json=None,
                parse_ok=False, parser_name="influx"))
            continue
        props = {"influxdb_tags": p["tags"], "influxdb_fields": p["fields"]}
        tr = (pd.Timestamp(p["ts"], unit="ns") if p["ts"] is not None else pd.NaT)
        out.append(dict(
            priority=16 * 8 + 6, facility=16, severity=6, version=1,
            time_reported=tr,
            hostname=p["tags"].get("host", ""),
            appname="influxdb",
            procid=str(int(hashlib.sha256(line.encode()).hexdigest()[:8], 16)),
            msgid="", structured="",
            message=p["measurement"],
            properties_json=json.dumps(props, sort_keys=True,
                                       separators=(",", ":")),
            parse_ok=True, parser_name="influx"))
    df = pd.DataFrame(out)
    for c in ("priority", "facility", "severity", "version"):
        df[c] = df[c].astype("int32")
    return df


def parse_influx(df: DataFrame, text_col: str = "text", ts_col: str = "ts") -> DataFrame:
    parsed = df.withColumn("_p", parse_influx_udf(F.col(text_col), F.col(ts_col)))
    return parsed.select(
        "*", *[F.col(f"_p.{f.name}").alias(f.name) for f in PARSED_STRUCT.fields]
    ).drop("_p")
