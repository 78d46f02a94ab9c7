"""Protobuf SyslogMessage decoder (reference ``decoders/protobuf.go:8-16``,
wire schema ``model/types.proto:19-33``).

No protobuf jar/library ships in this container, so this is a
first-principles proto3 wire reader inside an Arrow-batched pandas UDF.
Varint walking is inherently sequential per record, so this is the one
decoder that cannot be a ``.str``-vectorized pandas expression — the
loop body is tight byte arithmetic over ``bytes`` objects and the UDF
still amortizes serialization over Arrow batches.  Unknown fields are
skipped by wire type, like any proto3 reader; malformed input yields a
null struct (the reference surfaces ``DecodingError``).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PB_SYSLOG_SCHEMA = StructType(
    [
        StructField("priority", IntegerType()),
        StructField("facility", IntegerType()),
        StructField("severity", IntegerType()),
        StructField("version", IntegerType()),
        StructField("time_reported_num", LongType()),
        StructField("time_generated_num", LongType()),
        StructField("hostname", StringType()),
        StructField("appname", StringType()),
        StructField("procid", StringType()),
        StructField("msgid", StringType()),
        StructField("structured", StringType()),
        StructField("message", StringType()),
        StructField("properties_json", StringType()),
    ]
)


def _uvarint(b: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        byte = b[i]
        i += 1
        out |= (byte & 0x7F) << shift
        if byte < 0x80:
            # keep within signed int64 like the Go reader
            return out & 0xFFFFFFFFFFFFFFFF, i
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


def _skip(b: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = _uvarint(b, i)
        return i
    if wire == 1:
        return i + 8
    if wire == 2:
        n, i = _uvarint(b, i)
        return i + n
    if wire == 5:
        return i + 4
    raise ValueError(f"unsupported wire type {wire}")


def _read_str_map(b: bytes) -> dict[str, str]:
    """InnerProperties: repeated entry{1:key,2:value} (types.pb.go:517)."""
    out: dict[str, str] = {}
    i = 0
    while i < len(b):
        tag, i = _uvarint(b, i)
        if tag >> 3 == 1 and tag & 7 == 2:
            n, i = _uvarint(b, i)
            entry = b[i : i + n]
            i += n
            k = v = ""
            j = 0
            while j < len(entry):
                etag, j = _uvarint(entry, j)
                n2, j = _uvarint(entry, j)
                s = entry[j : j + n2].decode("utf-8")
                j += n2
                if etag >> 3 == 1:
                    k = s
                else:
                    v = s
            out[k] = v
        else:
            i = _skip(b, i, tag & 7)
    return out


def _read_properties(b: bytes) -> dict[str, dict[str, str]]:
    out: dict[str, dict[str, str]] = {}
    i = 0
    while i < len(b):
        tag, i = _uvarint(b, i)
        if tag >> 3 == 1 and tag & 7 == 2:
            n, i = _uvarint(b, i)
            entry = b[i : i + n]
            i += n
            k = ""
            v: dict[str, str] = {}
            j = 0
            while j < len(entry):
                etag, j = _uvarint(entry, j)
                n2, j = _uvarint(entry, j)
                chunk = entry[j : j + n2]
                j += n2
                if etag >> 3 == 1:
                    k = chunk.decode("utf-8")
                else:
                    v = _read_str_map(chunk)
            out[k] = v
        else:
            i = _skip(b, i, tag & 7)
    return out


_INT_FIELDS = {
    1: "priority",
    2: "facility",
    3: "severity",
    4: "version",
    5: "time_reported_num",
    6: "time_generated_num",
}
_STR_FIELDS = {
    7: "hostname",
    8: "appname",
    9: "procid",
    10: "msgid",
    11: "structured",
    12: "message",
}


def decode_syslog_pb(b: bytes) -> dict | None:
    if b is None:
        return None
    rec = {
        "priority": 0, "facility": 0, "severity": 0, "version": 0,
        "time_reported_num": 0, "time_generated_num": 0,
        "hostname": "", "appname": "", "procid": "", "msgid": "",
        "structured": "", "message": "", "properties_json": "{}",
    }
    try:
        i = 0
        while i < len(b):
            tag, i = _uvarint(b, i)
            field, wire = tag >> 3, tag & 7
            if field in _INT_FIELDS and wire == 0:
                val, i = _uvarint(b, i)
                rec[_INT_FIELDS[field]] = val
            elif field in _STR_FIELDS and wire == 2:
                n, i = _uvarint(b, i)
                rec[_STR_FIELDS[field]] = b[i : i + n].decode("utf-8")
                i += n
            elif field == 13 and wire == 2:
                n, i = _uvarint(b, i)
                props = _read_properties(b[i : i + n])
                i += n
                rec["properties_json"] = json.dumps(
                    {k: dict(sorted(v.items())) for k, v in sorted(props.items())},
                    separators=(",", ":"),
                )
            else:
                i = _skip(b, i, wire)
    except (IndexError, ValueError, UnicodeDecodeError):
        return None
    return rec


@F.pandas_udf(PB_SYSLOG_SCHEMA)
def _decode_pb_udf(payload: pd.Series) -> pd.DataFrame:
    rows = [decode_syslog_pb(b) for b in payload]
    cols = [f.name for f in PB_SYSLOG_SCHEMA.fields]
    return pd.DataFrame(
        [(r if r is not None else dict.fromkeys(cols)) for r in rows],
        columns=cols,
    )


def parse_protobuf(col: Column | str = "payload") -> Column:
    """Decode a binary protobuf SyslogMessage column into a struct
    (one message per frame, as ``decoders/protobuf.go``)."""
    return _decode_pb_udf(F.col(col) if isinstance(col, str) else col)
