"""Remaining ingest surfaces (SURVEY.md §2.1): journald, macOS logs,
accounting, charset decode, octet-counting strip.

Each maps a source-specific record shape onto the canonical parsed
columns with pure expressions — these are projections, not groks
(SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# journald (journald/reader.go:36-89)
# ---------------------------------------------------------------------------

JOURNALD_SCHEMA = T.MapType(T.StringType(), T.StringType())


def parse_journald(df: DataFrame, text_col: str = "text") -> DataFrame:
    """journald JSON entry (flat string map) → canonical columns.

    Field mapping per EntryToSyslog (journald/reader.go:36-89):
    _comm → appname (fallback SYSLOG_IDENTIFIER), _pid → procid
    (fallback SYSLOG_PID), priority → severity, syslog_facility →
    facility, _hostname → hostname, _source_realtime_timestamp (µs) →
    time_reported; remaining ``_``-prefixed keys →
    properties["journald"]; skewer.client = hostname.
    """
    # materialize the decoded+lowercased map ONCE: referencing the raw
    # from_json expression per field re-parses the line per reference
    # (the r01 q_parse_json lesson — decode_json._materialized)
    e_raw = F.from_json(F.col(text_col), JOURNALD_SCHEMA)
    base = df.withColumn("_e", e_raw).withColumn(
        "_low",
        F.map_from_entries(
            F.transform(
                F.map_entries(F.col("_e")), lambda kv: F.struct(
                    F.lower(kv["key"]).alias("key"), kv["value"].alias("value")
                )
            )
        ),
    )
    e, low = F.col("_e"), F.col("_low")
    sev = F.coalesce(low["priority"].try_cast("int"), F.lit(0))
    fac = F.coalesce(low["syslog_facility"].try_cast("int"), F.lit(0))
    hostname = F.coalesce(low["_hostname"], F.lit(""))
    appname = F.coalesce(
        F.nullif(low["_comm"], F.lit("")), low["syslog_identifier"], F.lit("")
    )
    procid = F.coalesce(
        F.nullif(low["_pid"], F.lit("")), low["syslog_pid"], F.lit("")
    )
    # plausibility bound: a valid-long but absurd microsecond value
    # (e.g. int64 max) casts to a year-294247 timestamp on the JVM and
    # then crashes any Arrow/pandas consumer downstream; keep only
    # values inside the datetime64[ns] range (1677–2262)
    tr_us = low["_source_realtime_timestamp"].try_cast("long")
    tr_us = F.when(tr_us.between(-9_223_372_036_854_775, 9_223_372_036_854_775), tr_us)
    underscored = F.map_filter(low, lambda k, _: k.startswith("_"))
    props = F.to_json(
        F.create_map(
            F.lit("journald"), underscored,
            F.lit("skewer"), F.create_map(F.lit("client"), hostname),
        )
    )
    return base.select(
        *df.columns,
        (fac * 8 + sev).alias("priority"),
        fac.alias("facility"),
        sev.alias("severity"),
        F.lit(1).alias("version"),
        (tr_us / 1_000_000).cast("timestamp").alias("time_reported"),
        hostname.alias("hostname"),
        appname.alias("appname"),
        procid.alias("procid"),
        F.lit("").alias("msgid"),
        F.lit("").alias("structured"),
        F.coalesce(low["message"], F.lit("")).alias("message"),
        props.alias("properties_json"),
        e.isNotNull().alias("parse_ok"),
        F.lit("journald").alias("parser_name"),
    )


# ---------------------------------------------------------------------------
# macOS unified logs (model/types.go:402-420, services/macos/macoslogs.go)
# ---------------------------------------------------------------------------

MACOS_SCHEMA = T.StructType([
    T.StructField("category", T.StringType()),
    T.StructField("processID", T.LongType()),
    T.StructField("messageType", T.StringType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("subsystem", T.StringType()),
    T.StructField("eventMessage", T.StringType()),
    T.StructField("processImagePath", T.StringType()),
])

# messageType → severity (macOS log levels onto syslog severities)
_MACOS_SEV = {"Fault": 2, "Error": 3, "Default": 5, "Info": 6, "Debug": 7}


def parse_macos(df: DataFrame, text_col: str = "text") -> DataFrame:
    """macOS `log stream --style ndjson` records → canonical columns."""
    base = df.withColumn("_j", F.from_json(F.col(text_col), MACOS_SCHEMA))
    j = F.col("_j")
    sev_map = F.create_map(
        *[F.lit(x) for k, v in _MACOS_SEV.items() for x in (k, v)]
    )
    sev = F.coalesce(F.try_element_at(sev_map, j["messageType"]), F.lit(5))
    fac = F.lit(1)  # user
    app = F.element_at(F.split(j["processImagePath"], "/"), -1)
    return base.select(
        *df.columns,
        (fac * 8 + sev).alias("priority"),
        fac.alias("facility"),
        sev.alias("severity"),
        F.lit(1).alias("version"),
        F.try_to_timestamp(j["timestamp"]).alias("time_reported"),
        F.lit("").alias("hostname"),
        F.coalesce(app, F.lit("")).alias("appname"),
        F.coalesce(j["processID"].cast("string"), F.lit("")).alias("procid"),
        F.lit("").alias("msgid"),
        F.lit("").alias("structured"),
        F.coalesce(j["eventMessage"], F.lit("")).alias("message"),
        F.to_json(F.create_map(
            F.lit("macos"), F.create_map(
                F.lit("subsystem"), F.coalesce(j["subsystem"], F.lit("")),
                F.lit("category"), F.coalesce(j["category"], F.lit("")),
            )
        )).alias("properties_json"),
        j.isNotNull().alias("parse_ok"),
        F.lit("macos").alias("parser_name"),
    )


# ---------------------------------------------------------------------------
# unix accounting (services/accounting.go:73-147)
# ---------------------------------------------------------------------------

def accounting_records(df: DataFrame) -> DataFrame:
    """acct(5) records (pre-decoded to columns comm/uid/tty/exitcode/ts)
    → canonical columns.  Fixed facility=1(user), severity=6(info),
    appname="accounting" per services/accounting.go:85-95; fields land
    in properties["accounting"].
    """
    return df.select(
        "*",
        F.lit(14).alias("priority"),
        F.lit(1).alias("facility"),
        F.lit(6).alias("severity"),
        F.lit(1).alias("version"),
        F.col("ts").alias("time_reported"),
        F.lit("").alias("hostname"),
        F.lit("accounting").alias("appname"),
        F.lit("").alias("procid"),
        F.lit("").alias("msgid"),
        F.lit("").alias("structured"),
        F.coalesce(F.col("comm"), F.lit("")).alias("message"),
        F.to_json(F.create_map(
            F.lit("accounting"), F.create_map(
                F.lit("uid"), F.col("uid").cast("string"),
                F.lit("tty"), F.col("tty").cast("string"),
                F.lit("exitcode"), F.col("exitcode").cast("string"),
            )
        )).alias("properties_json"),
        F.lit(True).alias("parse_ok"),
        F.lit("accounting").alias("parser_name"),
    )


# ---------------------------------------------------------------------------
# pre-parse helpers
# ---------------------------------------------------------------------------

def decode_charset(df: DataFrame, bytes_col: str, charset: str = "UTF-8") -> DataFrame:
    """Charset decode before parse (decoders/decode.go:174-199); the
    JSON-family decoders force UTF-8 like the reference."""
    return df.withColumn("text", F.decode(F.col(bytes_col), charset))


def strip_octet_count(c: Column) -> Column:
    """RFC6587 octet-counting frame: drop a leading '<len> ' prefix when
    present, else pass through (services/network/tcp.go:304-334)."""
    return F.when(
        c.rlike(r"^\d+ <"), F.regexp_replace(c, r"^\d+ ", "")
    ).otherwise(c)
