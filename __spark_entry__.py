"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one pair per implemented operator
from SURVEY.md §2 (+ the training-data ops), runnable side-by-side at
sf0.01 against DuckDB.

The event-line adapter (skewer_spark.sources.events) builds syslog
lines from the ``events`` table by pure arithmetic, so every oracle
recomputes the EXPECTED parse output from the source columns — it never
re-implements the parser, which keeps the two sides independent.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared oracle prelude: expected parse/route fields by construction
# ---------------------------------------------------------------------------

EV_PRELUDE = """
WITH ev AS (
  SELECT event_id, user_id, event_type, ts, value,
    event_id % 192 AS pri,
    (event_id % 192) % 8 AS sev,
    (event_id % 192) // 8 AS fac,
    event_id % 3 AS shape,
    (event_id % 7 = 0) AS badts,
    (event_id % 11 = 0) AS rejectme,
    'host' || lpad((user_id % 50)::varchar, 2, '0') AS host,
    'app' || lpad((event_id % 20)::varchar, 2, '0') AS app,
    (event_id % 1000)::varchar AS pid,
    'MSG' || lpad((event_id % 100)::varchar, 2, '0') AS msgid0,
    lpad((event_id % 24)::varchar, 2, '0') || ':' ||
      lpad((event_id * 7 % 60)::varchar, 2, '0') || ':' ||
      lpad((event_id * 13 % 60)::varchar, 2, '0') AS hms,
    strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ') AS iso,
    event_type || ' msg ' || event_id ||
      (CASE WHEN event_id % 11 = 0 THEN ' REJECTME' ELSE '' END) AS payload,
    CASE event_type WHEN 'click' THEN 'browser' WHEN 'view' THEN 'browser'
      WHEN 'purchase' THEN 'bash' WHEN 'signup' THEN 'editor'
      ELSE 'none' END AS tool
  FROM events
), parsed AS (
  SELECT *,
    NOT (shape = 0 AND badts) AS ok,
    CASE WHEN shape = 0 AND badts THEN 0 ELSE sev END AS severity,
    CASE WHEN shape = 0 AND badts THEN 0 ELSE fac END AS facility,
    CASE WHEN shape = 0 AND badts THEN '' ELSE host END AS hostname,
    CASE WHEN shape = 0 AND badts THEN '' ELSE app END AS appname,
    CASE WHEN shape = 0 AND badts THEN '' WHEN shape = 2 THEN ''
         ELSE pid END AS procid,
    CASE WHEN shape = 0 AND NOT badts THEN msgid0 ELSE '' END AS p_msgid,
    CASE WHEN shape = 0 AND badts THEN '' ELSE payload END AS message,
    CASE WHEN shape = 0 AND badts THEN NULL
         WHEN shape = 1 THEN strptime('2024-01-10 ' || hms, '%Y-%m-%d %H:%M:%S')
         ELSE date_trunc('second', ts) END AS time_reported,
    CASE WHEN shape = 0 THEN 'rfc5424' ELSE 'rfc3164' END AS parser_name
  FROM ev
), routed AS (
  SELECT *,
    CASE WHEN ok AND severity = 7 THEN 'DROPPED'
         WHEN ok AND rejectme THEN 'REJECTED'
         WHEN NOT ok THEN 'ERROR'
         ELSE 'PASS' END AS filter_status,
    'syslog-' || (CASE WHEN appname = '' THEN 'unknown' ELSE appname END)
      AS topic,
    CASE severity WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit'
      WHEN 3 THEN 'err' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice'
      WHEN 6 THEN 'info' ELSE 'debug' END AS severity_name,
    sha256(user_id::varchar || chr(31) || event_id::varchar) AS uid
  FROM parsed
)
"""

SEVNAME_SQL = """
CASE severity WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit'
  WHEN 3 THEN 'err' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice'
  WHEN 6 THEN 'info' ELSE 'debug' END
"""

FACNAME_VALUES = (
    "(VALUES " + ", ".join(
        f"({k}, '{v}')" for k, v in sorted(
            __import__("skewer_spark.schema", fromlist=["FACILITIES"]).FACILITIES.items()
        )
    ) + ") AS fd(facility_code, facility_name)"
)


def _routed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.operators.enrich import enrich
    from skewer_spark.operators.parse import parse_transcripts
    from skewer_spark.operators.route import route
    from skewer_spark.sources.events import event_transcripts

    tdf = event_transcripts(spark, sf_dir)
    return route(enrich(parse_transcripts(tdf)))


def _parsed_events(spark: SparkSession, sf_dir: str, pre=None) -> DataFrame:
    """``pre`` filters the TRANSCRIPT frame below the parse UDF: the
    parse projection runs in single-eval mode here (guide §4.4 guard —
    every consumer of this helper filters on a PARSED field), so
    pre-parse-column filters no longer push through it automatically
    and selective queries place them here (r6)."""
    from skewer_spark.operators.parse import parse_transcripts
    from skewer_spark.sources.events import event_transcripts

    tdf = event_transcripts(spark, sf_dir)
    if pre is not None:
        tdf = tdf.filter(pre)
    return parse_transcripts(tdf, single_eval=True)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse → enrich → route → windowed aggregate on sf0.001."""
    from skewer_spark.operators.aggregate import windowed_counts

    routed = _routed_events(spark, "/root/testdata/sf0.001")
    return windowed_counts(routed)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

# Lazy base-PLAN memo, keyed per (session, path).  A DataFrame is an
# immutable logical plan, not data: reusing it changes nothing about
# what executes — every downstream action still scans the parquet
# fresh, so no result or intermediate is ever served across runs —
# but it skips the repeated file-listing / schema / partition-count
# driver roundtrips (~60-100 ms per call, measured r6) that otherwise
# tax every single declared query's construction.
_READ_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _read(spark: SparkSession, sf: str, table: str) -> DataFrame:
    """Fixture read with full-width parallelism (see _spread)."""
    key = (spark.sparkContext.applicationId, sf, table)
    df = _READ_MEMO.get(key)
    if df is None:
        df = _spread(spark, spark.read.parquet(f"{sf}/{table}.parquet"))
        _READ_MEMO[key] = df
    return df


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Full parallelism on unsplittable tiny fixtures — no-op on real
    multi-file tables (see skewer_spark.session.ensure_parallelism)."""
    from skewer_spark.session import ensure_parallelism

    return ensure_parallelism(df)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from skewer_spark.functions.text import (
        char_count, lang_id, token_count, word_fingerprint,
    )
    from skewer_spark.operators.dedup import (
        exact_dedup, fingerprint_dedup, minhash_candidate_pairs, simhash,
    )
    from skewer_spark.operators.similarity import (
        brute_force_topk, cosine_pairs_above,
    )
    from skewer_spark.schema import facility_dim, severity_dim

    def q_window_rank(spark, sf):
        from pyspark.sql import Window
        ev = _read(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.withColumn("turn_rank", F.row_number().over(w))
            .filter(F.col("turn_rank") <= 3)
            .select("user_id", "event_id", "turn_rank")
        )

    def q_enrich_broadcast(spark, sf):
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        nat = spark.read.parquet(f"{sf}/nation.parquet")
        reg = spark.read.parquet(f"{sf}/region.parquet")
        return (
            cust.join(F.broadcast(nat),
                      cust.c_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(
                F.count("*").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
            )
        )

    def q_priority_decode(spark, sf):
        ev = _read(spark, sf, "events")
        pri = F.pmod(F.col("event_id"), F.lit(192))
        d = ev.select(
            (pri / 8).cast("int").alias("facility"),
            F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        )
        out = (
            d.join(F.broadcast(facility_dim(spark)), "facility", "left")
            .join(F.broadcast(severity_dim(spark)), "severity", "left")
            .withColumn("facility_name",
                        F.coalesce("facility_name", F.lit("user")))
            .withColumn("severity_name",
                        F.coalesce("severity_name", F.lit("info")))
            .groupBy("facility", "facility_name", "severity", "severity_name")
            .agg(F.count("*").alias("n"))
        )
        return out

    def q_parse_rfc3164(spark, sf):
        # shape filter below the parse UDF (see _parsed_events): only
        # the rfc3164-classic third of the lines is parsed at all
        p = _parsed_events(
            spark, sf, pre=F.pmod(F.col("turn_idx"), F.lit(3)) == 1
        )
        return p.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            "hostname", "appname", "procid", "message",
            F.col("severity").cast("int").alias("severity"),
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
            "parser_name",
        )

    def q_parse_rfc5424(spark, sf):
        # pre-parse shape filter below the UDF; parse_ok (a PARSED
        # field) stays above it — single parse eval either way now
        p = _parsed_events(
            spark, sf, pre=F.pmod(F.col("turn_idx"), F.lit(3)) == 0
        )
        return (
            p.filter(F.col("parse_ok"))
            .select(
                F.col("turn_idx").cast("long").alias("event_id"),
                "hostname", "appname", "procid", "msgid", "message",
                F.col("severity").cast("int").alias("severity"),
                F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
                F.get_json_object("properties_json", "$.meta.k").alias("meta_k"),
            )
        )

    def q_parse_errors(spark, sf):
        p = _parsed_events(spark, sf)
        return (
            p.filter(~F.col("parse_ok"))
            .groupBy("parser_name")
            .agg(F.count("*").alias("n_errors"))
        )

    def q_filter_fourway(spark, sf):
        r = _routed_events(spark, sf)
        return r.groupBy("filter_status", "role").agg(
            F.count("*").alias("n_messages")
        )

    def q_route_topic(spark, sf):
        r = _routed_events(spark, sf)
        return r.groupBy("topic").agg(F.count("*").alias("n_messages"))

    def q_sink_counts(spark, sf):
        from skewer_spark.operators.aggregate import sink_counts
        return sink_counts(_routed_events(spark, sf))

    def q_windowed_agg(spark, sf):
        ev = _read(spark, sf, "events")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n", "sum_value",
            )
        )

    def q_incoming_counts(spark, sf):
        r = _routed_events(spark, sf)
        return r.groupBy("role").agg(
            F.count("*").alias("n_messages"),
            F.count_distinct("conv_id").alias("n_convs"),
        )

    def q_encode_rfc5424(spark, sf):
        from skewer_spark.sinks.encoders import encode_rfc5424
        r = _routed_events(spark, sf)
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_rfc5424().alias("encoded"),
        )

    def q_encode_rfc3164(spark, sf):
        # BSD-syslog re-emit (encoders/rfc3164.go): '<pri>Stamp host
        # app[pid]: msg' with Go's space-padded 'Jan _2' Stamp and the
        # localhost fallback — the legacy-relay output leg.  Upgrades
        # the encoder from golden-vector-only to oracle-paired (r4).
        from skewer_spark.sinks.encoders import encode_rfc3164
        r = _routed_events(spark, sf)
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_rfc3164().alias("encoded"),
        )

    def q_encode_file(spark, sf):
        # file-sink line format: 'ISO host app msg' with '-' dashes for
        # empty host/app (encoders/encoder.go file leg).  Oracle-paired
        # in r4 (was covered only via the sink-layout tests).
        from skewer_spark.sinks.encoders import encode_file
        r = _routed_events(spark, sf)
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_file().alias("encoded"),
        )

    def q_encode_gelf(spark, sf):
        # GELF 1.1 JSON re-emit (encoders/gelf.go): version/host/
        # short_message/epoch-seconds timestamp/level + underscore
        # extras, empty extras dropped.  The oracle re-derives Java's
        # shortest-double rendering of the integral-second timestamp
        # ("1.70407354E9") in pure SQL — valid for any epoch in
        # [1e9, 1e10), i.e. 2001-2286.  Oracle-paired r4 (was
        # golden-tested only).
        from skewer_spark.sinks.encoders import encode_gelf
        r = _routed_events(spark, sf)
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_gelf().alias("encoded"),
        )

    def q_encode_json(spark, sf):
        from skewer_spark.sinks.encoders import encode_json
        r = _routed_events(spark, sf)
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_json().alias("encoded"),
        )

    def q_encode_fulljson(spark, sf):
        from skewer_spark.sinks.encoders import encode_fulljson
        r = (
            _routed_events(spark, sf)
            .withColumn(
                "client_addr",
                F.format_string(
                    "10.0.0.%d:%d",
                    F.pmod(F.col("conv_id").cast("long"), F.lit(200)),
                    F.lit(40000) + F.pmod(F.col("turn_idx"), F.lit(1000)),
                ),
            )
            .withColumn("source_type", F.lit("tcp"))
            .withColumn("source_path", F.lit(""))
            .withColumn("source_port", F.lit(1514))
        )
        return r.select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_fulljson().alias("encoded"),
        )

    def _enveloped(spark, sf):
        return (
            _routed_events(spark, sf)
            .withColumn(
                "client_addr",
                F.format_string(
                    "10.0.0.%d:%d",
                    F.pmod(F.col("conv_id").cast("long"), F.lit(200)),
                    F.lit(40000) + F.pmod(F.col("turn_idx"), F.lit(1000)),
                ),
            )
            .withColumn("source_type", F.lit("tcp"))
            .withColumn("source_path", F.lit(""))
            .withColumn("source_port", F.lit(1514))
        )

    def q_encode_avro(spark, sf):
        # numpy batch encoder (r6, guide §4.2): byte-identical to the
        # interpreted-HOF expression twin wire.encode_avro (pinned by
        # tests/test_wire_batch.py) — the HOF fold ran on the
        # interpreted expression path per row and was the costliest
        # per-row work in the sweep
        from skewer_spark.sinks.wire_batch import encode_avro_batch
        return _routed_events(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            F.lower(F.hex(encode_avro_batch())).alias("encoded_hex"),
        )

    def q_encode_fullavro(spark, sf):
        from skewer_spark.sinks.wire_batch import encode_fullavro_batch
        return _enveloped(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            F.lower(F.hex(encode_fullavro_batch())).alias("encoded_hex"),
        )

    def q_encode_jsonavro(spark, sf):
        from skewer_spark.sinks.wire import encode_jsonavro
        return _routed_events(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_jsonavro().alias("encoded"),
        )

    def q_encode_fulljsonavro(spark, sf):
        from skewer_spark.sinks.wire import encode_fulljsonavro
        return _enveloped(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_fulljsonavro().alias("encoded"),
        )

    def q_encode_protobuf(spark, sf):
        # numpy batch encoder (r6) — see q_encode_avro
        from skewer_spark.sinks.wire_batch import encode_protobuf_batch
        return _routed_events(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            F.lower(F.hex(encode_protobuf_batch())).alias("encoded_hex"),
        )

    def q_parse_protobuf(spark, sf):
        from skewer_spark.operators.decode_protobuf import parse_protobuf
        from skewer_spark.sinks.wire_batch import encode_protobuf_batch
        enc = _routed_events(spark, sf).select(
            F.col("turn_idx").cast("long").alias("event_id"),
            encode_protobuf_batch().alias("pb"),
        )
        # allow_jvm=False: the JVM path escapes non-ASCII differently in
        # properties_json — a classpath change must not flip the bytes
        # this oracle-hashed query emits
        d = enc.select(
            "event_id", parse_protobuf("pb", allow_jvm=False).alias("d")
        )
        return d.select(
            "event_id",
            F.col("d.priority").cast("long").alias("priority"),
            F.col("d.facility").cast("long").alias("facility"),
            F.col("d.severity").cast("long").alias("severity"),
            F.col("d.version").cast("long").alias("version"),
            F.col("d.time_reported_num").alias("time_reported_num"),
            F.col("d.time_generated_num").alias("time_generated_num"),
            F.col("d.hostname").alias("hostname"),
            F.col("d.appname").alias("appname"),
            F.col("d.procid").alias("procid"),
            F.col("d.msgid").alias("msgid"),
            F.col("d.structured").alias("structured"),
            F.col("d.message").alias("message"),
            F.col("d.properties_json").alias("properties_json"),
        )

    def q_parse_collectd(spark, sf):
        from skewer_spark.sources.binary import decode_collectd

        ev = _read(spark, sf, "events")

        def spart(t, s):
            b = F.encode(s, "UTF-8")
            return F.concat(
                F.unhex(F.format_string("%04x", F.lit(t))),
                F.unhex(F.format_string("%04x", F.octet_length(b) + 5)),
                b, F.unhex(F.lit("00")),
            )

        host = F.format_string("cdh%02d", F.pmod("user_id", F.lit(30)))
        time_part = F.unhex(
            F.format_string("0001000c%016x", F.unix_timestamp("ts"))
        )
        # values part: n=2, kinds derive/derive, two BE int64 cells
        values = F.unhex(F.format_string(
            "00060018""0002""0202""%016x%016x",
            F.col("event_id"), F.col("user_id"),
        ))
        pkt = F.concat(
            spart(0x0000, host), time_part, spart(0x0002, F.lit("ifx")),
            spart(0x0003, F.lit("eth0")), spart(0x0004, F.lit("if_octets")),
            values,
        )
        staged = ev.select(
            "event_id", pkt.alias("payload"),
            F.date_trunc("second", "ts").alias("ts"),
        )
        out = decode_collectd(staged)
        return out.select(
            "event_id", "hostname", "procid", "properties_json", "message",
            F.date_format("time_reported", "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("tr_str"),
        )

    def q_parse_acct(spark, sf):
        # acct(5) BY CONSTRUCTION: build the 64-byte little-endian
        # struct acct_v3 from event fields in pure expressions
        # (reference layout accounting/acct_linux.go:30-52), decode
        # with the real batch decoder; the oracle recomputes every
        # decoded field arithmetically.  etime (float32) is the one
        # constant field — IEEE bit synthesis isn't portable SQL.
        from skewer_spark.sources.binary import decode_acct_records

        ev = _read(spark, sf, "events")
        eid = F.col("event_id")

        def le(v, n):
            args = [
                F.shiftright(v.cast("long"), 8 * i).bitwiseAND(F.lit(255))
                for i in range(n)
            ]
            return F.format_string("%02x" * n, *args)

        flag = F.pmod(eid, F.lit(32))
        comm = F.format_string("proc%02d", F.pmod(eid, F.lit(50)))
        hexstr = F.concat(
            le(flag, 1), F.lit("03"),                      # flag, version 3
            le(F.pmod(eid, F.lit(100)), 2),                # tty
            le(F.pmod(eid, F.lit(256)), 4),                # exitcode
            le(F.pmod(F.col("user_id"), F.lit(1000)), 4),  # uid
            le(F.pmod(F.col("user_id"), F.lit(100)), 4),   # gid
            le(F.pmod(eid, F.lit(32768)), 4),              # pid
            le(F.pmod(eid * 3, F.lit(32768)), 4),          # ppid
            le(F.unix_timestamp("ts"), 4),                 # btime
            F.lit("0000c842"),                             # etime = 100.0f LE
            le(F.pmod(eid, F.lit(8192)), 2),               # utime: exp 0
            le(F.pmod(eid, F.lit(8192)) + 8192, 2),        # stime: exp 1 (<<3)
            le(F.pmod(eid, F.lit(4096)), 2),               # mem
            le(F.lit(0), 2), F.lit("0000" * 4),            # io, rw..swaps
            F.rpad(F.lower(F.hex(F.encode(comm, "UTF-8"))), 32, "0"),
        )
        src = ev.select("event_id", F.unhex(hexstr).alias("payload"))
        out = decode_acct_records(src)
        return out.select(
            "event_id", "comm", "uid", "gid", "pid", "ppid",
            F.col("tty").cast("long").alias("tty"), "exitcode",
            F.date_format("btime", "yyyy-MM-dd HH:mm:ss").alias("btime_str"),
            "utime_ns", "stime_ns", "etime_ns", "mem", "io", "flags",
        )

    def q_gelf_chunks(spark, sf):
        # chunked + zlib GELF BY CONSTRUCTION: compress the GELF JSON
        # and split it into 2 chunked datagrams per message (header
        # 0x1e0f + msg_id + seq/total, graylog.go:33-41), shuffle them
        # through reassembly, then decode.  Compression is stdlib zlib
        # in an Arrow-batched UDF; the oracle recomputes the decoded
        # fields from the same event columns.
        from pyspark.sql import types as TT
        from pyspark.sql.functions import pandas_udf

        from skewer_spark.operators.decode_json import parse_gelf
        from skewer_spark.sources.binary import reassemble_gelf_datagrams

        ev = _read(spark, sf, "events")
        line = F.to_json(F.struct(
            F.lit("1.1").alias("version"),
            F.format_string("ch%02d", F.pmod(F.col("user_id"), F.lit(25))).alias("host"),
            F.format_string("chunked msg %d", F.col("event_id")).alias("short_message"),
            F.pmod(F.col("event_id"), F.lit(8)).cast("int").alias("level"),
            F.unix_timestamp(F.date_trunc("second", "ts")).cast("double")
            .alias("timestamp"),
        ))

        @pandas_udf(TT.ArrayType(TT.BinaryType()))
        def chunkify(text: pd.Series, eid: pd.Series) -> pd.Series:
            import zlib as _z

            out = []
            for t, i in zip(text, eid):
                z = _z.compress(t.encode())
                mid = int(i).to_bytes(8, "big")
                half = (len(z) + 1) // 2
                out.append([
                    b"\x1e\x0f" + mid + bytes([s, 2]) + z[s * half:(s + 1) * half]
                    for s in (0, 1)
                ])
            return pd.Series(out)

        # eager checkpoint = the datagram table a real deployment reads
        # from storage: reassembly's chunked/single branches each scan
        # their input, which here would re-run the zlib chunkify UDF +
        # explode per branch (r6; instance-scoped blocks, no cross-run
        # result sharing)
        grams = ev.select(
            F.explode(chunkify(line, F.col("event_id"))).alias("payload")
        ).localCheckpoint(eager=True)
        text = reassemble_gelf_datagrams(grams)
        parsed = parse_gelf(text)
        return parsed.select(
            F.conv("msg_id", 16, 10).cast("long").alias("event_id"),
            "priority", "facility", "severity", "hostname", "message",
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
        )

    def q_parse_rsyslog(spark, sf):
        from skewer_spark.operators.decode_json import parse_rsyslog_json
        ev = _read(spark, sf, "events")
        pri = F.pmod(F.col("event_id"), F.lit(192))
        hostname = F.when(
            F.pmod(F.col("event_id"), F.lit(5)) == 0, F.lit("-")
        ).otherwise(
            F.format_string("rh%02d", F.pmod(F.col("user_id"), F.lit(25)))
        )
        line = F.to_json(F.struct(
            pri.cast("string").alias("pri"),
            F.date_format(F.date_trunc("second", "ts"),
                          "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timereported"),
            hostname.alias("hostname"),
            F.format_string("rapp%d", F.pmod(F.col("event_id"), F.lit(6)))
            .alias("app-name"),
            F.pmod(F.col("event_id"), F.lit(500)).cast("string").alias("procid"),
            F.lit("-").alias("msgid"),
            F.concat(F.lit("rsys msg "), F.col("event_id")).alias("msg"),
            F.create_map(F.lit("k1"), F.col("event_type")).alias("$!"),
        ))
        out = parse_rsyslog_json(ev.select("event_id", line.alias("text")))
        return out.select(
            "event_id",
            F.col("priority").cast("int").alias("priority"),
            F.col("facility").cast("int").alias("facility"),
            F.col("severity").cast("int").alias("severity"),
            "hostname", "appname", "procid", "msgid", "message",
            F.get_json_object("properties_json", "$.rsyslog.k1").alias("k1"),
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
        )

    def q_parse_gelf(spark, sf):
        from skewer_spark.operators.decode_json import parse_gelf
        ev = _read(spark, sf, "events")
        fac_name = F.element_at(
            F.array(*[F.lit(x) for x in
                      ("kern", "daemon", "authpriv", "nosuchfac")]),
            F.pmod(F.col("event_id"), F.lit(4)).cast("int") + 1,
        )
        line = F.to_json(F.struct(
            F.lit("1.1").alias("version"),
            F.format_string("gh%02d", F.pmod(F.col("user_id"), F.lit(35)))
            .alias("host"),
            F.concat(F.lit("gelf msg "), F.col("event_id"))
            .alias("short_message"),
            F.unix_timestamp(F.date_trunc("second", "ts")).cast("double")
            .alias("timestamp"),
            F.pmod(F.col("event_id"), F.lit(8)).cast("int").alias("level"),
            fac_name.alias("facility"),
        ))
        out = parse_gelf(ev.select("event_id", line.alias("text")))
        return out.select(
            "event_id",
            F.col("priority").cast("int").alias("priority"),
            F.col("facility").cast("int").alias("facility"),
            F.col("severity").cast("int").alias("severity"),
            "hostname", "message",
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
        )

    def q_parse_w3c(spark, sf):
        from skewer_spark.operators.decode_json import parse_w3c
        from skewer_spark.schema import PROPERTIES_TYPE
        ev = _read(spark, sf, "events")
        fields = ["date", "time", "c-ip", "cs-method", "sc-status"]
        line = F.concat_ws(
            " ",
            F.date_format("ts", "yyyy-MM-dd"),
            F.date_format("ts", "HH:mm:ss"),
            F.format_string("192.168.%d.%d",
                            F.pmod(F.col("user_id"), F.lit(50)),
                            F.pmod(F.col("event_id"), F.lit(200))),
            F.element_at(
                F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT")),
                F.pmod(F.col("event_id"), F.lit(3)).cast("int") + 1,
            ),
            (F.lit(200) + F.pmod(F.col("event_id"), F.lit(5))).cast("string"),
        )
        out = parse_w3c(ev.select("event_id", line.alias("text")), fields)
        w3c = F.from_json("properties_json", PROPERTIES_TYPE)["w3c"]
        return out.withColumn("_w", w3c).select(
            "event_id",
            F.col("_w")["c-ip"].alias("c_ip"),
            F.col("_w")["cs-method"].alias("method"),
            F.col("_w")["sc-status"].alias("status"),
            F.col("parse_ok").cast("boolean").alias("parse_ok"),
        )

    def q_parse_ltsv(spark, sf):
        from skewer_spark.operators.decode_json import parse_ltsv
        ev = _read(spark, sf, "events")
        pri = F.pmod(F.col("event_id"), F.lit(192))
        line = F.concat_ws(
            "\t",
            F.concat(F.lit("time:"),
                     F.date_format(F.date_trunc("second", "ts"),
                                   "yyyy-MM-dd'T'HH:mm:ss'Z'")),
            F.concat(F.lit("host:"),
                     F.format_string("lh%02d", F.pmod(F.col("user_id"),
                                                      F.lit(30)))),
            F.concat(F.lit("ident:"),
                     F.format_string("lapp%d", F.pmod(F.col("event_id"),
                                                      F.lit(7)))),
            F.concat(F.lit("pid:"),
                     F.pmod(F.col("event_id"), F.lit(900)).cast("string")),
            F.concat(F.lit("pri:"), pri.cast("string")),
            # colon inside the value: split must stop at the FIRST colon
            F.concat(F.lit("msg:ltsv msg "), F.col("event_id"),
                     F.lit(" k:v")),
            F.concat(F.lit("status:"),
                     (F.lit(200) + F.pmod(F.col("event_id"),
                                          F.lit(5))).cast("string")),
        )
        out = parse_ltsv(ev.select("event_id", line.alias("text")))
        return out.select(
            "event_id",
            F.col("priority").cast("int").alias("priority"),
            F.col("facility").cast("int").alias("facility"),
            F.col("severity").cast("int").alias("severity"),
            "hostname", "appname", "procid", "message",
            F.get_json_object("properties_json", "$.ltsv.status")
            .alias("status"),
            "properties_json",
            F.col("parse_ok").cast("boolean").alias("parse_ok"),
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss")
            .alias("tr_str"),
        )

    def q_grok(spark, sf):
        # grok-compiled apache common-log extraction: the fixture line
        # is BUILT from events columns, so the oracle checks the
        # compiled regex recovers exactly what was embedded (it never
        # re-parses — full formulation independence); every 17th row is
        # corrupted to pin the no-match contract (match=false, fields
        # empty)
        from skewer_spark.operators.grok import grok_extract
        ev = _read(spark, sf, "events")
        eid, uid = F.col("event_id"), F.col("user_id")
        ip = F.format_string(
            "10.%d.3.%d", F.pmod(uid, F.lit(200)), F.pmod(eid, F.lit(250))
        )
        nbytes = F.when(
            F.pmod(eid, F.lit(7)) == 0, F.lit("-")
        ).otherwise(F.floor(F.col("value") * 100).cast("string"))
        line = F.concat(
            ip, F.lit(" - "), F.concat(F.lit("u"), uid),
            F.lit(" ["), F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
            F.lit(" +0000] \""), F.upper("event_type"),
            F.lit(" /e/"), eid,
            F.when(F.pmod(eid, F.lit(2)) == 0, F.lit(" HTTP/1.1"))
            .otherwise(F.lit("")),
            F.lit("\" "),
            F.when(F.col("event_type") == "error", F.lit("500"))
            .otherwise(F.lit("200")),
            F.lit(" "), nbytes,
        )
        corrupted = F.concat(F.lit("corrupt line "), eid)
        text = F.when(F.pmod(eid, F.lit(17)) == 0, corrupted).otherwise(line)
        out = grok_extract(
            ev.select("event_id", text.alias("text")),
            r"^%{COMMONAPACHELOG}$",
        )
        return out.select(
            "event_id", "grok_match", "clientip", "auth",
            F.col("timestamp").alias("http_ts"), "verb", "request",
            "httpversion", "response", "bytes",
        )

    def q_log_templates(spark, sf):
        # Drain-style template mining over 5 structural line families
        # built from events; lengths collide across families on purpose
        # (the len-4 groups merge into one wildcarded template per
        # service — the oracle replays the whole algorithm)
        from skewer_spark.operators.templates import mine_templates
        ev = _read(spark, sf, "events")
        eid, uid = F.col("event_id"), F.col("user_id")
        body = (
            F.when(
                F.col("event_type") == "error",
                F.concat(F.lit("failed with code "), F.pmod(eid, F.lit(5))),
            )
            .when(
                F.col("event_type") == "click",
                F.concat(F.lit("clicked button "), F.pmod(eid, F.lit(7))),
            )
            .when(
                F.col("event_type") == "view",
                F.concat(F.lit("viewed page /p/"), eid),
            )
            .when(
                F.col("event_type") == "signup",
                F.concat(
                    F.lit("signup from 10.2."), F.pmod(uid, F.lit(9)),
                    F.lit(".4"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("purchase amount "),
                    F.floor(F.col("value") * 100),
                )
            )
        )
        line = F.concat(
            F.lit("app"), F.pmod(uid, F.lit(3)), F.lit(" "), body
        )
        return mine_templates(
            ev.select(eid.alias("line_id"), line.alias("text")),
            id_col="line_id",
        )

    def q_cdc_upsert(spark, sf):
        # MERGE INTO analog: a CDC log (deletes, conflicting updates
        # resolved by (ts, seq), inserts of new keys) applied to orders;
        # the oracle computes the expected table directly from the
        # change rules — full formulation independence
        from skewer_spark.operators.cdc import apply_cdc_log
        o = _read(spark, sf, "orders")
        key = F.col("o_orderkey")
        m = F.pmod(key, F.lit(10))
        base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        ts1 = F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")
        ch1 = o.filter(m < 5).select(
            F.when(m == 4, key + 1000000).otherwise(key)
            .alias("o_orderkey"),
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1000).alias("o_totalprice"),
            ts1.alias("ts"),
            F.when(m == 0, F.lit("D"))
            .when(m == 4, F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.lit(1).cast("long").alias("seq"),
        )
        # same-key same-ts second update: must win on seq
        ch2 = o.filter(m == 3).select(
            key.alias("o_orderkey"),
            F.lit("Y").alias("o_orderstatus"),
            (F.col("o_totalprice") + 2000).alias("o_totalprice"),
            ts1.alias("ts"),
            F.lit("U").alias("op"),
            F.lit(2).cast("long").alias("seq"),
        )
        return apply_cdc_log(
            base, ch1.unionByName(ch2), ["o_orderkey"], "ts", "op", "seq"
        )

    def q_quantile_sketch(spark, sf):
        # SUM-mergeable DDSketch: 5 arbitrary slices build independent
        # bucket tables, merged by plain SUM, then per-event-type
        # p50/p95/p99 come off the merged sketch (DuckDB mirrors the
        # bucket arithmetic single-pass: equality IS the mergeability
        # proof, the q_cms_heavy pattern)
        from skewer_spark.operators.sketches import (
            dd_merge, dd_partials, dd_quantiles,
        )
        ev = _read(spark, sf, "events").withColumn(
            "_sl", F.pmod("event_id", F.lit(5))
        )
        sk = dd_merge(
            dd_partials(
                ev, "value", key_cols=["event_type"], slice_cols=["_sl"]
            ),
            key_cols=["event_type"],
        )
        return dd_quantiles(
            sk, (0.5, 0.95, 0.99), key_cols=["event_type"]
        )

    def q_frame_octet(spark, sf):
        # RFC6587 octet-counting framing round-trip (tcp.go:304-334):
        # even event_ids arrive framed ('<len> <pri>msg'), odd ones
        # bare (LF-framing fallback); strip_octet_count must remove
        # exactly the prefix on framed lines and pass bare lines
        # through byte-identically.  Oracle-paired r4 (was
        # pytest-golden only).  The prefix counts BYTES
        # (octet_length), matching tcp.go's len([]byte) — char length
        # would mis-frame non-ASCII payloads (ADVICE r4).
        from skewer_spark.sources.misc import strip_octet_count
        ev = _read(spark, sf, "events")
        msg = F.concat(
            F.lit("<"), F.pmod("event_id", F.lit(192)).cast("string"),
            F.lit(">"), F.col("event_type"), F.lit(" msg "),
            F.col("event_id").cast("string"),
        )
        framed = F.when(
            F.pmod("event_id", F.lit(2)) == 0,
            F.concat(F.octet_length(msg).cast("string"), F.lit(" "), msg),
        ).otherwise(msg)
        return ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            framed.alias("framed"),
            strip_octet_count(framed).alias("stripped"),
        )

    def q_multiline(spark, sf):
        # stack-trace reassembly: continuation lines ('  at …') fold
        # into the preceding header; the oracle replays the running
        # header-count window in DuckDB
        from skewer_spark.operators.flow import merge_multiline
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        text = F.when(
            F.pmod(eid, F.lit(5)).isin(1, 2),
            F.concat(F.lit("  at frame "), eid),
        ).otherwise(F.concat(F.lit("ERR event "), eid))
        lines = ev.select(
            F.concat(F.lit("f"), F.pmod("user_id", F.lit(4)))
            .alias("path"),
            eid.alias("line_no"),
            text.alias("text"),
        )
        return merge_multiline(lines)

    def q_rate_limit(spark, sf):
        # rsyslog rate-limit analog: admit <= 20 rows per
        # (event_type, hour), deterministic (ts, event_id) order,
        # excess rows flagged not dropped
        from skewer_spark.operators.flow import rate_limit
        ev = _read(spark, sf, "events")
        out = rate_limit(
            ev, ["event_type"], "ts", burst=20, interval_seconds=3600,
            tiebreak_col="event_id",
        )
        return out.select(
            "event_id", "event_type", "rl_window", "admitted"
        )

    def q_scd2(spark, sf):
        # SCD type-2 dimension history: per user, event_type change
        # ranges with validity stamps (consecutive no-ops collapse)
        from skewer_spark.operators.cdc import scd2_history
        ev = _read(spark, sf, "events").select("user_id", "ts", "event_type")
        h = scd2_history(ev, ["user_id"], "ts", ["event_type"])
        fmt = "yyyy-MM-dd HH:mm:ss"
        return h.select(
            "user_id", "event_type",
            F.date_format("valid_from", fmt).alias("valid_from"),
            F.date_format("valid_to", fmt).alias("valid_to"),
            "is_current",
        )

    def q_dedup_exact(spark, sf):
        docs = _read(spark, sf, "documents")
        return exact_dedup(docs)

    def q_dedup_fingerprint(spark, sf):
        docs = _read(spark, sf, "documents")
        return fingerprint_dedup(docs)

    def q_minhash_lsh(spark, sf):
        # bucket_cap=64: the 100 TB guard against quadratic blow-up in a
        # degenerate bucket (this corpus's buckets are dup-dense, so the
        # cap is actually exercised here — the oracle mirrors it with a
        # row_number() QUALIFY)
        docs = _read(spark, sf, "documents")
        return minhash_candidate_pairs(docs, bucket_cap=64)

    def q_ngram_jaccard(spark, sf):
        from skewer_spark.operators.dedup import ngram_jaccard_pairs
        docs = _read(spark, sf, "documents")
        return ngram_jaccard_pairs(docs, n=3, threshold=0.3)

    def q_dedup_clusters(spark, sf):
        # transitive closure of the n-gram Jaccard pairs: every doc gets
        # the min doc_id reachable through the near-dup graph
        from skewer_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
        docs = _read(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3)
        return dedup_clusters(docs, pairs)

    def q_dedup_apply(spark, sf):
        # materialize the dedup decision: keep ONE doc per near-dup
        # cluster (the cluster_id doc), report how many it absorbed —
        # the curation step a training-data pipeline actually ships
        from skewer_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
        docs = _read(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3)
        clusters = dedup_clusters(docs, pairs)
        return (
            clusters.groupBy("cluster_id")
            .agg(F.count("*").alias("n_members"))
            .select(
                F.col("cluster_id").alias("keeper_id"),
                "n_members",
                (F.col("n_members") - 1).alias("n_removed"),
            )
        )

    def q_dedup_clusters_star(spark, sf):
        # same transitive-closure contract as q_dedup_clusters (same
        # recursive-CTE oracle) via alternating large-star/small-star —
        # O(log diameter) rounds, the 10^12-edge scale path
        from skewer_spark.operators.dedup import (
            dedup_clusters_star,
            ngram_jaccard_pairs,
        )
        docs = _read(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3)
        return dedup_clusters_star(docs, pairs)

    def q_boilerplate(spark, sf):
        # C4/RefinedWeb-style cross-document boilerplate span removal:
        # any word 5-gram in >= 3 distinct docs is cut from every doc
        from skewer_spark.operators.curate import remove_boilerplate_spans
        docs = _read(spark, sf, "documents")
        return remove_boilerplate_spans(docs, n=5, min_docs=3)

    def q_dedup_substr(spark, sf):
        # exact-substring span dedup (Lee et al. 2022): every word
        # 5-gram occurring more than once corpus-wide is cut from all
        # occurrences EXCEPT the globally-first (keep-first semantics
        # — contrast q_boilerplate, which cuts every occurrence)
        from skewer_spark.operators.dedup import dedup_substring_spans
        docs = _read(spark, sf, "documents")
        return dedup_substring_spans(docs, n=5)

    def q_url_filter(spark, sf):
        # URL/domain document filter (C4/RefinedWeb pre-content stage).
        # URLs BY CONSTRUCTION from doc_id (documents carry no URL
        # column): deterministic scheme/userinfo/www/port/tld mix plus
        # a malformed-host branch, exercising every reason branch
        from skewer_spark.operators.curate import url_filter
        docs = _read(spark, sf, "documents")
        did = F.col("doc_id")
        schemes = F.array(F.lit("https"), F.lit("http"),
                          F.lit("ftp"), F.lit("https"))
        tlds = F.array(F.lit("com"), F.lit("org"), F.lit("zip"),
                       F.lit("net"), F.lit("io"))
        normal = F.concat(
            F.element_at(schemes, F.pmod(did, F.lit(4)).cast("int") + 1),
            F.lit("://"),
            F.when(F.pmod(did, F.lit(7)) == 0, F.lit("u:p@")).otherwise(F.lit("")),
            F.when(F.pmod(did, F.lit(5)) == 0, F.lit("www.")).otherwise(F.lit("")),
            F.format_string("site%02d", F.pmod(did, F.lit(40))),
            F.lit("."),
            F.element_at(tlds, F.pmod(did, F.lit(5)).cast("int") + 1),
            F.when(F.pmod(did, F.lit(11)) == 0, F.lit(":8080")).otherwise(F.lit("")),
            F.format_string("/p/%d?q=%d", did, F.pmod(did, F.lit(9))),
        )
        url = F.when(
            F.pmod(did, F.lit(19)) == 0, F.lit(None).cast("string")
        ).when(
            F.pmod(did, F.lit(17)) == 0,
            F.format_string("https:///broken/%d", did),
        ).otherwise(normal)
        src = docs.select("doc_id", url.alias("url"))
        return url_filter(
            src,
            blocked_domains=["site03.net", "site08.net", "site21.org"],
        )

    def q_soft_dedup(spark, sf):
        # duplicate down-weighting (SlimPajama-style): weight = 1/k per
        # identical-text group, deterministic Bernoulli keep
        from skewer_spark.operators.curate import soft_dedup_weights
        docs = _read(spark, sf, "documents")
        return soft_dedup_weights(docs)

    def q_tfidf_terms(spark, sf):
        from skewer_spark.operators.curate import tfidf_top_terms
        docs = _read(spark, sf, "documents")
        return tfidf_top_terms(docs, k=3)

    def q_bigram_ppl(spark, sf):
        # CCNet-style LM quality gate: per-doc mean log-prob under a
        # corpus-trained add-alpha bigram model
        from skewer_spark.operators.curate import bigram_logprob_scores
        docs = _read(spark, sf, "documents")
        return bigram_logprob_scores(docs)

    def q_bpe_merges(spark, sf):
        # distributed BPE tokenizer TRAINING (Sennrich et al. 2016):
        # one corpus pass builds the word-frequency table, then each
        # merge round is one partial-aggregable pair-count shuffle with
        # a TakeOrdered argmax — the corpus is never touched again
        from skewer_spark.operators.tokenizer import (
            bpe_train, merges_frame, word_frequency,
        )
        docs = _read(spark, sf, "documents")
        merges, final = bpe_train(word_frequency(docs), num_merges=4)
        final.unpersist()
        return merges_frame(spark, merges)

    def q_bpe_apply(spark, sf):
        # large-vocab BPE APPLY path: Arrow-batched pandas encoder with
        # a per-worker word memo (Zipfian hit rate), training-order
        # merge semantics identical to the JVM expression path (parity
        # pinned by test); fixed 4-merge list so the oracle can mirror
        # the double-space replace chain exactly
        from skewer_spark.operators.tokenizer import apply_bpe_pandas
        docs = _read(spark, sf, "documents")
        merges = [
            {"step": 1, "lhs": "t", "rhs": "h", "pair_count": 0},
            {"step": 2, "lhs": "th", "rhs": "e", "pair_count": 0},
            {"step": 3, "lhs": "i", "rhs": "n", "pair_count": 0},
            {"step": 4, "lhs": "a", "rhs": "n", "pair_count": 0},
        ]
        toks = apply_bpe_pandas(docs.select("doc_id", "text"), merges)
        return toks.select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.concat_ws("|", F.slice("tokens", 1, 12)).alias("head_tokens"),
        )

    def q_zorder(spark, sf):
        # Morton (Z-order) layout key over (n_chars, doc_id): the
        # multi-column file-pruning sort key (Delta OPTIMIZE ZORDER /
        # Iceberg sort-order analog); pure shift/add arithmetic
        from skewer_spark.operators.layout import zorder_key
        docs = _read(spark, sf, "documents")
        return zorder_key(
            docs.select("doc_id", "n_chars"), ["n_chars", "doc_id"], bits=8
        ).select("doc_id", "zkey")

    def q_bucketed_join(spark, sf):
        # bucketed-table layout (Hive bucketing / Iceberg bucket
        # transform analog): both join sides are written hash-clustered
        # on the key, so the sort-merge join runs with ZERO exchanges —
        # the write-once layout that removes the per-join corpus
        # re-key at 100 TB.  The result itself is checked against a
        # plain-join oracle; the no-shuffle plan property is pinned in
        # tests/test_layout.py.
        import shutil
        import tempfile
        import uuid

        from skewer_spark.operators.layout import write_bucketed

        ev = _read(spark, sf, "events").select(
            "event_id", "user_id", "event_type"
        )
        tot = ev.groupBy("user_id").agg(F.sum("event_id").alias("user_mass"))
        # per-invocation unique names + path: two harness processes at
        # the same sf must not race on one catalog table / directory,
        # and repeated runs must not accrete orphans
        token = uuid.uuid4().hex[:10]
        base = tempfile.mkdtemp(prefix=f"skewer_bucketed_{token}_")
        t_ev, t_tot = f"q_bkt_events_{token}", f"q_bkt_totals_{token}"
        try:
            write_bucketed(ev, t_ev, ["user_id"], 8, path=base + "/ev")
            write_bucketed(tot, t_tot, ["user_id"], 8, path=base + "/tot")
            j = (
                spark.table(t_ev)
                .hint("merge")
                .join(spark.table(t_tot), "user_id")
            )
            res = j.groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.sum("user_mass").alias("mass"),
            )
            # materialize (tiny: one row per event_type) so the tables
            # and files can be dropped before returning
            out = spark.createDataFrame(res.collect(), res.schema)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_ev}")
            spark.sql(f"DROP TABLE IF EXISTS {t_tot}")
            shutil.rmtree(base, ignore_errors=True)
        return out

    def q_sketch_distinct(spark, sf):
        # mergeable-exact distinct counting: the input is split into 7
        # arbitrary slices (NOT key-partitioned), per-slice bitmap
        # sketches are built independently, then merged — proving the
        # snapshot-metrics contract (fold a new slice into stored
        # sketches without rescanning history) gives the exact count
        from skewer_spark.operators.sketches import (
            bitmap_merge, bitmap_partials,
        )
        ev = _read(spark, sf, "events")
        sliced = ev.withColumn("slice", F.pmod("event_id", F.lit(7)))
        parts = bitmap_partials(
            sliced, "user_id", ["event_type", "slice"]
        ).drop("slice")
        return bitmap_merge(parts, ["event_type"])

    def q_cms_heavy(spark, sf):
        # SUM-mergeable count-min sketch: 5 arbitrary slices build
        # independent d×w counter tables, merged by plain SUM, then the
        # exact top-10 users by event count are point-queried against
        # the merged sketch (estimate >= exact always; md5-bucket
        # arithmetic makes the whole sketch engine-replicable)
        from skewer_spark.operators.sketches import (
            cms_estimate, cms_merge, cms_partials,
        )
        ev = _read(spark, sf, "events")
        sliced = ev.withColumn("slice", F.pmod("event_id", F.lit(5)))
        sketch = cms_merge(
            cms_partials(sliced, "user_id", ["slice"]).drop("slice")
        )
        top = (
            ev.groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("exact_n"))
            .orderBy(F.desc("exact_n"), F.asc("user_id"))
            .limit(10)
        )
        return (
            top.join(cms_estimate(sketch, top, "user_id"), "user_id")
            .select(
                F.col("user_id").cast("bigint").alias("user_id"),
                "exact_n",
                F.col("cms_count").cast("bigint").alias("cms_n"),
            )
        )

    def q_hybrid_search(spark, sf):
        # hybrid retrieval: BM25 lexical top-20 over documents fused
        # with dense cosine top-20 over the aligned embeddings table by
        # reciprocal-rank fusion (1/(60+rank), ranks from the rounded
        # per-modality scores) — the standard lexical+dense combiner
        from skewer_spark.operators.search import bm25_search, rrf_fuse
        docs = _read(spark, sf, "documents")
        emb = _read(spark, sf, "embeddings")
        lex = bm25_search(
            docs.select("doc_id", "text"), ["spark", "join", "window"], k=20
        ).select("doc_id", "score")
        qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        dense = brute_force_topk(emb, list(qvec), k=20).select(
            F.col("vec_id").alias("doc_id"), F.col("cos_sim").alias("score")
        )
        return rrf_fuse([lex, dense], k=10)

    def q_dsir_weights(spark, sf):
        # DSIR data selection: hashed-n-gram importance log-ratio of an
        # 'en'-target bag model vs the rest of the corpus
        from skewer_spark.operators.curate import dsir_importance_weights
        docs = _read(spark, sf, "documents")
        return dsir_importance_weights(docs, F.col("lang") == "en")

    def q_pack_sequences(spark, sf):
        # GPT-style concat-and-chunk packing: per-doc token span in the
        # fixed-length training-sequence stream (distributed prefix sum)
        from skewer_spark.operators.pack import pack_sequences
        docs = _read(spark, sf, "documents")
        return pack_sequences(docs, seq_len=512)

    def q_doc_chunks(spark, sf):
        # RAG-style per-document sliding-window chunking: 64-token
        # windows, 16-token overlap (stride 48); every chunk after the
        # first contributes >=1 new token, final chunk may be short —
        # zero shuffles, one posexplode
        from skewer_spark.operators.pack import chunk_documents
        docs = _read(spark, sf, "documents")
        return chunk_documents(
            docs.select("doc_id", "text"), chunk_tokens=64, overlap=16
        )

    def q_budget_select(spark, sf):
        # greedy token-budget corpus selection: keep whole docs in
        # (quality DESC, doc_id) order while the running token total
        # fits the budget — distributed bucketed prefix sum
        from skewer_spark.functions.text import quality_score
        from skewer_spark.operators.select import token_budget_select
        docs = _read(spark, sf, "documents")
        return token_budget_select(docs, quality_score(), budget_tokens=20000)

    def q_mixture_weights(spark, sf):
        # temperature-scaled domain sampling weights (mT5/UniMax style)
        from skewer_spark.operators.select import mixture_weights
        docs = _read(spark, sf, "documents")
        return mixture_weights(docs, "lang", temperature=2.0)

    def q_apply_mixture(spark, sf):
        # materialized temperature mix: per-doc epoch count (copies)
        # realizing the mixing weights under a token budget, decided by
        # a deterministic md5 uniform (no RNG state)
        from skewer_spark.operators.select import apply_mixture
        docs = _read(spark, sf, "documents")
        return apply_mixture(docs, budget_tokens=50000, group_col="lang",
                             temperature=2.0)

    def q_shard_shuffle(spark, sf):
        # deterministic global shuffle into training shards: stable
        # md5-keyed shard + in-shard position, no RNG state
        from skewer_spark.operators.select import shard_and_shuffle
        docs = _read(spark, sf, "documents")
        return shard_and_shuffle(docs, n_shards=8)

    def q_split_assign(spark, sf):
        # content-keyed train/val/test split: a doc's split is a pure
        # function of md5(salt||id) — stable under resharding and
        # corpus growth (no row_number cuts, no RNG)
        from skewer_spark.operators.select import split_assign
        docs = _read(spark, sf, "documents")
        return split_assign(docs)

    def q_sample_per_group(spark, sf):
        # deterministic stratified sample: n docs per language, ordered
        # by a hash of the id (reproducible, no RNG — resume-safe)
        from pyspark.sql import Window
        docs = _read(spark, sf, "documents")
        w = Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        return (
            docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .select("lang", "doc_id", F.col("rn").cast("int").alias("rn"))
        )

    def q_simhash(spark, sf):
        docs = _read(spark, sf, "documents")
        return simhash(docs)

    def q_simhash_pairs(spark, sf):
        # bucket_cap=64: 16-bit band keys mean at 10^9+ docs every bucket
        # is thousands deep — the one-sided cap bounds the self-join
        # output at |bucket|·cap (oracle mirrors with QUALIFY)
        from skewer_spark.operators.dedup import simhash_candidate_pairs
        docs = _read(spark, sf, "documents")
        return simhash_candidate_pairs(docs, max_hamming=3, bucket_cap=64)

    def q_ann_topk(spark, sf):
        emb = _read(spark, sf, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        return brute_force_topk(emb, list(qvec), k=10)

    def q_ann_lsh(spark, sf):
        from skewer_spark.operators.similarity import lsh_bucketed_topk
        emb = _read(spark, sf, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        return lsh_bucketed_topk(
            emb, list(qvec), k=10, n_planes=8, probe_hamming=2
        )

    def q_sq8_topk(spark, sf):
        # int8 scalar-quantized ANN (FAISS SQ8 analog): 4x memory cut
        # for the 100 TB vector store; integer dot scores are exact
        # int64 so the oracle matches bit-for-bit
        from skewer_spark.operators.similarity import sq8_topk
        emb = _read(spark, sf, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select(
            "embedding"
        ).collect()[0][0]
        return sq8_topk(emb, list(qvec), k=10)

    def q_embed_neardup(spark, sf):
        emb = _read(spark, sf, "embeddings")
        return cosine_pairs_above(
            emb, threshold=0.3, bands=4, rows_per_band=8, bucket_cap=200
        )

    def q_ivf_topk(spark, sf):
        # IVF-flat ANN: centroids = the 16 lowest-id vectors (deterministic
        # zero-iteration seeding so the oracle is exact); probe 4 cells.
        from skewer_spark.operators.similarity import ivf_topk
        emb = _read(spark, sf, "embeddings")
        rows = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
        cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
        return ivf_topk(emb, cents[0], cents, k=10, nprobe=4)

    def q_kmeans(spark, sf):
        # one exactly-reproducible distributed Lloyd step: assignment by
        # rounded cosine (max-cos, max-cid tiebreak — the ivf_assign
        # contract) + integer-quantized per-cell means so the result is
        # independent of partition summation order.  kmeans_fit runs the
        # float-sum training loop; this is the audited single update.
        from skewer_spark.operators.cluster import kmeans_update
        emb = _read(spark, sf, "embeddings")
        rows = emb.filter(F.col("vec_id") < 8).select(
            "vec_id", "embedding"
        ).collect()
        cents = {int(r[0]): [float(x) for x in r[1]] for r in rows}
        return kmeans_update(emb, cents)

    def q_semdedup(spark, sf):
        # SemDeDup (cluster-scoped embedding near-dedup): drop any doc
        # whose cell holds a lower-id doc with cosine >= 0.3.  cell_cap
        # caps the PROPOSING side only (decisions for every doc similar
        # to a surviving keeper are unchanged; oracle mirrors via
        # QUALIFY) so a degenerate cell cannot go quadratic.
        from skewer_spark.operators.cluster import semdedup
        emb = _read(spark, sf, "embeddings")
        rows = emb.filter(F.col("vec_id") < 8).select(
            "vec_id", "embedding"
        ).collect()
        cents = {int(r[0]): [float(x) for x in r[1]] for r in rows}
        return semdedup(emb, cents, threshold=0.3, cell_cap=64)

    def q_classifier(spark, sf):
        # fastText-style hashed linear quality-classifier inference; the
        # LCG demo weights collapse the weight lookup to a pure
        # expression and the integer dot product is summation-order
        # exact, so DuckDB reproduces the hash bit-for-bit.
        from skewer_spark.operators.curate import hashed_classifier_score
        docs = _read(spark, sf, "documents")
        return hashed_classifier_score(docs, threshold=0.0)

    def q_token_pctl(spark, sf):
        # exact per-language token-length percentiles (curation gate:
        # "drop docs above the p95 length for their language").  Exact
        # percentile sorts each group's values — right for dim-sized
        # groups; at 100 TB swap F.percentile for approx_percentile
        # (t-digest, no global sort) and accept the documented error.
        from skewer_spark.functions.text import token_count
        docs = _read(spark, sf, "documents")
        tc = docs.select("lang", token_count().alias("tc"))
        return tc.groupBy("lang").agg(
            F.round(F.percentile("tc", F.lit(0.5)), 4).alias("p50_tokens"),
            F.round(F.percentile("tc", F.lit(0.95)), 4).alias("p95_tokens"),
            F.max("tc").alias("max_tokens"),
        )

    def q_bpe_tokens(spark, sf):
        from skewer_spark.functions.text import bpe_token_count
        docs = _read(spark, sf, "documents")
        return docs.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(bpe_token_count()).cast("long").alias("sum_bpe_tokens"),
        )

    def q_winnow_fp(spark, sf):
        from skewer_spark.functions.text import winnow_fingerprint
        docs = _read(spark, sf, "documents")
        return docs.select("doc_id", winnow_fingerprint(k=8, w=4).alias("wfp"))

    def q_text_stats(spark, sf):
        docs = _read(spark, sf, "documents")
        return docs.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count()).cast("long").alias("sum_tokens"),
            F.sum(char_count()).cast("long").alias("sum_chars"),
        )

    def q_lang_id(spark, sf):
        docs = _read(spark, sf, "documents")
        return docs.select(lang_id().alias("predicted_lang")).groupBy(
            "predicted_lang"
        ).agg(F.count("*").alias("n"))

    def q_doc_fingerprint(spark, sf):
        docs = _read(spark, sf, "documents")
        return docs.select("doc_id", word_fingerprint().alias("fp"))

    def q_parse_json(spark, sf):
        # Regular-JSON decoder: build the JSON line from event fields,
        # decode with the real operator; oracle recomputes by construction
        from skewer_spark.operators.decode_json import parse_regular_json
        ev = _read(spark, sf, "events")
        fac_name = F.element_at(
            F.array(*[F.lit(x) for x in
                      ("kern", "auth", "cron", "local3")]),
            F.pmod(F.col("event_id"), F.lit(4)).cast("int") + 1,
        )
        sev_name = F.element_at(
            F.array(*[F.lit(x) for x in
                      ("emerg", "crit", "notice", "debug")]),
            F.pmod(F.col("event_id"), F.lit(3)).cast("int") + 1,
        )
        line = F.to_json(F.struct(
            fac_name.alias("facility"),
            sev_name.alias("severity"),
            F.date_format(F.date_trunc("second", "ts"),
                          "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timereported"),
            F.format_string("jh%02d", F.pmod(F.col("user_id"), F.lit(30))).alias("hostname"),
            F.lit("japp").alias("appname"),
            F.col("event_type").alias("message"),
        ))
        src = ev.select(F.col("event_id"), line.alias("text"))
        out = parse_regular_json(src)
        return out.select(
            "event_id", "priority", "facility", "severity", "hostname",
            "appname", "message",
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
        )

    def q_parse_influx(spark, sf):
        from skewer_spark.operators.decode_influx import parse_influx
        ev = _read(spark, sf, "events")
        line = F.format_string(
            "cpu,host=ih%02d,region=r%d count=%di,ok=true,note=\"n%d\" %d",
            F.pmod(F.col("user_id"), F.lit(40)),
            F.pmod(F.col("event_id"), F.lit(5)),
            F.pmod(F.col("event_id"), F.lit(1000)),
            F.pmod(F.col("event_id"), F.lit(7)),
            F.col("event_id") * F.lit(1_000_000_000),
        )
        src = ev.select("event_id", line.alias("text"),
                        F.col("ts"))
        out = parse_influx(src)
        return out.select(
            "event_id", "priority", "facility", "severity", "hostname",
            "appname", "message",
            F.get_json_object("properties_json",
                              "$.influxdb_fields.count_integer").alias("count_i"),
            F.get_json_object("properties_json",
                              "$.influxdb_tags.region").alias("region"),
            F.date_format("time_reported", "yyyy-MM-dd HH:mm:ss").alias("tr_str"),
        )

    def q_quality_score(spark, sf):
        from skewer_spark.functions.text import quality_score
        docs = _read(spark, sf, "documents")
        return (
            docs.select(quality_score().alias("quality"))
            .groupBy("quality").agg(F.count("*").alias("n"))
        )

    def q_pii_redact(spark, sf):
        # PII scrub: lines with known-shape email/IP/card/phone built
        # from event fields; the operator redacts + counts per class
        from skewer_spark.functions.scrub import pii_counts, redact_pii
        ev = _read(spark, sf, "events")
        line = F.format_string(
            "user u%d@example.org at %d.%d.%d.%d card 4111111111%06d "
            "tel +3361234%04d note %s",
            F.pmod(F.col("user_id"), F.lit(50)),
            F.pmod(F.col("event_id"), F.lit(223)) + 1,
            F.pmod(F.col("event_id"), F.lit(250)),
            F.pmod(F.col("user_id"), F.lit(250)),
            F.pmod(F.col("event_id"), F.lit(254)) + 1,
            F.pmod(F.col("event_id"), F.lit(1000000)),
            F.pmod(F.col("event_id"), F.lit(10000)),
            F.col("event_type"),
        )
        src = ev.select("event_id", line.alias("text"))
        return src.select("event_id", redact_pii().alias("redacted"), *pii_counts())

    def q_repetition(spark, sf):
        # Gopher-style repetition quality gates (Rae et al. 2021 A1)
        from skewer_spark.functions.scrub import (
            dup_ngram_ratio,
            dup_word_ratio,
            top_word_ratio,
        )
        docs = _read(spark, sf, "documents")
        return docs.select(
            "doc_id",
            dup_word_ratio().alias("dup_word_frac"),
            top_word_ratio().alias("top_word_frac"),
            dup_ngram_ratio(n=2).alias("dup_2gram_frac"),
        )

    def q_decontam(spark, sf):
        # benchmark decontamination: docs ≡ 0 (mod 10) act as the eval
        # set; the rest get 3-gram overlap fraction + contaminated flag
        from skewer_spark.operators.decontaminate import contamination_report
        docs = _read(spark, sf, "documents")
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        rest = docs.filter(F.col("doc_id") % 10 != 0)
        rep = contamination_report(rest, bench, n=3, threshold=0.1)
        return rep.select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_matched").cast("long").alias("n_matched"),
            "overlap_frac",
            "contaminated",
        )

    def q_curation(spark, sf):
        # composite curation verdict: exact-dedup keeper + lang gate +
        # quality gate + decontamination, first failing rule = reason
        # (bench split mirrors q_decontam: doc_id ≡ 0 mod 10 is eval)
        from skewer_spark.operators.curate import curation_decisions
        docs = _read(spark, sf, "documents")
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        rest = docs.filter(F.col("doc_id") % 10 != 0)
        return curation_decisions(rest, bench)

    def q_image_decode(spark, sf):
        # REAL image codec check: build a 4×2 P6 PPM per event in pure
        # expressions (pixel i = (event_id*7+i) % 256), decode with the
        # actual numpy codec, emit exact integer channel sums — the
        # oracle recomputes them arithmetically, never touching the
        # codec (independence)
        from skewer_spark.operators.multimodal import image_stats
        ev = _read(spark, sf, "events")
        hexpix = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(23)),
                lambda i: F.lpad(
                    F.hex(F.pmod(F.col("event_id") * 7 + i, F.lit(256))), 2, "0"
                ),
            ),
        )
        src = ev.select(
            F.col("event_id"),
            F.concat(F.lit(b"P6\n4 2\n255\n"), F.unhex(hexpix)).alias("payload"),
        )
        return image_stats(src, id_col="event_id")

    def q_audio_decode(spark, sf):
        # REAL WAV codec check: 16 PCM16-LE samples per event,
        # s_i = ((event_id*31 + i*997) % 65536) - 32768; fixed canonical
        # header (16 samples, 16 kHz mono) as a binary literal
        import numpy as _np
        from skewer_spark.functions.codecs import encode_wav
        from skewer_spark.operators.multimodal import audio_stats
        header = encode_wav(_np.zeros(16, dtype="<i2"), rate=16000)[:44]
        ev = _read(spark, sf, "events")

        def le_hex(i):
            u16 = F.pmod(F.col("event_id") * 31 + i * 997, F.lit(65536))
            h4 = F.lpad(F.hex(u16), 4, "0")
            return F.concat(F.substring(h4, 3, 2), F.substring(h4, 1, 2))

        pcm_hex = F.concat_ws(
            "", F.transform(F.sequence(F.lit(0), F.lit(15)), le_hex)
        )
        src = ev.select(
            F.col("event_id"),
            F.concat(F.lit(bytes(header)), F.unhex(pcm_hex)).alias("payload"),
        )
        return audio_stats(src, id_col="event_id")

    def q_asof_enrich(spark, sf):
        # as-of join: enrich each event with the config version active
        # at its timestamp (configs = every 23rd event, keyed by user)
        from skewer_spark.operators.temporal import as_of_join
        ev = _read(spark, sf, "events")
        cfg = ev.filter(F.col("event_id") % 23 == 0).select(
            "user_id", "ts", F.col("event_id").alias("cfg_version")
        )
        left = ev.filter(F.col("event_id") % 23 != 0).select(
            "event_id", "user_id", "ts"
        )
        # bucket_seconds engages the hot-key sub-bucket path (identical
        # results; the per-(key,bucket) window is what survives a user
        # holding 10% of 10^12 rows)
        out = as_of_join(
            left, cfg, key="user_id", left_ts="ts", right_ts="ts",
            bucket_seconds=3600,
        )
        return out.select("event_id", "user_id", "cfg_version")

    def q_session_agg(spark, sf):
        # gap-based sessionization (4h inactivity closes a session)
        from skewer_spark.operators.temporal import session_agg
        ev = _read(spark, sf, "events")
        s = session_agg(ev.select("user_id", "ts"), "user_id", "ts", "4 hours")
        return s.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("session_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_last"
            ),
            "n_events",
        )

    def q_tpch_q1(spark, sf):
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
                F.count("*").alias("count_order"),
            )
        )

    def q_sft_pairs(spark, sf):
        # SFT (prompt, response) extraction from transcript turns —
        # the skew-safe join formulation (no per-conversation window;
        # dense positions via distributed prefix count + equi-join on
        # the unique (conv, pos) key).  The oracle states the SAME
        # semantics as the naive SQL window — equality of the two
        # formulations is exactly what is being checked.
        from skewer_spark.operators.transcripts import sft_pairs
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        payload = F.concat(
            F.col("event_type"), F.lit(" msg "), eid.cast("string"),
            F.when(F.pmod(eid, F.lit(11)) == 0, F.lit(" REJECTME"))
            .otherwise(F.lit("")),
        )
        turns = ev.select(
            F.col("user_id").cast("string").alias("conv_id"),
            eid.cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            payload.alias("text"),
        )
        return sft_pairs(
            turns, assistant_role="purchase", k=4,
            skew_safe=True, n_buckets=16,
        )

    def q_conv_stats(spark, sf):
        # per-conversation rollup over payload-text turns (tool via
        # the event_type dictionary, cf. sources/events.TOOL_BY_EVENT)
        from skewer_spark.operators.transcripts import conv_stats
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        payload = F.concat(
            F.col("event_type"), F.lit(" msg "), eid.cast("string"),
            F.when(F.pmod(eid, F.lit(11)) == 0, F.lit(" REJECTME"))
            .otherwise(F.lit("")),
        )
        tool = F.lit("none")
        for k_, v_ in {
            "click": "browser", "view": "browser",
            "purchase": "bash", "signup": "editor",
        }.items():
            tool = F.when(F.col("event_type") == k_, F.lit(v_)).otherwise(tool)
        turns = ev.select(
            F.col("user_id").cast("string").alias("conv_id"),
            eid.cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            payload.alias("text"),
            tool.alias("tool"),
            F.col("ts"),
        )
        return conv_stats(turns)

    def q_domain_quantile(spark, sf):
        # FineWeb-style per-domain quantile selection: each source
        # keeps its own top quartile by score (score = n_chars so the
        # oracle's quantile_cont interpolation is exact in double)
        from skewer_spark.operators.select import per_domain_quantile_select
        docs = _read(spark, sf, "documents")
        src = docs.select(
            "doc_id",
            F.col("source").alias("domain"),
            F.col("n_chars").cast("double").alias("score"),
        )
        return per_domain_quantile_select(src, q=0.75)

    def q_weighted_sample(spark, sf):
        # deterministic Efraimidis–Spirakis weighted sample: top-50
        # docs by u^(1/n_chars) with md5 uniforms (resume-safe, no RNG)
        from skewer_spark.operators.select import weighted_sample
        docs = _read(spark, sf, "documents")
        out = weighted_sample(
            docs.select("doc_id", F.col("n_chars").alias("weight")),
            n=50, id_col="doc_id",
        )
        return out.select("doc_id", "sample_key")

    def q_pagerank(spark, sf):
        # damped PageRank (3 iterations, uniform dangling
        # redistribution) over a deterministic bipartite-ish link
        # graph derived from events: every event links its user to a
        # synthetic hub u<event_id%97>; every 3rd event links back
        from skewer_spark.operators.graph import pagerank
        ev = _read(spark, sf, "events")
        hub = F.concat(
            F.lit("u"), F.pmod(F.col("event_id"), F.lit(97)).cast("string")
        )
        uid = F.col("user_id").cast("string")
        fwd = ev.select(uid.alias("src"), hub.alias("dst"))
        back = ev.filter(F.col("event_id") % 3 == 0).select(
            hub.alias("src"), uid.alias("dst")
        )
        return pagerank(fwd.union(back), iters=3)

    def q_rate_anomaly(spark, sf):
        # robust windowed rate anomaly (Iglewicz–Hoaglin modified
        # z-score, MAD → meanAD fallback, gap hours zero-filled so
        # outages score as hard as spikes)
        from skewer_spark.operators.anomaly import rate_anomalies
        ev = _read(spark, sf, "events")
        out = rate_anomalies(ev.select("event_type", "ts"), window="1 hour")
        return out.select(
            "event_type",
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events", "med", "mad", "z_score", "is_anomaly",
        )

    def q_bm25_search(spark, sf):
        # full-text BM25 top-10 over the documents corpus (inverted
        # index + Lucene-idf scoring; scores rounded to 6 dp BEFORE the
        # (score desc, doc_id) order so the rank-k cut is
        # engine-independent even under exact score ties)
        from skewer_spark.operators.search import bm25_search
        docs = _read(spark, sf, "documents")
        return bm25_search(
            docs.select("doc_id", "text"), ["spark", "join", "window"], k=10
        )

    def q_funnel(spark, sf):
        # ordered-step funnel with strict-after milestone semantics:
        # earliest signup, then earliest view AFTER it, then click,
        # then purchase; per-step reach counts + conversion rates
        from skewer_spark.operators.funnel import funnel_counts
        ev = _read(spark, sf, "events")
        return funnel_counts(
            ev.select("user_id", "ts", "event_type"),
            ["signup", "view", "click", "purchase"],
        )

    def q_range_join(spark, sf):
        # interval-containment join via time bucketing (equi-join on
        # (key, bucket) — never a nested-loop range join): intervals =
        # every 29th event's 6-hour window, events land in the
        # intervals of their own user
        from skewer_spark.operators.temporal import range_join
        ev = _read(spark, sf, "events")
        iv = ev.filter(F.col("event_id") % 29 == 0).select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
            F.col("event_id").alias("iv_id"),
        )
        out = range_join(
            ev.select("event_id", "user_id", "ts"), iv,
            key="user_id", event_ts="ts", bucket_seconds=3600,
        )
        return out.select("event_id", "iv_id")

    def q_seq_ngrams(spark, sf):
        # behavioral role-trigram mining over per-user event sequences
        from skewer_spark.operators.transcripts import sequence_ngrams
        ev = _read(spark, sf, "events")
        turns = ev.select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("event_id").cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
        )
        return sequence_ngrams(turns, n=3)

    def q_context_windows(spark, sf):
        # sliding 3-turn training windows (stride 1) over payload text
        from skewer_spark.operators.transcripts import context_windows
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        payload = F.concat(
            F.col("event_type"), F.lit(" msg "), eid.cast("string")
        )
        turns = ev.select(
            F.col("user_id").cast("string").alias("conv_id"),
            eid.cast("int").alias("turn_idx"),
            payload.alias("text"),
        )
        return context_windows(turns, k=3, sep="|")

    def q_setsim_exact(spark, sf):
        # EXACT set-similarity self-join (AllPairs/PPJoin prefix
        # filtering): every pair with bigram-shingle Jaccard >= 0.5,
        # zero false negatives — the compliance-grade complement to the
        # LSH dedup stack (which trades recall for speed).  Word SETS
        # are useless on this small-vocab fixture (74% of pairs >= 0.5)
        # so the query runs on word-bigram shingles, where exactly the
        # planted near-dups qualify.
        from skewer_spark.operators.setsim import prefix_jaccard_pairs
        docs = _read(spark, sf, "documents")
        return prefix_jaccard_pairs(
            docs.select("doc_id", "text"), threshold=0.5, shingle_n=2
        )

    def q_bloom_decontam(spark, sf):
        # scale-out decontamination pre-filter: benchmark shingles go
        # into a 2^20-bit / k=5 Bloom filter (128 KiB of int64 words —
        # broadcastable no matter how large the benchmark corpus),
        # probe docs count might-contain shingles.  No false negatives:
        # docs with n_flagged = 0 PROVABLY share no shingle with the
        # benchmark set, so the exact check runs only on the remainder.
        from skewer_spark.operators.setsim import _doc_token_frame
        from skewer_spark.operators.sketches import (
            bloom_merge, bloom_partials, bloom_probe,
        )
        docs = _read(spark, sf, "documents")
        sh = _doc_token_frame(docs, "text", "doc_id", shingle_n=3)
        bench = sh.filter(F.col("doc_id") % 10 == 0).select(
            F.col("tok").alias("key")
        )
        rest = sh.filter(F.col("doc_id") % 10 != 0)
        # build in two slices and merge — exercises the mergeability
        # path the incremental-benchmark use case needs
        bloom = bloom_merge(
            bloom_partials(bench.filter(F.crc32("key") % 2 == 0)).union(
                bloom_partials(bench.filter(F.crc32("key") % 2 == 1))
            )
        )
        verdicts = bloom_probe(rest.select(F.col("tok").alias("key")), bloom)
        return (
            rest.join(verdicts, rest["tok"] == verdicts["key"])
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_shingles"),
                F.sum(F.col("might_contain").cast("long")).alias(
                    "n_flagged"
                ),
            )
        )

    def q_resample_locf(spark, sf):
        # irregular telemetry -> fixed hourly grid per event_type with
        # last-observation-carried-forward gap fill; gap rows flagged
        # not invented (is_observed) — the downsampling step between
        # the influx/collectd-style sources and any dashboard join
        from skewer_spark.operators.temporal import resample_locf
        ev = _read(spark, sf, "events")
        out = resample_locf(
            ev.select("event_type", "event_id", "ts", "value"),
            "event_type", interval_seconds=3600,
        )
        return out.select(
            "event_type",
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "value",
            "is_observed",
        )

    def q_profile(spark, sf):
        # one-scan per-column data-quality profile (nulls / distincts /
        # extrema) over events — the tabular analog of the reference's
        # per-source metrics.go counters.  exact_distinct=True for
        # oracle parity; the 100 TB default is approx HLL.
        from skewer_spark.operators.profile import profile_table
        ev = _read(spark, sf, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        return profile_table(ev, exact_distinct=True)

    def q_json_schema(spark, sf):
        # schema inference + type-drift histogram over a semi-structured
        # JSON bag (the rsyslog $!/GELF-extra shape) via Spark 4 VARIANT
        # — pure JVM, no Python.  The bag is constructed deterministically
        # from event rows (4 producer variants incl. a type drift on "k",
        # nested objects, arrays, nulls, and a malformed tail) so the
        # DuckDB oracle builds the identical strings and types them with
        # json_type/json_keys.
        from skewer_spark.operators.jsonschema import infer_json_schema
        ev = _read(spark, sf, "events")
        k = (F.col("event_id") % 100).cast("string")
        u = (F.col("user_id") % 50).cast("string")
        j = (
            F.when(
                F.col("event_id") % 4 == 0,
                F.concat(
                    F.lit('{"k":'), k,
                    F.lit(',"tags":["'), F.col("event_type"),
                    F.lit('"],"meta":{"u":'), u,
                    F.lit(',"src":"'), F.col("event_type"), F.lit('"}}'),
                ),
            )
            .when(
                F.col("event_id") % 4 == 1,
                F.concat(F.lit('{"k":"'), k, F.lit('","flag":true}')),
            )
            .when(
                F.col("event_id") % 4 == 2,
                F.concat(
                    F.lit('{"k":'), k,
                    F.lit(',"score":1.5,"meta":{"u":null}}'),
                ),
            )
            .otherwise(F.lit('{"k":'))  # malformed (truncated producer)
        )
        out = infer_json_schema(ev.select(j.alias("j")), "j", max_depth=2)
        return out.select(
            "path", "vtype", "n", F.col("frac").cast("double").alias("frac")
        )

    def q_json_drift(spark, sf):
        # schema DRIFT between two producer generations: the even-id
        # half only emits bag variants {0,2} (tags/meta/score), the odd
        # half {1,3} (flag + the malformed tail), so added / removed /
        # shifted all appear — including the "$.k" int↔string type
        # drift.  Fracs are per-half coverages; NULL (absent side)
        # coalesced to -1.0 for the hash compare.
        from skewer_spark.operators.jsonschema import (
            infer_json_schema,
            json_schema_drift,
        )
        ev = _read(spark, sf, "events")
        k = (F.col("event_id") % 100).cast("string")
        u = (F.col("user_id") % 50).cast("string")
        j = (
            F.when(
                F.col("event_id") % 4 == 0,
                F.concat(
                    F.lit('{"k":'), k,
                    F.lit(',"tags":["'), F.col("event_type"),
                    F.lit('"],"meta":{"u":'), u,
                    F.lit(',"src":"'), F.col("event_type"), F.lit('"}}'),
                ),
            )
            .when(
                F.col("event_id") % 4 == 1,
                F.concat(F.lit('{"k":"'), k, F.lit('","flag":true}')),
            )
            .when(
                F.col("event_id") % 4 == 2,
                F.concat(
                    F.lit('{"k":'), k,
                    F.lit(',"score":1.5,"meta":{"u":null}}'),
                ),
            )
            .otherwise(F.lit('{"k":'))
        )
        bags = ev.select((F.col("event_id") % 2).alias("_half"), j.alias("j"))
        old = infer_json_schema(bags.filter(F.col("_half") == 0), "j")
        new = infer_json_schema(bags.filter(F.col("_half") == 1), "j")
        d = json_schema_drift(old, new)
        return d.select(
            "path",
            "vtype",
            F.coalesce(F.col("old_frac").cast("double"), F.lit(-1.0)).alias(
                "old_frac"
            ),
            F.coalesce(F.col("new_frac").cast("double"), F.lit(-1.0)).alias(
                "new_frac"
            ),
            "status",
        )

    def q_html_text(spark, sf):
        # HTML main-text extraction + markup-density stats (the
        # C4/RefinedWeb pre-content stage): documents are wrapped in a
        # deterministic HTML shell (4 producer variants exercising
        # script/style/comment strip, entity decode incl. the
        # one-level &amp;lt; contract, multiline tags) built
        # identically on both engines, then stripped back with the
        # pure-regex codegen chain in operators/extract.py.
        from skewer_spark.operators.extract import html_text_col
        docs = _read(spark, sf, "documents")
        frag = F.substring("text", 1, 60)
        html = F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>p{color:red}</style></head><body>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit("<!-- hidden --><h1>"), F.col("source"),
                    F.lit(" &amp; more</h1><p>"), frag, F.lit("</p>"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit('<script>var a="'), F.col("lang"),
                    F.lit('";</script><p>'), frag,
                    F.lit('</p><a href="/d/'),
                    F.col("doc_id").cast("string"), F.lit('">next</a>'),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.concat(
                    F.lit('<div\nclass="x">'), frag,
                    F.lit("&nbsp;&quot;"), F.col("lang"),
                    F.lit("&quot; &amp;lt;esc&amp;gt;</div>"),
                ),
            )
            .otherwise(frag),
            F.lit("</body></html>"),
        )
        # ONE projection for stats + extracted text (r6): the previous
        # stats ⋈ text join ran the whole regex strip chain twice (once
        # inside html_stats, once for the joined text column) and paid
        # a join exchange; a single narrow select computes the chain
        # once (whole-stage CSE dedups the repeated text references)
        # and emits identical columns in identical order.
        shell = docs.select(F.col("doc_id").alias("id"), html.alias("html"))
        h = F.col("html")
        text = html_text_col(h)
        stats_with_text = shell.select(
            "id",
            F.regexp_count(h, F.lit(r"(?s)<[a-zA-Z!/][^>]*>")).alias("n_tags"),
            F.regexp_count(h, F.lit(r"(?i)<a\b")).alias("n_links"),
            F.regexp_count(h, F.lit(r"(?i)<script\b")).alias("n_scripts"),
            F.length(h).alias("html_chars"),
            F.length(text).alias("text_chars"),
            F.round(
                F.length(text).cast("double")
                / F.greatest(F.length(h), F.lit(1)).cast("double"),
                6,
            ).alias("text_ratio"),
            text.alias("text"),
        )
        return stats_with_text

    def q_url_canon(spark, sf):
        # URL canonicalization + canonical-URL dedup groups (the
        # URL-level first dedup of a web pipeline): 7 deterministic
        # producer variants from events exercise case-folding, default
        # vs explicit ports, userinfo strip, fragment strip, path
        # collapse, tracking-param drop, param sort, and the
        # schemeless->NULL fail-safe.
        from skewer_spark.operators.extract import url_dedup
        ev = _read(spark, sf, "events")
        m = F.col("event_id") % 7
        pid = (F.col("event_id") % 40).cast("string")
        uk = (F.col("user_id") % 3).cast("string")
        url = (
            F.when(m == 0, F.concat(
                F.lit("HTTP://WWW.Example.COM:80/p/"), pid,
                F.lit("/?utm_source=x&b=2&a="), uk, F.lit("#f")))
            .when(m == 1, F.concat(
                F.lit("https://example.com:8443/a//b?gclid=z&q="), pid))
            .when(m == 2, F.concat(
                F.lit("http://Example.com/p/"), pid, F.lit("?a="), uk))
            .when(m == 3, F.concat(
                F.lit("https://u:p@Sub.Example.com/p/"), pid, F.lit("/")))
            .when(m == 4, F.concat(
                F.lit("ftp://files.example.com/x/"), pid))
            .when(m == 5, F.concat(F.lit("example.com/skip/"), pid))
            .otherwise(F.concat(
                F.lit("https://example.com/p/"), pid,
                F.lit("?b=2&utm_medium=m&a="), uk))
        )
        urls = ev.select(F.col("event_id").alias("doc_id"), url.alias("url"))
        return url_dedup(urls)

    def q_kanon(spark, sf):
        # k-anonymity / l-diversity re-identification audit over a
        # quasi-identifier pair (event_type × user bucket) with a
        # floor-bucketed sensitive value — the governance gate that
        # runs AFTER redact_pii removes direct identifiers.  Group
        # frame is compact (|QI combos| rows); the corpus shuffles as
        # key columns only.
        from skewer_spark.operators.privacy import qi_group_audit
        ev = _read(spark, sf, "events")
        qi = ev.select(
            "event_type",
            (F.col("user_id") % 20).alias("user_bucket"),
            (F.floor("value").cast("long") % 5).alias("value_band"),
        )
        return qi_group_audit(
            qi, ["event_type", "user_bucket"], "value_band", k=5, l=3
        )

    def q_label_agg(spark, sf):
        # annotation majority vote + agreement (the RLHF label-curation
        # reduce): items get ~40 votes each from 7 annotators; winning
        # label by (count DESC, label ASC) — the deterministic
        # tie-break both engines replay exactly.
        from skewer_spark.operators.labels import majority_labels
        ev = _read(spark, sf, "events")
        votes = ev.select(
            (F.col("event_id") % 250).alias("item_id"),
            F.concat(F.lit("ann"), (F.col("user_id") % 7).cast("string")).alias(
                "annotator_id"
            ),
            F.col("event_type").alias("label"),
        )
        return majority_labels(votes)

    def q_rand_proj(spark, sf):
        # Johnson–Lindenstrauss random projection 64-d -> 8-d with
        # md5-drawn integer planes (engine-replicable); exploded to
        # (vec_id, proj_idx, val) rows rounded 6dp.  The documented
        # scale path INTO the LSH/IVF signature operators.
        from skewer_spark.operators.similarity import random_projection
        emb = _read(spark, sf, "embeddings")
        out = random_projection(emb, "embedding", out_dim=8, dim=64)
        # posexplode_OUTER: `proj` is a non-null 8-element array
        # literal per row, so outer vs inner emit identical rows — but
        # the inner variant makes the optimizer infer a size() filter
        # with all 8 projection folds inlined, pushed below the
        # parallelism repartition (single-partition eval, r6)
        return out.select(
            "vec_id", F.posexplode_outer("proj").alias("proj_idx", "val")
        )

    def q_incr_dedup(spark, sf):
        # incremental dedup: odd-id docs arrive as the NEW batch and
        # are judged against the even-id committed corpus via its
        # STORED minhash signatures — corpus text is never touched
        # (the continuous-crawl production shape; est_jaccard is the
        # signature-agreement estimate, best match tie-broken by
        # lowest corpus id).
        from skewer_spark.operators.dedup import (
            incremental_dedup,
            minhash_signatures,
        )
        docs = _read(spark, sf, "documents")
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        new = docs.filter(F.col("doc_id") % 2 == 1)
        # eager checkpoint = the stored signature table of the
        # production shape (computed inside this run; the operator
        # consumes it twice — banding + verify — and would otherwise
        # re-sign the corpus per subtree, r6)
        sigs = minhash_signatures(
            corpus, "text", "doc_id", n_hashes=8
        ).localCheckpoint(eager=True)
        return incremental_dedup(new, sigs, threshold=0.5)

    def q_link_records(spark, sf):
        # entity resolution across two feeds derived from documents:
        # left = even docs, right = every-3rd docs (names re-ordered,
        # year perturbed for doc_id%12==6) — entities overlapping at
        # doc_id%6==0 must link on token-blocked candidates with
        # weighted field agreement.
        from skewer_spark.operators.linkage import link_records
        docs = _read(spark, sf, "documents")
        words = F.split(F.col("text"), " ")
        base_year = (F.lit(1970) + F.col("n_chars") % 30).cast("int")
        left = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("rec_id"),
            F.array_join(F.slice(words, 1, 3), " ").alias("name"),
            F.col("source").alias("city"),
            base_year.alias("year"),
        )
        right = docs.filter(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("rec_id"),
            F.array_join(F.reverse(F.slice(words, 1, 3)), " ").alias("name"),
            F.col("source").alias("city"),
            (base_year
             + F.when(F.col("doc_id") % 12 == 6, 1).otherwise(0)).cast(
                "int"
            ).alias("year"),
        )
        return link_records(
            left, right, exact_cols=["city", "year"], max_token_df=40
        )

    def q_normalize(spark, sf):
        # CCNet-style dedup canonicalization: three deterministic
        # perturbation classes (upper-case, appended digits, accent
        # injection) must normalize to forms both engines hash
        # identically.
        from skewer_spark.functions.text import normalize_for_dedup
        docs = _read(spark, sf, "documents")
        t = (
            F.when(F.col("doc_id") % 3 == 0, F.upper("text"))
            .when(F.col("doc_id") % 3 == 1, F.concat("text", F.lit(" 42")))
            .otherwise(F.translate(F.col("text"), "ae", "áé"))
        )
        return (
            docs.withColumn("t", t)
            .select(
                "doc_id",
                F.md5(normalize_for_dedup("t")).alias("norm_hash"),
                F.length(normalize_for_dedup("t")).alias("n_chars"),
            )
        )

    def q_key_skew(spark, sf):
        # key-skew diagnostics over the events stream's event_type —
        # the measurement that justifies salting/sub-bucketing before
        # a 100 TB shuffle on a candidate key.
        from skewer_spark.operators.skew import key_skew_report
        ev = _read(spark, sf, "events")
        return key_skew_report(ev, ["event_type"], top_n=5)

    def q_hard_neg(spark, sf):
        # hard-negative mining for contrastive training: per anchor,
        # top-5 neighbors with cosine in [0.1, 0.9) — similar enough
        # to be informative, below the near-dup line; candidates from
        # the banded LSH machinery q_embed_neardup pins.
        from skewer_spark.operators.similarity import hard_negative_pairs
        emb = _read(spark, sf, "embeddings")
        return hard_negative_pairs(emb, lo=0.1, hi=0.9, per_anchor=5)

    def q_validate(spark, sf):
        # data-contract validation gate: 4 row rules (one violated,
        # one fail-closed on an injected NULL) + 2 uniqueness rules
        # (one clean, one duplicated) — all in ONE scan, per-rule
        # rows via the explode-of-structs profile pattern.
        from skewer_spark.operators.validate import validation_report
        ev = _read(spark, sf, "events")
        # inject NULLs so the fail-closed branch is exercised: every
        # 100th row loses its event_type
        ev = ev.withColumn(
            "event_type",
            F.when(F.col("event_id") % 100 == 0, F.lit(None)).otherwise(
                F.col("event_type")
            ),
        )
        return validation_report(
            ev,
            row_rules=[
                ("value_nonneg", F.col("value") >= 0),
                ("value_below_400", F.col("value") < 400),
                ("type_known", F.col("event_type").isin(
                    "click", "error", "purchase", "signup", "view")),
                ("ts_not_null", F.col("ts").isNotNull()),
            ],
            unique_cols=[["event_id"], ["user_id", "event_type"]],
        )

    def q_pmi(spark, sf):
        # PMI-scored adjacent-bigram collocations over documents
        # (Church & Hanks): occurrence-margin PMI with a min_count=20
        # noise floor; the multi-word-expression / boilerplate-phrase
        # detector of the curation stack.
        from skewer_spark.operators.collocations import pmi_bigrams
        docs = _read(spark, sf, "documents")
        return pmi_bigrams(docs, min_count=20)

    def q_snapshot_diff(spark, sf):
        # content-hash snapshot diff (CDC EXTRACTION — the inverse of
        # q_cdc_upsert's apply): old/new versions of the events table
        # derived deterministically so added / removed / changed /
        # unchanged all appear, incl. NULL-value transitions.
        from skewer_spark.operators.diff import diff_summary, snapshot_diff
        ev = _read(spark, sf, "events")
        base = ev.select(
            "event_id", "user_id",
            F.when(F.col("event_id") % 13 == 0, F.lit(None))
            .otherwise(F.col("event_type")).alias("event_type"),
            "value",
        )
        old = base.filter(F.col("event_id") % 10 != 0)
        new = base.filter(F.col("event_id") % 9 != 0).select(
            "event_id", "user_id",
            F.when(F.col("event_id") % 11 == 0, F.lit(None))
            .otherwise(F.col("event_type")).alias("event_type"),
            F.when(F.col("event_id") % 7 == 0, F.col("value") + 1)
            .otherwise(F.col("value")).alias("value"),
        )
        return diff_summary(snapshot_diff(old, new, ["event_id"]))

    def q_sft_spans(spark, sf):
        # SFT loss-mask layout over a transcript shape derived from
        # events (conv = user, turn = event order, role = event_type,
        # deterministic per-turn token counts): per-turn packed spans
        # + the learn-on-assistant mask — the step between raw
        # transcripts and supervised fine-tuning batches.
        from skewer_spark.operators.pack import sft_turn_spans
        ev = _read(spark, sf, "events")
        t = ev.select(
            F.col("user_id").alias("conv_id"),
            F.col("event_id").alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.array_join(
                F.array_repeat(
                    F.lit("tok"), (F.col("event_id") % 9 + 1).cast("int")
                ),
                " ",
            ).alias("text"),
        )
        return sft_turn_spans(t, loss_roles=("purchase", "signup"))

    def q_rolling(spark, sf):
        # per-key trailing-5 moving stats over the event stream
        # (deterministic (ts, event_id) order — duplicate timestamps
        # exist, so the tiebreak is part of the contract).
        from skewer_spark.operators.temporal import rolling_stats
        ev = _read(spark, sf, "events")
        out = rolling_stats(
            ev.select(
                F.col("event_type").alias("key"), "ts", "event_id", "value"
            ),
            key_col="key", ts_col="ts", value_col="value",
            window_rows=5, tiebreak_col="event_id",
        )
        return out.select(
            "key",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            "event_id", "value", "roll_mean", "roll_min", "roll_max",
            "roll_n",
        )

    def q_histogram(spark, sf):
        # equi-width value histogram (data-derived bounds, max value
        # counted in the last bin, out-of-range clamps not drops).
        from skewer_spark.operators.profile import numeric_histogram
        ev = _read(spark, sf, "events")
        return numeric_histogram(ev, "value", bins=20)

    def q_winsorize(spark, sf):
        # percentile clipping of the value column at [p1, p99] — exact
        # F.percentile thresholds (the q_token_pctl-proven
        # quantile_cont pairing) broadcast back onto the stream.
        from skewer_spark.operators.profile import winsorize
        ev = _read(spark, sf, "events")
        return winsorize(
            ev.select("event_id", "value"), "value", p_lo=0.01, p_hi=0.99
        )

    def q_logreg(spark, sf):
        # distributed logistic-regression training, audited: 2 exact
        # integer-quantized batch-GD steps from zero weights over
        # 4-dim embedding features — bit-reproducible under any
        # partitioning (the kmeans_update contract), mirrored by an
        # unrolled DuckDB replay (the q_pagerank pattern for
        # iterative ops).
        from skewer_spark.operators.train import (
            logreg_gradient_step,
            weights_frame,
        )
        emb = _read(spark, sf, "embeddings")
        df = emb.select(
            F.slice(F.col("embedding"), F.lit(1), F.lit(4)).alias("features"),
            (F.col("vec_id") % 3 == 0).cast("int").alias("label"),
        )
        w = [0.0] * 4
        for _ in range(2):
            w = logreg_gradient_step(df, w, lr=0.5)
        return weights_frame(spark, w)

    def q_threads(spark, sf):
        # agent-trace threading over a transcript shape derived from
        # events (click/view=user, signup/purchase=assistant,
        # error=tool): reply-tree parents + user-message thread
        # segmentation via pure window algebra.
        from skewer_spark.operators.transcripts import thread_turns
        ev = _read(spark, sf, "events")
        t = ev.select(
            F.col("user_id").alias("conv_id"),
            F.col("event_id").alias("turn_idx"),
            F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type").isin("signup", "purchase"), "assistant")
            .otherwise("tool")
            .alias("role"),
        )
        return thread_turns(t)

    def q_join_size(spark, sf):
        # exact pre-flight join-size estimate from the two key
        # histograms (never running the join): even-id vs odd-id event
        # halves joined on a 30-bucket user key.
        from skewer_spark.operators.skew import join_size_estimate
        ev = _read(spark, sf, "events")
        keyed = ev.select((F.col("user_id") % 30).alias("ub"), "event_id")
        left = keyed.filter(F.col("event_id") % 2 == 0)
        right = keyed.filter(F.col("event_id") % 2 == 1)
        return join_size_estimate(left, right, ["ub"], top_n=10)

    def q_compaction(spark, sf):
        # Iceberg small-file compaction plan: per table partition,
        # pack synthetic per-file byte totals into ~2 MB rewrite
        # groups via the windowed next-fit-decreasing assignment.
        from skewer_spark.operators.maintenance import compaction_plan
        ev = _read(spark, sf, "events")
        files = ev.groupBy(
            (F.col("user_id") % 4).alias("part"),
            (F.col("event_id") % 240).alias("file_id"),
        ).agg(
            (
                F.count(F.lit(1)) * 1000
                + F.sum(F.floor(F.col("value") * 100))
            )
            .cast("bigint")
            .alias("bytes")
        )
        return compaction_plan(
            files, ["part"], target_bytes=2_000_000
        )

    def q_zonemap(spark, sf):
        # per-file zone maps over time-clustered daily files + the
        # file-skip verdict for a 3-day BETWEEN scan (the parquet
        # footer / Iceberg manifest pruning model, made measurable).
        from skewer_spark.operators.maintenance import (
            zonemap_skip,
            zonemap_stats,
        )
        ev = _read(spark, sf, "events")
        epoch = F.unix_timestamp(F.col("ts"))
        keyed = ev.select(
            F.floor(epoch / 86400).cast("bigint").alias("file_id"),
            epoch.alias("v"),
        )
        zm = zonemap_stats(keyed, "file_id", "v")
        # 2024-01-10 .. 2024-01-13 (exclusive) in epoch seconds
        return zonemap_skip(zm, lo=1704844800, hi=1705103999)

    def q_late_events(spark, sf):
        # watermark late-event audit: arrival order = ingest offset
        # (event_id), event time deterministically jittered backwards
        # by (event_id % 37) minutes so a 10-minute watermark drops a
        # measurable tail — per-hour on-time/late counts.
        from skewer_spark.operators.temporal import late_event_audit
        ev = _read(spark, sf, "events")
        jittered = ev.select(
            (F.col("user_id") % 8).alias("part"),
            F.col("event_id").alias("arrival_id"),
            # integer seconds: truncate first, so the jittered value
            # round-trips the timestamp type exactly on both engines
            F.timestamp_seconds(
                F.unix_timestamp(F.col("ts"))
                - (F.col("event_id") % 37) * 60
            ).alias("ts"),
        )
        audited = late_event_audit(
            jittered,
            "part",
            ts_col="ts",
            arrival_col="arrival_id",
            delay_seconds=600,
            window_seconds=3600,
        )
        return audited.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_on_time",
            "n_late",
            "late_fraction",
        )

    def q_psi(spark, sf):
        # population-stability drift between the even-id and odd-id
        # halves of the value column: 10 fixed bins over [0, 500),
        # per-bin contributions + the corpus PSI total on every row.
        from skewer_spark.operators.diff import psi_drift
        ev = _read(spark, sf, "events")
        ref = ev.filter(F.col("event_id") % 2 == 0)
        cur = ev.filter(F.col("event_id") % 2 == 1)
        return psi_drift(ref, cur, "value", lo=0.0, hi=500.0, n_bins=10)

    def q_cohort(spark, sf):
        # weekly cohort retention matrix over user activity: first
        # epoch-week per user × active-week offset.
        from skewer_spark.operators.funnel import cohort_retention
        ev = _read(spark, sf, "events")
        out = cohort_retention(
            ev, key="user_id", ts_col="ts", period_seconds=604800,
            max_offset=12,
        )
        return out.select(
            F.date_format("cohort_start", "yyyy-MM-dd HH:mm:ss").alias(
                "cohort_start"
            ),
            "offset",
            "n_active",
            "cohort_size",
            "retention",
        )

    def q_transitions(spark, sf):
        # first-order Markov transition matrix between consecutive
        # event types of each user's offset-ordered stream (the
        # tool→next-tool usage graph in the transcript shape).
        from skewer_spark.operators.funnel import transition_matrix
        ev = _read(spark, sf, "events")
        return transition_matrix(
            ev, key="user_id", order_col="event_id", state_col="event_type"
        )

    def q_pref_pairs(spark, sf):
        # DPO-style preference-pair mining: responses grouped by a
        # 2000-way prompt key, chosen = best score, rejected = worst,
        # zero-margin prompts dropped.
        from skewer_spark.operators.preference import preference_pairs
        ev = _read(spark, sf, "events")
        resp = ev.select(
            (F.col("event_id") % 2000).alias("prompt_id"),
            F.col("event_id").alias("resp_id"),
            F.col("value").alias("score"),
        )
        return preference_pairs(resp)

    def q_bradley_terry(spark, sf):
        # Bradley-Terry strengths over event-type duels: consecutive
        # events of a user duel, higher value wins; two exact MM
        # iterations on the reduced pair-count frame.
        from pyspark.sql import Window

        from skewer_spark.operators.preference import bradley_terry
        ev = _read(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
        duels = (
            ev.select(
                F.col("event_type").alias("a"),
                F.lead("event_type").over(w).alias("b"),
                F.col("value").alias("va"),
                F.lead("value").over(w).alias("vb"),
            )
            .filter(
                F.col("b").isNotNull()
                & (F.col("a") != F.col("b"))
                & (F.col("va") != F.col("vb"))
            )
            .select(
                F.when(F.col("va") > F.col("vb"), F.col("a"))
                .otherwise(F.col("b"))
                .alias("winner"),
                F.when(F.col("va") > F.col("vb"), F.col("b"))
                .otherwise(F.col("a"))
                .alias("loser"),
            )
        )
        return bradley_terry(duels, iters=2)

    def q_tree_depth(spark, sf):
        # pointer-doubling forest resolution: every node's root and
        # depth in O(log depth) self-joins; parents form 8 binary
        # trees (ids < 8 are roots, parent = id DIV 2 otherwise), so
        # depth ~ log2(n) and the DuckDB recursive-CTE oracle walks
        # the same forest one hop at a time.
        from skewer_spark.operators.graph import tree_root_depth
        ev = _read(spark, sf, "events")
        nodes = ev.select(
            F.col("event_id").alias("id"),
            F.when(F.col("event_id") < 8, F.lit(None).cast("bigint"))
            .otherwise(F.expr("event_id DIV 2"))
            .alias("parent"),
        )
        return tree_root_depth(nodes)

    def q_range_bounds(spark, sf):
        # range-partitioner planning: exact 8-way percentile cuts on
        # the value column + per-range row counts proving balance.
        from skewer_spark.operators.layout import range_partition_plan
        ev = _read(spark, sf, "events")
        return range_partition_plan(ev, "value", n_partitions=8)

    def q_orphan_files(spark, sf):
        # orphan-file detection: listing = 300 synthetic files, live
        # manifest = the 80% with file_id % 5 != 0, 3-day age guard
        # against in-flight commits, clock = the listing's own max
        # mtime (determinism contract).
        from skewer_spark.operators.maintenance import orphan_files
        ev = _read(spark, sf, "events")
        # contiguous 40-event blocks so file mtimes spread over the
        # table's whole time range (events arrive time-ordered)
        listing = ev.groupBy(
            F.expr("event_id DIV 40").alias("file_id")
        ).agg(
            (F.count(F.lit(1)) * 500 + F.sum("user_id"))
            .cast("bigint")
            .alias("bytes"),
            F.max("ts").alias("mtime"),
        )
        manifest = listing.filter(F.col("file_id") % 5 != 0).select(
            "file_id"
        )
        return orphan_files(listing, manifest)

    def q_snap_expiry(spark, sf):
        # snapshot-retention plan: keep newest 5 + everything within
        # 7 days of the log's own head; the rest marked expirable.
        from skewer_spark.operators.maintenance import snapshot_expiry
        ev = _read(spark, sf, "events")
        snaps = ev.groupBy(
            (F.col("event_id") % 40).alias("snapshot_id")
        ).agg(F.max("ts").alias("committed_ts"))
        return snapshot_expiry(snaps, keep_last=5, keep_seconds=7 * 86400)

    def q_salted_agg(spark, sf):
        # two-stage salted hot-key aggregation == plain GROUP BY (the
        # oracle IS the unsalted form — associativity proof by hash);
        # integer-valued doubles so the two-stage sum is bit-exact.
        from skewer_spark.operators.skew import salted_agg
        ev = _read(spark, sf, "events")
        keyed = ev.select(
            "user_id", F.floor(F.col("value") * 100).cast("double").alias("v")
        )
        return salted_agg(keyed, ["user_id"], "v", n_salts=16)

    def q_time_rollup(spark, sf):
        # hour/day/week count+sum rollups in ONE grouping-sets scan;
        # integer-valued doubles keep the sums engine-exact.
        from skewer_spark.operators.aggregate import time_rollup
        ev = _read(spark, sf, "events")
        keyed = ev.select(
            "ts", F.floor(F.col("value") * 100).cast("double").alias("v")
        )
        return time_rollup(keyed, ts_col="ts", value_col="v")

    def q_incr_agg(spark, sf):
        # incremental view maintenance: committed state (even ids) +
        # micro-batch delta (odd ids) merged == full recompute — the
        # oracle IS the recompute over the union.
        from skewer_spark.operators.aggregate import (
            agg_state,
            merge_agg_state,
        )
        ev = _read(spark, sf, "events")
        keyed = ev.select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100).cast("double").alias("v"),
        )
        state = agg_state(
            keyed.filter(F.col("event_id") % 2 == 0), ["user_id"], "v"
        )
        delta = agg_state(
            keyed.filter(F.col("event_id") % 2 == 1), ["user_id"], "v"
        )
        merged = merge_agg_state(state, delta, ["user_id"])
        return merged.select(
            "user_id",
            "n_rows",
            F.round("sum_v", 6).alias("sum_v"),
            "min_v",
            "max_v",
        )

    def q_cidr_enrich(spark, sf):
        # longest-prefix-match CIDR enrich: range join rewritten as a
        # /16-bucket-expanded broadcast EQUI join + residual filter —
        # never a BroadcastNestedLoopJoin.  IPs synthesized from
        # event_id hit nested prefixes (/8⊃/12⊃/16⊃/24), gaps, and two
        # forced deep-nest branches.
        from skewer_spark.operators.ipnet import cidr_enrich, demo_cidr_table
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        o2 = (eid % 256).cast("string")
        o3 = (F.expr("event_id DIV 7") % 256).cast("string")
        o4 = (F.expr("event_id DIV 49") % 256).cast("string")
        o1 = F.element_at(
            F.array(*[F.lit(v) for v in ("10", "10", "10", "100", "172", "192", "198")]),
            (eid % 7 + 1).cast("int"),
        )
        ip = (
            F.when(eid % 100 == 0, F.concat_ws(".", F.lit("10"), F.lit("32"), F.lit("7"), o4))
            .when(eid % 101 == 0, F.concat_ws(".", F.lit("192"), F.lit("168"), F.lit("150"), o4))
            .otherwise(F.concat_ws(".", o1, o2, o3, o4))
        )
        probe = ev.select("event_id", ip.alias("ip"))
        out = cidr_enrich(probe, demo_cidr_table(spark), ip_col="ip")
        return out.select(
            "event_id",
            "ip",
            "matched_cidr",
            F.col("prefix_len").cast("bigint").alias("prefix_len"),
            "net_name",
            "net_class",
        )

    def q_trend(spark, sf):
        # per-user least-squares telemetry trend from EXACT integer
        # moment sums (order-independent; the closed forms evaluate in
        # double once per key from identical integers on any engine)
        from skewer_spark.operators.aggregate import linear_trend
        ev = _read(spark, sf, "events")
        pts = ev.select(
            "user_id",
            (
                F.expr("unix_micros(cast(ts as timestamp)) DIV 1000000")
                - F.lit(1704067200)
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("y"),
        )
        return linear_trend(pts, ["user_id"], "x", "y")

    def q_intervals(spark, sf):
        # gaps-and-islands: merge overlapping maintenance-window-style
        # intervals per key via running-max window + one groupBy
        from skewer_spark.operators.temporal import coalesce_intervals
        ev = _read(spark, sf, "events")
        s = (F.col("event_id") * 7919) % 50000
        iv = ev.select(
            (F.col("user_id") % 20).alias("grp"),
            s.alias("start"),
            (s + F.col("event_id") % 97 + 1).alias("end"),
        )
        return coalesce_intervals(iv, ["grp"], "start", "end")

    def q_radius_pairs(spark, sf):
        # exact radius self-join via integer grid bucketing (3×3
        # neighbor-cell equi join — never a cross join); integer
        # dist² metric so the compare is exact on both engines
        from skewer_spark.operators.spatial import radius_pairs
        ev = _read(spark, sf, "events")
        eid = F.col("event_id")
        pts = ev.select(
            eid.alias("pid"),
            ((eid * 7919) % 20000).alias("x"),
            # quadratic residue decorrelates y from the linear x (two
            # linear congruential coords share a lattice whose min
            # distance exceeds any useful radius)
            (((eid * eid) % 104729) % 20000).alias("y"),
        )
        return radius_pairs(pts, "pid", "x", "y", radius=25)

    def q_entropy(spark, sf):
        # per-user Shannon entropy of the event-type mix (source
        # diversity signal); only integer counts cross the shuffle
        from skewer_spark.operators.profile import category_entropy
        ev = _read(spark, sf, "events")
        return category_entropy(ev, ["user_id"], "event_type")

    def q_evolve(spark, sf):
        # schema-evolution reconcile: an old int-metric snapshot and a
        # new double-metric snapshot with an added column union under
        # the widened schema; absent columns read as typed NULLs
        from skewer_spark.operators.evolve import reconcile_frames
        ev = _read(spark, sf, "events")
        a = ev.filter(F.col("event_id") % 2 == 0).select(
            "event_id",
            F.floor(F.col("value") * 100).cast("int").alias("metric"),
            F.col("event_type").alias("note"),
        )
        b = ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id",
            (F.col("value") * 100).alias("metric"),
            F.lit("b").alias("origin"),
        )
        out = reconcile_frames([a, b])
        return out.select(
            "event_id",
            F.round(F.col("metric"), 6).alias("metric"),
            "note",
            "origin",
        )

    def q_topk_group(spark, sf):
        # exact per-group top-k via two-stage salted k-arrays — no
        # full per-group sort, hot groups bounded at k·n_salts partials
        from skewer_spark.operators.skew import salted_topk
        ev = _read(spark, sf, "events")
        return salted_topk(
            ev.select("user_id", "event_id", "value"),
            ["user_id"],
            "value",
            "event_id",
            k=10,
        )

    def q_calibration(spark, sf):
        # reliability-curve bins for a [0,1] score; dyadic scores
        # (k/1024) make every sum exact regardless of add order
        from skewer_spark.operators.train import calibration_bins
        ev = _read(spark, sf, "events")
        scored = ev.select(
            ((F.col("event_id") % 1024) / F.lit(1024.0)).alias("score"),
            F.when(F.col("event_id") % 3 == 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("label"),
        )
        return calibration_bins(scored, "score", "label", n_bins=10)

    def q_triangles(spark, sf):
        # degree-ordered triangle counting over a 61-node residue
        # graph — every triangle materializes once, wedges bounded
        # O(m^1.5) by orientation.
        from skewer_spark.operators.graph import triangle_counts
        ev = _read(spark, sf, "events")
        edges = ev.select(
            (F.col("event_id") % 61).alias("src"),
            (F.expr("event_id DIV 61") % 61).alias("dst"),
        )
        return triangle_counts(edges)

    def q_hot_ngrams(spark, sf):
        # corpus-level repeated-n-gram excision signal (C4-style):
        # an n-gram is hot when >= 2 distinct docs contain it; int64
        # xxhash64 gram keys ride both shuffles (oracle joins on the
        # gram string — no collisions at fixture scale, bound in
        # operators/repeats.py)
        from skewer_spark.operators.repeats import hot_ngram_stats
        docs = _read(spark, sf, "documents")
        return hot_ngram_stats(
            docs.select("doc_id", "text"), n=3, min_docs=2, flag_frac=0.2
        )

    def q_char_entropy(spark, sf):
        # per-doc character-entropy quality proxy — sorted-run-length
        # formulation, O(n log n)/row, zero shuffle
        from skewer_spark.functions.text import char_entropy
        docs = _read(spark, sf, "documents")
        return docs.select(
            "doc_id", char_entropy().alias("char_entropy_bits")
        )

    def q_split_leakproof(spark, sf):
        # holdout split keyed on the exact-dup fingerprint: every
        # duplicate of a doc lands in the SAME split (id-keyed splits
        # leak near-dups across train/test)
        from skewer_spark.operators.select import split_assign_grouped
        docs = _read(spark, sf, "documents")
        fp = docs.select(
            "doc_id", F.md5(F.col("text")).alias("fp")
        )
        return split_assign_grouped(fp, "fp", id_col="doc_id")

    def q_line_dedup(spark, sf):
        # CCNet corpus-level line dedup + reassembly: docs are laid out
        # as 8-token lines (pure expressions, mirrored in the oracle);
        # a line survives only at its global first occurrence
        from skewer_spark.functions.hof import bind
        from skewer_spark.operators.repeats import line_dedup
        docs = _read(spark, sf, "documents")
        lined = docs.select(
            "doc_id",
            bind(
                F.split(F.col("text"), " "),
                lambda tk: F.array_join(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.ceil(F.size(tk) / F.lit(8.0)).cast("int"),
                        ),
                        lambda i: F.array_join(
                            F.slice(tk, (i - 1) * 8 + 1, 8), " "
                        ),
                    ),
                    "\n",
                ),
            ).alias("text"),
        )
        return line_dedup(lined)

    def q_corpus_overlap(spark, sf):
        # pairwise corpus-vocabulary Jaccard estimates from mergeable
        # 16-wide MinHash sketches (per-lang corpora); every min is
        # md5-replicated bit-for-bit in the oracle
        from skewer_spark.operators.dedup import corpus_overlap
        docs = _read(spark, sf, "documents")
        return corpus_overlap(
            docs.select(F.col("lang").alias("corpus"), "text"),
            n_hashes=16,
        )

    def q_dp_counts(spark, sf):
        # epsilon-DP released per-type event counts: Laplace(1/eps)
        # noise drawn deterministically from md5(salt||key) so the
        # release is rerun-stable and engine-replicable
        from skewer_spark.operators.privacy import dp_counts
        ev = _read(spark, sf, "events")
        return dp_counts(ev, ["event_type"], epsilon=1.0)

    def q_retrieval_eval(spark, sf):
        # distributed retrieval-evaluation: recall@10 / MRR@10 /
        # nDCG@10 per query from a ranked run + graded qrels — one
        # narrow hash join, no text
        from pyspark.sql import Window
        from skewer_spark.operators.search import retrieval_metrics
        ev = _read(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("value"), F.asc("event_id")
        )
        res = (
            ev.select(
                "user_id", "event_id",
                F.row_number().over(w).alias("rank"),
            )
            .filter(F.col("rank") <= 10)
        )
        qrels = ev.filter(F.col("event_id") % 4 == 0).select(
            "user_id", "event_id",
            (F.lit(1) + F.col("event_id") % 3).alias("rel"),
        )
        return retrieval_metrics(
            res, qrels, k=10, query_col="user_id", doc_col="event_id"
        )

    def q_fd_check(spark, sf):
        # functional-dependency audit user_id -> event_type: groups
        # where the dependency fails, with witness values
        from skewer_spark.operators.validate import fd_violations
        ev = _read(spark, sf, "events")
        return fd_violations(ev, ["user_id"], "event_type")

    # ORDER MATTERS: the driver's correctness harness checks the FIRST
    # 50 entries only.  With 164/164 pairs driver-verified at least
    # once (r1-r5), the window now rotates onto the least-recently-
    # checked pairs each round (tools/rotate_window.py) so the maximum
    # signal age keeps dropping; the tail stays fully oracle-paired and
    # is re-verified each session by tools/check_oracles.py + pytest.
    return {
        # -- ROUND-6 WINDOW ROTATION (VERDICT r5 "Next round" #2,
        # second-pass freshness): every pair has been driver-checked at
        # least once (r1-r5 union = 164/164), so this rotation
        # back-fills the 50 LEAST-RECENTLY-checked pairs (r2/r3-era
        # signals, exactly as tools/rotate_window.py prints) — which
        # happen to include most of the r6-optimized paths
        # (encode/parse_protobuf, dedup family, setsim, semdedup, ivf,
        # kmeans, tree_depth, bradley_terry, incr_dedup, parse_*), so
        # the driver re-signs the changed code.  The 114 tail entries
        # stay fully oracle-paired and are re-verified each session by
        # tools/check_oracles.py.
        "q_encode_protobuf": q_encode_protobuf,
        "q_simhash": q_simhash,
        "q_dedup_apply": q_dedup_apply,
        "q_dedup_clusters": q_dedup_clusters,
        "q_ann_topk": q_ann_topk,
        "q_incoming_counts": q_incoming_counts,
        "q_parse_rsyslog": q_parse_rsyslog,
        "q_parse_gelf": q_parse_gelf,
        "q_parse_w3c": q_parse_w3c,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_parse_ltsv": q_parse_ltsv,
        "q_gelf_chunks": q_gelf_chunks,
        "q_parse_json": q_parse_json,
        "q_route_topic": q_route_topic,
        "q_window_rank": q_window_rank,
        "q_enrich_broadcast": q_enrich_broadcast,
        "q_profile": q_profile,
        "q_parse_rfc3164": q_parse_rfc3164,
        "q_parse_rfc5424": q_parse_rfc5424,
        "q_filter_fourway": q_filter_fourway,
        "q_link_records": q_link_records,
        "q_sink_counts": q_sink_counts,
        "q_windowed_agg": q_windowed_agg,
        "q_encode_rfc5424": q_encode_rfc5424,
        "q_dedup_clusters_star": q_dedup_clusters_star,
        "q_grok": q_grok,
        "q_log_templates": q_log_templates,
        "q_multiline": q_multiline,
        "q_pack_sequences": q_pack_sequences,
        "q_cdc_upsert": q_cdc_upsert,
        "q_rate_limit": q_rate_limit,
        "q_shard_shuffle": q_shard_shuffle,
        "q_parse_protobuf": q_parse_protobuf,
        "q_hybrid_search": q_hybrid_search,
        "q_sketch_distinct": q_sketch_distinct,
        "q_bpe_merges": q_bpe_merges,
        "q_minhash_lsh": q_minhash_lsh,
        "q_kmeans": q_kmeans,
        "q_setsim_exact": q_setsim_exact,
        "q_semdedup": q_semdedup,
        "q_ivf_topk": q_ivf_topk,
        "q_tree_depth": q_tree_depth,
        "q_classifier": q_classifier,
        "q_text_stats": q_text_stats,
        "q_dedup_substr": q_dedup_substr,
        "q_bradley_terry": q_bradley_terry,
        "q_incr_dedup": q_incr_dedup,
        "q_json_schema": q_json_schema,
        "q_pii_redact": q_pii_redact,
        "q_repetition": q_repetition,
        "q_bpe_apply": q_bpe_apply,
        "q_mixture_weights": q_mixture_weights,
        "q_audio_decode": q_audio_decode,
        "q_conv_stats": q_conv_stats,
        "q_encode_rfc3164": q_encode_rfc3164,
        "q_encode_gelf": q_encode_gelf,
        "q_frame_octet": q_frame_octet,
        "q_encode_file": q_encode_file,
        "q_split_assign": q_split_assign,
        "q_rand_proj": q_rand_proj,
        "q_normalize": q_normalize,
        "q_hard_neg": q_hard_neg,
        "q_rolling": q_rolling,
        "q_histogram": q_histogram,
        "q_winsorize": q_winsorize,
        "q_threads": q_threads,
        "q_join_size": q_join_size,
        "q_transitions": q_transitions,
        "q_pref_pairs": q_pref_pairs,
        "q_incr_agg": q_incr_agg,
        "q_intervals": q_intervals,
        "q_entropy": q_entropy,
        "q_topk_group": q_topk_group,
        "q_char_entropy": q_char_entropy,
        "q_seq_ngrams": q_seq_ngrams,
        "q_dp_counts": q_dp_counts,
        "q_tpch_q1": q_tpch_q1,
        "q_simhash_pairs": q_simhash_pairs,
        "q_embed_neardup": q_embed_neardup,
        "q_parse_influx": q_parse_influx,
        "q_priority_decode": q_priority_decode,
        "q_parse_acct": q_parse_acct,
        "q_dedup_exact": q_dedup_exact,
        "q_parse_errors": q_parse_errors,
        "q_sample_per_group": q_sample_per_group,
        "q_parse_collectd": q_parse_collectd,
        "q_lang_id": q_lang_id,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_encode_avro": q_encode_avro,
        "q_token_pctl": q_token_pctl,
        "q_quality_score": q_quality_score,
        "q_dedup_fingerprint": q_dedup_fingerprint,
        "q_ann_lsh": q_ann_lsh,
        "q_bpe_tokens": q_bpe_tokens,
        "q_winnow_fp": q_winnow_fp,
        "q_encode_json": q_encode_json,
        "q_encode_fulljson": q_encode_fulljson,
        "q_encode_fullavro": q_encode_fullavro,
        "q_encode_jsonavro": q_encode_jsonavro,
        "q_encode_fulljsonavro": q_encode_fulljsonavro,
        "q_apply_mixture": q_apply_mixture,
        "q_bigram_ppl": q_bigram_ppl,
        "q_bloom_decontam": q_bloom_decontam,
        "q_bm25_search": q_bm25_search,
        "q_boilerplate": q_boilerplate,
        "q_bucketed_join": q_bucketed_join,
        "q_budget_select": q_budget_select,
        "q_calibration": q_calibration,
        "q_cms_heavy": q_cms_heavy,
        "q_cohort": q_cohort,
        "q_compaction": q_compaction,
        "q_context_windows": q_context_windows,
        "q_corpus_overlap": q_corpus_overlap,
        "q_doc_chunks": q_doc_chunks,
        "q_dsir_weights": q_dsir_weights,
        "q_evolve": q_evolve,
        "q_fd_check": q_fd_check,
        "q_hot_ngrams": q_hot_ngrams,
        "q_html_text": q_html_text,
        "q_json_drift": q_json_drift,
        "q_kanon": q_kanon,
        "q_key_skew": q_key_skew,
        "q_label_agg": q_label_agg,
        "q_logreg": q_logreg,
        "q_orphan_files": q_orphan_files,
        "q_pmi": q_pmi,
        "q_psi": q_psi,
        "q_quantile_sketch": q_quantile_sketch,
        "q_radius_pairs": q_radius_pairs,
        "q_range_bounds": q_range_bounds,
        "q_range_join": q_range_join,
        "q_resample_locf": q_resample_locf,
        "q_retrieval_eval": q_retrieval_eval,
        "q_salted_agg": q_salted_agg,
        "q_scd2": q_scd2,
        "q_sft_spans": q_sft_spans,
        "q_snap_expiry": q_snap_expiry,
        "q_snapshot_diff": q_snapshot_diff,
        "q_soft_dedup": q_soft_dedup,
        "q_split_leakproof": q_split_leakproof,
        "q_sq8_topk": q_sq8_topk,
        "q_tfidf_terms": q_tfidf_terms,
        "q_time_rollup": q_time_rollup,
        "q_trend": q_trend,
        "q_triangles": q_triangles,
        "q_url_filter": q_url_filter,
        "q_validate": q_validate,
        "q_weighted_sample": q_weighted_sample,
        "q_zonemap": q_zonemap,
        "q_zorder": q_zorder,
        "q_decontam": q_decontam,
        "q_curation": q_curation,
        "q_image_decode": q_image_decode,
        "q_sft_pairs": q_sft_pairs,
        "q_asof_enrich": q_asof_enrich,
        "q_session_agg": q_session_agg,
        "q_domain_quantile": q_domain_quantile,
        "q_late_events": q_late_events,
        "q_funnel": q_funnel,
        "q_cidr_enrich": q_cidr_enrich,
        "q_line_dedup": q_line_dedup,
        "q_url_canon": q_url_canon,
        "q_rate_anomaly": q_rate_anomaly,
        "q_pagerank": q_pagerank,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from skewer_spark.functions.text import _ACCENT_DST, _ACCENT_SRC

    facname = FACNAME_VALUES

    sinks_union = f"""
    {EV_PRELUDE}
    , sunk AS (
      SELECT 'sink_alerts' AS sink, severity_name FROM routed
        WHERE filter_status = 'PASS' AND severity <= 3
      UNION ALL
      SELECT 'sink_tools', severity_name FROM routed
        WHERE filter_status = 'PASS' AND tool <> 'none'
      UNION ALL
      SELECT 'sink_firehose', severity_name FROM routed
        WHERE filter_status = 'PASS'
      UNION ALL
      SELECT 'sink_rejects', severity_name FROM routed
        WHERE filter_status IN ('REJECTED','ERROR')
    )
    SELECT sink, severity_name, count(*) AS n_messages
    FROM sunk GROUP BY sink, severity_name
    """

    encode_5424 = f"""
    {EV_PRELUDE}
    SELECT event_id,
      '<' || (CASE WHEN ok THEN pri ELSE 0 END) || '>1 ' ||
      strftime(coalesce(time_reported, ts), '%Y-%m-%dT%H:%M:%SZ') || ' ' ||
      (CASE WHEN hostname = '' THEN '-' ELSE hostname END) || ' ' ||
      (CASE WHEN appname = '' THEN '-' ELSE appname END) || ' ' ||
      (CASE WHEN procid = '' THEN '-' ELSE procid END) || ' ' ||
      (CASE WHEN p_msgid = '' THEN uid ELSE p_msgid END) || ' ' ||
      (CASE WHEN shape = 0 AND ok THEN '[meta k="v"]' ELSE '-' END) ||
      (CASE WHEN message = '' THEN '' ELSE ' ' || message END) AS encoded
    FROM routed
    """

    encode_3164 = f"""
    {EV_PRELUDE}
    SELECT event_id,
      '<' || (CASE WHEN ok THEN pri ELSE 0 END) || '>' ||
      strftime(coalesce(time_reported, ts), '%b') ||
      (CASE WHEN date_part('day', coalesce(time_reported, ts)) < 10
            THEN '  ' ELSE ' ' END) ||
      date_part('day', coalesce(time_reported, ts))::varchar || ' ' ||
      strftime(coalesce(time_reported, ts), '%H:%M:%S') || ' ' ||
      (CASE WHEN trim(hostname) = '' THEN 'localhost'
            ELSE trim(hostname) END) || ' ' ||
      appname ||
      (CASE WHEN length(trim(procid)) > 0
            THEN '[' || trim(procid) || ']' ELSE '' END) ||
      ': ' || message AS encoded
    FROM routed
    """


    frame_octet = """
    WITH m AS (
      SELECT event_id,
        '<' || (event_id % 192) || '>' || event_type || ' msg ' || event_id
          AS msg
      FROM events
    ), f AS (
      SELECT event_id,
        CASE WHEN event_id % 2 = 0
             -- strlen = BYTE length (DuckDB's octet_length analog for
             -- varchar), matching Spark's octet_length
             THEN strlen(msg)::varchar || ' ' || msg ELSE msg END
          AS framed
      FROM m
    )
    SELECT event_id, framed,
      CASE WHEN regexp_matches(framed, '^[0-9]+ <')
           THEN regexp_replace(framed, '^[0-9]+ ', '') ELSE framed END
        AS stripped
    FROM f
    """

    encode_file_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      strftime(coalesce(time_reported, ts), '%Y-%m-%dT%H:%M:%SZ') || ' ' ||
      (CASE WHEN hostname = '' THEN '-' ELSE hostname END) || ' ' ||
      (CASE WHEN appname = '' THEN '-' ELSE appname END) || ' ' ||
      message AS encoded
    FROM routed
    """

    # Java shortest-double rendering of an integral epoch-second double
    # in [1e9, 1e10): '1.7040672E9' — first digit, '.', remaining
    # digits trailing-zero-trimmed ('0' when all zeros), 'E9'
    gelf_ts = """
      substr(es, 1, 1) || '.' ||
      (CASE WHEN rtrim(substr(es, 2), '0') = '' THEN '0'
            ELSE rtrim(substr(es, 2), '0') END) || 'E9'
    """
    encode_gelf_sql = f"""
    {EV_PRELUDE}
    , gelf AS (
      SELECT *, floor(epoch(coalesce(time_reported, ts)))::bigint::varchar AS es
      FROM routed
    )
    SELECT event_id,
      '{{"version":"1.1","host":"' || hostname ||
      '","short_message":"' || message ||
      '","timestamp":' || {gelf_ts} ||
      ',"level":' || severity ||
      ',"_facility":"' ||
      (CASE WHEN facility = 0 THEN 'kern' WHEN facility = 1 THEN 'user'
        WHEN facility = 2 THEN 'mail' WHEN facility = 3 THEN 'daemon'
        WHEN facility = 4 THEN 'auth' WHEN facility = 5 THEN 'syslog'
        WHEN facility = 6 THEN 'lpr' WHEN facility = 7 THEN 'news'
        WHEN facility = 8 THEN 'uucp' WHEN facility = 9 THEN 'clock'
        WHEN facility = 10 THEN 'authpriv' WHEN facility = 11 THEN 'ftp'
        WHEN facility = 12 THEN 'ntp' WHEN facility = 13 THEN 'logaudit'
        WHEN facility = 14 THEN 'logalert' WHEN facility = 15 THEN 'cron'
        WHEN facility = 16 THEN 'local0' WHEN facility = 17 THEN 'local1'
        WHEN facility = 18 THEN 'local2' WHEN facility = 19 THEN 'local3'
        WHEN facility = 20 THEN 'local4' WHEN facility = 21 THEN 'local5'
        WHEN facility = 22 THEN 'local6' WHEN facility = 23 THEN 'local7'
        ELSE 'user' END) || '"' ||
      (CASE WHEN appname = '' THEN ''
            ELSE ',"_appname":"' || appname || '"' END) ||
      (CASE WHEN procid = '' THEN ''
            ELSE ',"_procid":"' || procid || '"' END) ||
      ',"_msgid":"' ||
      (CASE WHEN p_msgid = '' THEN uid ELSE p_msgid END) || '"' ||
      (CASE WHEN shape = 0 AND ok
            THEN ',"_properties":{{"meta":{{"k":"v"}}}}' ELSE '' END) ||
      '}}' AS encoded
    FROM gelf
    """

    # the Regular JSON body over the oracle's `routed` CTE — shared by
    # the json and fulljson encoder oracles (plain string: { unescaped)
    reg_json_expr = """
      '{"facility":"' ||
      (CASE WHEN facility = 0 THEN 'kern' WHEN facility = 1 THEN 'user'
        WHEN facility = 2 THEN 'mail' WHEN facility = 3 THEN 'daemon'
        WHEN facility = 4 THEN 'auth' WHEN facility = 5 THEN 'syslog'
        WHEN facility = 6 THEN 'lpr' WHEN facility = 7 THEN 'news'
        WHEN facility = 8 THEN 'uucp' WHEN facility = 9 THEN 'clock'
        WHEN facility = 10 THEN 'authpriv' WHEN facility = 11 THEN 'ftp'
        WHEN facility = 12 THEN 'ntp' WHEN facility = 13 THEN 'logaudit'
        WHEN facility = 14 THEN 'logalert' WHEN facility = 15 THEN 'cron'
        WHEN facility = 16 THEN 'local0' WHEN facility = 17 THEN 'local1'
        WHEN facility = 18 THEN 'local2' WHEN facility = 19 THEN 'local3'
        WHEN facility = 20 THEN 'local4' WHEN facility = 21 THEN 'local5'
        WHEN facility = 22 THEN 'local6' WHEN facility = 23 THEN 'local7'
        ELSE 'user' END) ||
      '","severity":"' || severity_name ||
      '","timereported":"' ||
        strftime(coalesce(time_reported, ts), '%Y-%m-%dT%H:%M:%SZ') ||
      '","timegenerated":"' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || '"' ||
      (CASE WHEN hostname = '' THEN '' ELSE ',"hostname":"' || hostname || '"' END) ||
      (CASE WHEN appname = '' THEN '' ELSE ',"appname":"' || appname || '"' END) ||
      (CASE WHEN procid = '' THEN '' ELSE ',"procid":"' || procid || '"' END) ||
      ',"msgid":"' || (CASE WHEN p_msgid = '' THEN uid ELSE p_msgid END) || '"' ||
      (CASE WHEN message = '' THEN '' ELSE ',"message":"' || message || '"' END) ||
      (CASE WHEN shape = 0 AND ok
        THEN ',"properties":{"meta":{"k":"v"}}' ELSE '' END) ||
      '}'
    """

    encode_json_sql = f"""
    {EV_PRELUDE}
    SELECT event_id, {reg_json_expr} AS encoded
    FROM routed
    """

    encode_fulljson_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      '{{"client_addr":"10.0.0.' || (user_id % 200)::varchar || ':' ||
        (40000 + event_id % 1000)::varchar ||
      '","source_type":"tcp","source_port":1514,"uid":"' || uid ||
      '","fields":' || {reg_json_expr} || '}}' AS encoded
    FROM routed
    """

    # ---- avro / protobuf wire oracles (hex-level) ----
    # DuckDB builds the same bytes as skewer_spark/sinks/wire.py from the
    # public wire specs: varints from first principles, strings as
    # hex(utf8), the fixture's constant properties maps as precomputed
    # hex (verified against an independent Python encoder in
    # tests/test_wire_codecs.py).

    def vh(n: str) -> str:
        """Unsigned LEB128 varint hex for values < 2^21 (lengths)."""
        n = f"({n})"
        return (
            f"(CASE WHEN {n} < 128 THEN printf('%02x', {n}) "
            f"WHEN {n} < 16384 THEN printf('%02x%02x', ({n} % 128) + 128, {n} // 128) "
            f"ELSE printf('%02x%02x%02x', ({n} % 128) + 128, "
            f"(({n} // 128) % 128) + 128, {n} // 16384) END)"
        )

    def vh_big(n: str) -> str:
        """Unsigned LEB128 varint hex for any non-negative BIGINT
        (nanosecond timestamps take 9 bytes)."""
        n = f"({n})"
        branches = []
        for nb in range(1, 9):
            args = ", ".join(
                f"(({n} >> {7 * i}) & 127)" + (" + 128" if i < nb - 1 else "")
                for i in range(nb)
            )
            branches.append(
                f"WHEN {n} < {1 << (7 * nb)} THEN printf('{'%02x' * nb}', {args})"
            )
        args9 = ", ".join(
            f"(({n} >> {7 * i}) & 127)" + (" + 128" if i < 8 else "")
            for i in range(9)
        )
        return (
            "(CASE " + " ".join(branches)
            + f" ELSE printf('{'%02x' * 9}', {args9}) END)"
        )

    def avh(e: str) -> str:
        """Avro string: zig-zag varint byte length + utf8 hex."""
        return (
            f"({vh(f'2*octet_length(encode({e}))')} || lower(hex(encode({e}))))"
        )

    def pbs(tag: int, e: str) -> str:
        """proto3 string field, omitted when empty."""
        return (
            f"(CASE WHEN octet_length(encode({e})) > 0 THEN '{tag:02x}' || "
            f"{vh(f'octet_length(encode({e}))')} || lower(hex(encode({e}))) "
            f"ELSE '' END)"
        )

    def pbv(tag: int, n: str) -> str:
        """proto3 varint field, omitted when zero."""
        return f"(CASE WHEN ({n}) > 0 THEN '{tag:02x}' || {vh(n)} ELSE '' END)"

    from skewer_spark.schema import FACILITIES
    fac_case = (
        "(CASE facility "
        + " ".join(f"WHEN {k} THEN '{v}'" for k, v in sorted(FACILITIES.items()))
        + " ELSE 'user' END)"
    )
    msgid_eff = "(CASE WHEN p_msgid = '' THEN uid ELSE p_msgid END)"

    def nano(e: str) -> str:
        """RFC3339Nano: trailing-zero-trimmed microsecond fraction."""
        return (
            f"(strftime({e}, '%Y-%m-%dT%H:%M:%S') || "
            f"(CASE WHEN rtrim(strftime({e}, '%f'), '0') = '' THEN '' "
            f"ELSE '.' || rtrim(strftime({e}, '%f'), '0') END) || 'Z')"
        )

    # enrich backfills time_reported with the row ts (now→row-ts
    # contract), so the Spark frame never carries a null here
    tr_nano = nano("coalesce(time_reported, ts)")
    tg_nano = nano("ts")
    sd_expr = "(CASE WHEN shape = 0 AND ok THEN '[meta k=\"v\"]' ELSE '' END)"
    version_expr = "(CASE WHEN shape = 0 AND ok THEN 1 ELSE 0 END)"
    # avro map<string,map<string,string>> of {"meta":{"k":"v"}} / {}
    avro_props = (
        "(CASE WHEN shape = 0 AND ok THEN '02086d65746102026b02760000' "
        "ELSE '00' END)"
    )
    # protobuf Properties field 13 for the same two map values
    pb_props = (
        "(CASE WHEN shape = 0 AND ok THEN "
        "'6a120a100a046d65746112080a060a016b120176' ELSE '6a00' END)"
    )

    avro_body = " || ".join([
        avh(fac_case), avh("severity_name"), avh(tr_nano), avh(tg_nano),
        avh("hostname"), avh("appname"), avh("procid"), avh(msgid_eff),
        avh("message"), avro_props,
    ])
    encode_avro_sql = f"""
    {EV_PRELUDE}
    SELECT event_id, {avro_body} AS encoded_hex FROM routed
    """

    client_addr = (
        "('10.0.0.' || (user_id % 200)::varchar || ':' || "
        "(40000 + event_id % 1000)::varchar)"
    )
    encode_fullavro_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      {avh(client_addr)} || {avh("'tcp'")} || '00' || 'd417' ||
      {avh('uid')} || {avro_body} AS encoded_hex
    FROM routed
    """

    encode_jsonavro_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      '{{"Facility":"' || {fac_case} ||
      '","Severity":"' || severity_name ||
      '","TimeReported":"' || {tr_nano} ||
      '","TimeGenerated":"' || {tg_nano} ||
      '","Hostname":"' || hostname ||
      '","Appname":"' || appname ||
      '","Procid":"' || procid ||
      '","Msgid":"' || {msgid_eff} ||
      '","Message":"' || message ||
      '","Properties":' ||
      (CASE WHEN shape = 0 AND ok
        THEN '{{"meta":{{"k":"v"}}}}' ELSE '{{}}' END) ||
      '}}' AS encoded
    FROM routed
    """

    encode_fulljsonavro_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      '{{"ClientAddr":"' || {client_addr} ||
      '","SourceType":"tcp","SourcePath":"","SourcePort":1514,"Uid":"' ||
      uid ||
      '","Fields":{{"Facility":"' || {fac_case} ||
      '","Severity":"' || severity_name ||
      '","TimeReported":"' || {tr_nano} ||
      '","TimeGenerated":"' || {tg_nano} ||
      '","Hostname":"' || hostname ||
      '","Appname":"' || appname ||
      '","Procid":"' || procid ||
      '","Msgid":"' || {msgid_eff} ||
      '","Message":"' || message ||
      '","Properties":' ||
      (CASE WHEN shape = 0 AND ok
        THEN '{{"meta":{{"k":"v"}}}}' ELSE '{{}}' END) ||
      '}}}}' AS encoded
    FROM routed
    """

    pb_body = " || ".join([
        pbv(0x08, "(CASE WHEN ok THEN pri ELSE 0 END)"),
        pbv(0x10, "(CASE WHEN ok THEN fac ELSE 0 END)"),
        pbv(0x18, "(CASE WHEN ok THEN sev ELSE 0 END)"),
        pbv(0x20, version_expr),
        "'28'", vh_big("epoch_ns(coalesce(time_reported, ts))"),
        "'30'", vh_big("epoch_ns(ts)"),
        pbs(0x3A, "hostname"), pbs(0x42, "appname"), pbs(0x4A, "procid"),
        pbs(0x52, msgid_eff), pbs(0x5A, sd_expr), pbs(0x62, "message"),
        pb_props,
    ])
    encode_protobuf_sql = f"""
    {EV_PRELUDE}
    SELECT event_id, {pb_body} AS encoded_hex FROM routed
    """

    parse_protobuf_sql = f"""
    {EV_PRELUDE}
    SELECT event_id,
      (CASE WHEN ok THEN pri ELSE 0 END)::BIGINT AS priority,
      (CASE WHEN ok THEN fac ELSE 0 END)::BIGINT AS facility,
      (CASE WHEN ok THEN sev ELSE 0 END)::BIGINT AS severity,
      {version_expr}::BIGINT AS version,
      epoch_ns(coalesce(time_reported, ts))::BIGINT AS time_reported_num,
      epoch_ns(ts)::BIGINT AS time_generated_num,
      hostname, appname, procid,
      {msgid_eff} AS msgid,
      {sd_expr} AS structured,
      message,
      (CASE WHEN shape = 0 AND ok THEN '{{"meta":{{"k":"v"}}}}'
            ELSE '{{}}' END) AS properties_json
    FROM routed
    """

    parse_collectd_sql = """
    WITH ev AS (
      SELECT event_id, user_id,
        'cdh' || lpad((user_id % 30)::varchar, 2, '0') AS host,
        epoch(date_trunc('second', ts))::BIGINT AS es,
        date_trunc('second', ts) AS tss
      FROM events
    )
    SELECT event_id,
      host AS hostname,
      'ifx' AS procid,
      '{"collectd":{"plugin_instance":"eth0","type":"if_octets"},"derive":{"rx":"'
        || event_id || '","tx":"' || user_id || '"}}' AS properties_json,
      '{"values":[' || event_id || ',' || user_id ||
        '],"dstypes":["derive","derive"],"dsnames":["rx","tx"],"time":' ||
        es || '.0,"interval":0.0,"host":"' || host ||
        '","plugin":"ifx","plugin_instance":"eth0","type":"if_octets","type_instance":""}'
        AS message,
      strftime(tss, '%Y-%m-%dT%H:%M:%SZ') AS tr_str
    FROM ev
    """

    # ---- hyperplane-LSH oracles: identical integer LCG planes ----
    from skewer_spark.operators.similarity import lcg_plane

    def plane_sql(p: int, dim: int = 64) -> str:
        return "[" + ",".join(str(c) for c in lcg_plane(p, dim)) + "]::DOUBLE[]"

    def bucket_sql(plane_offset: int, n_planes: int) -> str:
        bits = [
            f"(CASE WHEN list_dot_product(v, {plane_sql(plane_offset + r)}) >= 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(n_planes)
        ]
        return " + ".join(bits)

    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, {bucket_sql(b * 8, 8)} AS bucket FROM e"
        for b in range(4)
    )
    neardup_sql = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
      {band_rows}
    ), capped AS (
      SELECT vec_id, band_id, bucket FROM (
        SELECT *, row_number() OVER (PARTITION BY band_id, bucket
                                     ORDER BY vec_id) AS rn FROM b
      ) WHERE rn <= 200
    ), pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM capped a JOIN capped c USING (band_id, bucket)
      WHERE a.vec_id < c.vec_id
    ), scored AS (
      SELECT id_a, id_b,
        round(list_dot_product(ea.v, eb.v) /
              (sqrt(list_dot_product(ea.v, ea.v)) *
               sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
      FROM pairs
      JOIN e ea ON ea.vec_id = pairs.id_a
      JOIN e eb ON eb.vec_id = pairs.id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3
    """

    ann_lsh_sql = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v, {bucket_sql(0, 8)} AS bucket FROM e
    ), q AS (
      SELECT bucket AS qb, v AS qv FROM b WHERE vec_id = 0
    ), cand AS (
      SELECT vec_id, v FROM b, q WHERE bit_count(xor(bucket, qb)) <= 2
    )
    SELECT vec_id,
      round(list_dot_product(cand.v, q.qv) /
            (sqrt(list_dot_product(cand.v, cand.v)) *
             sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM cand, q
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """

    # ---- SimHash oracle: same md5 token bits, same banding ----
    sim_sums = ", ".join(
        f"sum((({src} >> {b}) & 1) * 2 - 1) AS {name}{b}"
        for src, name in (("thi", "h"), ("tlo", "l"))
        for b in range(32)
    )

    def sim_reassemble(prefix: str) -> str:
        return " + ".join(
            f"(CASE WHEN {prefix}{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END)"
            for b in range(32)
        )

    simhash_prelude = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), halves AS (
      SELECT doc_id,
        ('0x' || substr(md5(tok), 1, 8))::BIGINT AS thi,
        ('0x' || substr(md5(tok), 9, 8))::BIGINT AS tlo
      FROM toks
    ), sums AS (
      SELECT doc_id, {sim_sums} FROM halves GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {sim_reassemble('h')} AS sig_hi,
             {sim_reassemble('l')} AS sig_lo
      FROM sums
    )
    """

    simhash_sql = simhash_prelude + "SELECT doc_id, sig_hi, sig_lo FROM sigs"

    simhash_pairs_sql = simhash_prelude + """
    , buckets AS (
      SELECT doc_id, sig_hi, sig_lo, 0 AS band_id,
             (sig_lo & 65535) AS band_key FROM sigs
      UNION ALL SELECT doc_id, sig_hi, sig_lo, 1,
             ((sig_lo >> 16) & 65535) FROM sigs
      UNION ALL SELECT doc_id, sig_hi, sig_lo, 2,
             (sig_hi & 65535) FROM sigs
      UNION ALL SELECT doc_id, sig_hi, sig_lo, 3,
             ((sig_hi >> 16) & 65535) FROM sigs
    ), capped AS (
      -- bucket_cap=64 mirror (same one-sided cap as q_minhash_lsh):
      -- survivor side = each bucket's 64 lowest doc_ids
      SELECT doc_id, sig_hi, sig_lo, band_id, band_key FROM buckets
      QUALIFY row_number() OVER (
        PARTITION BY band_id, band_key ORDER BY doc_id) <= 64
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      (bit_count(xor(a.sig_hi, b.sig_hi))
       + bit_count(xor(a.sig_lo, b.sig_lo))) AS hamming
    FROM capped a JOIN buckets b USING (band_id, band_key)
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.sig_hi, b.sig_hi))
          + bit_count(xor(a.sig_lo, b.sig_lo)) <= 3
    """

    # 4 independent 32-bit minhashes per md5 digest (one-permutation
    # slicing) — mirrors dedup.minhash_signatures
    mh_slices = [
        f"min(substr(d{i // 4}, {8 * (i % 4) + 1}, 8)) AS mh_{i}" for i in range(8)
    ]
    minhash_sql = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ), digs AS (
      SELECT doc_id, md5('g0|' || tok) AS d0, md5('g1|' || tok) AS d1
      FROM toks
    ), sigs AS (
      SELECT doc_id, {', '.join(mh_slices)} FROM digs GROUP BY doc_id
    ), buckets AS (
      SELECT doc_id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(mh_2 || '|' || mh_3) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(mh_4 || '|' || mh_5) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(mh_6 || '|' || mh_7) FROM sigs
    ), capped AS (
      -- bucket_cap=64 mirror: each bucket's 64 lowest doc_ids form the
      -- survivor side; the OTHER join side stays uncapped so every
      -- member still pairs with the survivors (|bucket|*cap output)
      SELECT doc_id, band_id, band_key FROM buckets
      QUALIFY row_number() OVER (
        PARTITION BY band_id, band_key ORDER BY doc_id) <= 64
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN buckets b USING (band_id, band_key)
    WHERE a.doc_id < b.doc_id
    """

    ngram_jaccard_sql = f"""
    WITH tl AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, md5(s) AS tok FROM (
        SELECT doc_id,
          unnest(list_transform(range(1, len(l) - 1),
                                i -> array_to_string(l[i:i+2], ' '))) AS s
        FROM tl WHERE len(l) >= 3
      )
    ), digs AS (
      SELECT doc_id, md5('g0|' || tok) AS d0, md5('g1|' || tok) AS d1 FROM sh
    ), sigs AS (
      SELECT doc_id, {', '.join(mh_slices)} FROM digs GROUP BY doc_id
    ), buckets AS (
      SELECT doc_id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(mh_2 || '|' || mh_3) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(mh_4 || '|' || mh_5) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(mh_6 || '|' || mh_7) FROM sigs
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b USING (band_id, band_key)
      WHERE a.doc_id < b.doc_id
    ), shp AS (
      -- verify runs on 8-char md5 prefixes (32-bit), mirroring the
      -- Spark side's narrow arrays: same prefix, same collisions
      SELECT DISTINCT doc_id, substr(tok, 1, 8) AS tok8 FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM shp GROUP BY doc_id
    ), inter AS (
      SELECT id_a, id_b, count(*) AS n_inter
      FROM cands
      JOIN shp sa ON sa.doc_id = cands.id_a
      JOIN shp sb ON sb.doc_id = cands.id_b AND sb.tok8 = sa.tok8
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
      round(n_inter / (za.n_sh + zb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE round(n_inter / (za.n_sh + zb.n_sh - n_inter), 6) >= 0.3
    """

    dedup_clusters_sql = f"""
            -- connected components over the near-dup pair graph via a
            -- recursive reachability CTE (min reachable id = cluster)
            WITH RECURSIVE pairs AS (
              {ngram_jaccard_sql}
            ), und AS (
              SELECT id_a AS s, id_b AS d FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ), reach(s, d) AS (
              SELECT s, d FROM und
              UNION
              SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s
              WHERE u.d <> r.s
            ), comp AS (
              SELECT s, min(d) AS min_reach FROM reach GROUP BY s
            )
            SELECT doc.doc_id,
                   least(doc.doc_id, coalesce(c.min_reach, doc.doc_id))::BIGINT
                     AS cluster_id
            FROM documents doc LEFT JOIN comp c ON c.s = doc.doc_id
    """

    # damped PageRank, 3 iterations unrolled (no recursive aggregates
    # in a recursive CTE): each round mirrors operators/graph.pagerank
    # operand-for-operand — contrib sum, dangling mass, then
    # (1.0 - 0.85)/N + 0.85 * (s_in + dm/N) — so doubles agree up to
    # summation order; only the final rank rounds to 6 dp.
    _pr_rounds = []
    _prev = "r0"
    for _i in (1, 2, 3):
        _pr_rounds.append(f"""
            c{_i} AS (
              SELECT e.t AS id, sum({_prev}.rank / od.od) AS s_in
              FROM e JOIN od USING (s) JOIN {_prev} ON e.s = {_prev}.id
              GROUP BY e.t
            ), d{_i} AS (
              SELECT coalesce(sum(r.rank), 0.0) AS dm
              FROM {_prev} r LEFT JOIN od ON r.id = od.s
              WHERE od.s IS NULL
            ), r{_i} AS (
              SELECT nodes.id,
                     (1.0 - 0.85) / nn.n
                       + 0.85 * (coalesce(c.s_in, 0.0) + d.dm / nn.n)
                       AS rank
              FROM nodes CROSS JOIN nn CROSS JOIN d{_i} d
              LEFT JOIN c{_i} c ON nodes.id = c.id
            )""")
        _prev = f"r{_i}"
    # BPE training unrolled: each step = adjacent-pair count + argmax
    # (count DESC, lhs, rhs) + literal replace-merge — the exact loop
    # bpe_train runs, expressed as chained CTEs (the pagerank pattern)
    _bpe_steps = []
    for _s in range(1, 5):
        _bpe_steps.append(f"""
            p{_s} AS (
              SELECT syms[g] AS lhs, syms[g+1] AS rhs,
                     SUM(cnt)::BIGINT AS pc
              FROM (SELECT string_split(trim(sym), '  ') AS syms, cnt
                    FROM w{_s - 1}) t,
                   UNNEST(generate_series(1, len(syms) - 1)) AS u(g)
              GROUP BY 1, 2
            ), b{_s} AS (
              SELECT {_s}::INT AS step, lhs, rhs, pc FROM p{_s}
              ORDER BY pc DESC, lhs, rhs LIMIT 1
            ), w{_s} AS (
              SELECT replace(sym, ' '||lhs||'  '||rhs||' ',
                             ' '||lhs||rhs||' ') AS sym, cnt
              FROM w{_s - 1} CROSS JOIN b{_s}
            )""")
    _bpe_heads = " UNION ALL ".join(
        f"SELECT step, lhs, rhs, pc AS pair_count FROM b{_s}"
        for _s in range(1, 5)
    )
    bpe_merges_sql = f"""
            WITH w0 AS (
              -- double-space symbol separators: the ' l  r ' merge
              -- pattern leaves one boundary space for the adjacent
              -- match, giving canonical greedy-left BPE on runs
              SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g')
                       AS sym,
                     COUNT(*)::BIGINT AS cnt
              FROM (SELECT unnest(string_split_regex(text, '\\s+'))
                       AS word FROM documents)
              WHERE word <> '' GROUP BY word
            ),{",".join(_bpe_steps)}
            {_bpe_heads}
    """

    pagerank_sql = f"""
            WITH e0 AS (
              SELECT user_id::VARCHAR AS s,
                     'u' || (event_id % 97)::VARCHAR AS t
              FROM events
              UNION ALL
              SELECT 'u' || (event_id % 97)::VARCHAR AS s,
                     user_id::VARCHAR AS t
              FROM events WHERE event_id % 3 = 0
            ), e AS (
              SELECT DISTINCT s, t FROM e0
              WHERE s IS NOT NULL AND t IS NOT NULL
            ), nodes AS (
              SELECT DISTINCT id
              FROM (SELECT s AS id FROM e UNION ALL SELECT t FROM e)
            ), nn AS (
              SELECT count(*)::BIGINT AS n FROM nodes
            ), od AS (
              SELECT s, count(*)::BIGINT AS od FROM e GROUP BY s
            ), r0 AS (
              SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
            ),{",".join(_pr_rounds)}
            SELECT id AS node, round(rank, 6) AS rank FROM {_prev}
    """

    return {
        "q_window_rank": """
            SELECT user_id, event_id, turn_rank FROM (
              SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS turn_rank
              FROM events
            ) WHERE turn_rank <= 3
        """,
        "q_enrich_broadcast": """
            SELECT r_name, n_name, count(*) AS n_customers,
                   sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q_priority_decode": f"""
            WITH d AS (
              SELECT ((event_id % 192) // 8)::int AS facility,
                     ((event_id % 192) % 8)::int AS severity
              FROM events
            )
            SELECT facility, coalesce(facility_name, 'user') AS facility_name,
                   severity, {SEVNAME_SQL} AS severity_name,
                   count(*) AS n
            FROM d LEFT JOIN {facname} ON facility = facility_code
            GROUP BY ALL
        """,
        "q_parse_rfc3164": f"""
            {EV_PRELUDE}
            SELECT event_id, hostname, appname, procid, message,
                   severity::int AS severity,
                   strftime(time_reported, '%Y-%m-%d %H:%M:%S') AS tr_str,
                   parser_name
            FROM parsed WHERE shape = 1
        """,
        "q_parse_rfc5424": f"""
            {EV_PRELUDE}
            SELECT event_id, hostname, appname, procid, p_msgid AS msgid,
                   message, severity::int AS severity,
                   strftime(time_reported, '%Y-%m-%d %H:%M:%S') AS tr_str,
                   'v' AS meta_k
            FROM parsed WHERE shape = 0 AND ok
        """,
        "q_parse_errors": f"""
            {EV_PRELUDE}
            SELECT parser_name, count(*) AS n_errors
            FROM parsed WHERE NOT ok GROUP BY parser_name
        """,
        "q_filter_fourway": f"""
            {EV_PRELUDE}
            SELECT filter_status, event_type AS role, count(*) AS n_messages
            FROM routed GROUP BY filter_status, event_type
        """,
        "q_route_topic": f"""
            {EV_PRELUDE}
            SELECT topic, count(*) AS n_messages FROM routed GROUP BY topic
        """,
        "q_sink_counts": sinks_union,
        "q_windowed_agg": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   event_type, count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q_incoming_counts": f"""
            {EV_PRELUDE}
            SELECT event_type AS role, count(*) AS n_messages,
                   count(DISTINCT user_id) AS n_convs
            FROM routed GROUP BY event_type
        """,
        "q_encode_rfc5424": encode_5424,
        "q_encode_rfc3164": encode_3164,
        "q_encode_gelf": encode_gelf_sql,
        "q_frame_octet": frame_octet,
        "q_encode_file": encode_file_sql,
        "q_encode_json": encode_json_sql,
        "q_encode_fulljson": encode_fulljson_sql,
        "q_encode_avro": encode_avro_sql,
        "q_encode_fullavro": encode_fullavro_sql,
        "q_encode_jsonavro": encode_jsonavro_sql,
        "q_encode_fulljsonavro": encode_fulljsonavro_sql,
        "q_encode_protobuf": encode_protobuf_sql,
        "q_parse_protobuf": parse_protobuf_sql,
        "q_parse_collectd": parse_collectd_sql,
        "q_parse_acct": """
            -- every decoded field recomputed arithmetically from the
            -- event columns the record was synthesized from
            SELECT event_id,
              'proc' || lpad((event_id % 50)::varchar, 2, '0') AS comm,
              (user_id % 1000)::BIGINT AS uid,
              (user_id % 100)::BIGINT AS gid,
              (event_id % 32768)::BIGINT AS pid,
              ((event_id * 3) % 32768)::BIGINT AS ppid,
              (event_id % 100)::BIGINT AS tty,
              (event_id % 256)::BIGINT AS exitcode,
              strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                AS btime_str,
              ((event_id % 8192) * 10 * 1000000)::BIGINT AS utime_ns,
              ((event_id % 8192) * 80 * 1000000)::BIGINT AS stime_ns,
              1000000000::BIGINT AS etime_ns,
              (event_id % 4096)::BIGINT AS mem,
              0::BIGINT AS io,
              concat_ws(',',
                CASE WHEN (event_id % 32) & 4 > 0 THEN 'compatmode' END,
                CASE WHEN (event_id % 32) & 8 > 0 THEN 'dumpedcore' END,
                CASE WHEN (event_id % 32) & 1 > 0 THEN 'forked' END,
                CASE WHEN (event_id % 32) & 2 > 0 THEN 'superuser' END,
                CASE WHEN (event_id % 32) & 16 > 0 THEN 'killedbysignal' END
              ) AS flags
            FROM events
        """,
        "q_gelf_chunks": """
            SELECT event_id,
                   (8 + event_id % 8)::int AS priority,
                   1 AS facility,
                   (event_id % 8)::int AS severity,
                   'ch' || lpad((user_id % 25)::varchar, 2, '0') AS hostname,
                   'chunked msg ' || event_id::varchar AS message,
                   strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                     AS tr_str
            FROM events
        """,
        "q_parse_rsyslog": """
            SELECT event_id,
                   (event_id % 192)::int AS priority,
                   ((event_id % 192) // 8)::int AS facility,
                   ((event_id % 192) % 8)::int AS severity,
                   CASE WHEN event_id % 5 = 0 THEN ''
                        ELSE 'rh' || lpad((user_id % 25)::varchar, 2, '0')
                   END AS hostname,
                   'rapp' || (event_id % 6)::varchar AS appname,
                   (event_id % 500)::varchar AS procid,
                   '' AS msgid,
                   'rsys msg ' || event_id::varchar AS message,
                   event_type AS k1,
                   strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                     AS tr_str
            FROM events
        """,
        "q_parse_gelf": """
            WITH g AS (
              SELECT event_id, user_id, event_type, ts,
                CASE (event_id % 4)::int WHEN 0 THEN 0 WHEN 1 THEN 3
                     WHEN 2 THEN 10 ELSE 1 END AS facility,
                (event_id % 8)::int AS severity
              FROM events
            )
            SELECT event_id,
                   (facility * 8 + severity)::int AS priority,
                   facility::int AS facility, severity::int AS severity,
                   'gh' || lpad((user_id % 35)::varchar, 2, '0') AS hostname,
                   'gelf msg ' || event_id::varchar AS message,
                   strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                     AS tr_str
            FROM g
        """,
        "q_parse_w3c": """
            SELECT event_id,
                   '192.168.' || (user_id % 50)::varchar || '.' ||
                     (event_id % 200)::varchar AS c_ip,
                   ['GET','POST','PUT'][(event_id % 3)::int + 1] AS method,
                   (200 + event_id % 5)::varchar AS status,
                   true AS parse_ok
            FROM events
        """,
        "q_parse_ltsv": """
            WITH l AS (
              SELECT event_id, user_id, ts,
                     (event_id % 192)::int AS pri,
                     'lh' || lpad((user_id % 30)::varchar, 2, '0') AS host,
                     'lapp' || (event_id % 7)::varchar AS ident,
                     (event_id % 900)::varchar AS pid,
                     'ltsv msg ' || event_id::varchar || ' k:v' AS msg,
                     (200 + event_id % 5)::varchar AS status,
                     strftime(date_trunc('second', ts),
                              '%Y-%m-%dT%H:%M:%SZ') AS time_s
              FROM events
            )
            SELECT event_id,
                   pri AS priority,
                   (pri // 8)::int AS facility,
                   (pri % 8)::int AS severity,
                   host AS hostname, ident AS appname, pid AS procid,
                   msg AS message, status,
                   '{"ltsv":{"host":"' || host ||
                   '","ident":"' || ident ||
                   '","msg":"' || msg ||
                   '","pid":"' || pid ||
                   '","pri":"' || pri::varchar ||
                   '","status":"' || status ||
                   '","time":"' || time_s || '"}}' AS properties_json,
                   true AS parse_ok,
                   strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                     AS tr_str
            FROM l
        """,
        # INDEPENDENT formulation: the oracle never runs the regex — it
        # recomputes what the fixture embedded in each line, so the
        # compiled grok pattern must recover those values exactly
        "q_grok": """
            SELECT event_id,
                   event_id % 17 <> 0 AS grok_match,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        ELSE '10.' || (user_id % 200) || '.3.'
                             || (event_id % 250) END AS clientip,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        ELSE 'u' || user_id END AS auth,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        ELSE strftime(ts, '%d/%b/%Y:%H:%M:%S')
                             || ' +0000' END AS http_ts,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        ELSE upper(event_type) END AS verb,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        ELSE '/e/' || event_id END AS request,
                   CASE WHEN event_id % 17 = 0 OR event_id % 2 <> 0
                        THEN '' ELSE '1.1' END AS httpversion,
                   CASE WHEN event_id % 17 = 0 THEN ''
                        WHEN event_type = 'error' THEN '500'
                        ELSE '200' END AS response,
                   CASE WHEN event_id % 17 = 0 OR event_id % 7 = 0
                        THEN ''
                        ELSE floor(value * 100)::BIGINT::VARCHAR
                        END AS bytes
            FROM events
        """,
        # full replay of the mining algorithm: mask → group by
        # (n_tokens, first token) → per-position agreement → template
        "q_log_templates": """
            WITH lines AS (
              SELECT 'app' || (user_id % 3) || ' ' ||
                     CASE event_type
                       WHEN 'error' THEN 'failed with code '
                                         || (event_id % 5)
                       WHEN 'click' THEN 'clicked button '
                                         || (event_id % 7)
                       WHEN 'view' THEN 'viewed page /p/' || event_id
                       WHEN 'signup' THEN 'signup from 10.2.'
                                          || (user_id % 9) || '.4'
                       ELSE 'purchase amount '
                            || floor(value * 100)::BIGINT
                     END AS text
              FROM events
            ), masked AS (
              SELECT regexp_replace(regexp_replace(regexp_replace(text,
                       '(?:\\d{1,3}\\.){3}\\d{1,3}', '<*>', 'g'),
                       '\\b0[xX][0-9a-fA-F]+\\b', '<*>', 'g'),
                       '\\b\\d+\\b', '<*>', 'g') AS m
              FROM lines
            ), toks AS (
              SELECT list_filter(string_split_regex(m, '\\s+'),
                                 x -> x <> '') AS t
              FROM masked
            ), g AS (
              SELECT t, len(t) AS n, t[1] AS first
              FROM toks WHERE len(t) > 0
            ), ex AS (
              SELECT n, first, t,
                     unnest(range(1, n + 1)) AS pos
              FROM g
            ), tok AS (
              SELECT n, first, pos, t[pos] AS tok FROM ex
            ), agree AS (
              SELECT n, first, pos, count(DISTINCT tok) AS nd,
                     min(tok) AS mt
              FROM tok GROUP BY 1, 2, 3
            ), tmpl AS (
              SELECT n, first,
                     string_agg(CASE WHEN nd = 1 THEN mt
                                     ELSE '<*>' END, ' ' ORDER BY pos)
                       AS template
              FROM agree GROUP BY n, first
            ), cnt AS (
              SELECT n, first, count(*) AS n_lines FROM g GROUP BY 1, 2
            )
            SELECT md5(template) AS template_id, template,
                   n::INT AS n_tokens, n_lines
            FROM tmpl JOIN cnt USING (n, first)
        """,
        # INDEPENDENT formulation: the expected post-merge table is
        # computed straight from the change rules, never via a merge
        "q_cdc_upsert": """
            WITH m AS (
              SELECT *, o_orderkey % 10 AS md FROM orders
            )
            SELECT o_orderkey,
                   CASE WHEN md IN (1, 2) THEN 'X'
                        WHEN md = 3 THEN 'Y'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN md IN (1, 2) THEN o_totalprice + 1000
                        WHEN md = 3 THEN o_totalprice + 2000
                        ELSE o_totalprice END AS o_totalprice
            FROM m WHERE md <> 0
            UNION ALL
            SELECT o_orderkey + 1000000, 'X', o_totalprice + 1000
            FROM m WHERE md = 4
        """,
        # single-pass replay of the bucket arithmetic (Spark side
        # builds per-slice partials and SUM-merges: equality proves
        # mergeability, as q_cms_heavy does for frequencies)
        "q_quantile_sketch": """
            WITH b AS (
              SELECT event_type,
                     CASE WHEN value > 0
                          THEN ceil(ln(value) / ln(1.02))::BIGINT
                          ELSE -2147483648 END AS bucket
              FROM events
            ), sk AS (
              SELECT event_type, bucket, count(*) AS cnt
              FROM b GROUP BY 1, 2
            ), cum AS (
              SELECT event_type, bucket,
                     sum(cnt) OVER (PARTITION BY event_type
                                    ORDER BY bucket) AS cum,
                     sum(cnt) OVER (PARTITION BY event_type) AS n
              FROM sk
            ), picks AS (
              SELECT event_type, max(n)::BIGINT AS n,
                     min(CASE WHEN cum >= greatest(1, ceil(0.5 * n))
                              THEN bucket END) AS b50,
                     min(CASE WHEN cum >= greatest(1, ceil(0.95 * n))
                              THEN bucket END) AS b95,
                     min(CASE WHEN cum >= greatest(1, ceil(0.99 * n))
                              THEN bucket END) AS b99
              FROM cum GROUP BY event_type
            )
            SELECT event_type, n,
                   CASE WHEN b50 = -2147483648 THEN 0.0
                        ELSE round(2.0 * power(1.02, b50) / 2.02, 6)
                        END AS p50,
                   CASE WHEN b95 = -2147483648 THEN 0.0
                        ELSE round(2.0 * power(1.02, b95) / 2.02, 6)
                        END AS p95,
                   CASE WHEN b99 = -2147483648 THEN 0.0
                        ELSE round(2.0 * power(1.02, b99) / 2.02, 6)
                        END AS p99
            FROM picks
        """,
        # running header-count window replay
        "q_multiline": """
            WITH lines AS (
              SELECT 'f' || (user_id % 4) AS path,
                     event_id AS line_no,
                     CASE WHEN event_id % 5 IN (1, 2)
                          THEN '  at frame ' || event_id
                          ELSE 'ERR event ' || event_id END AS text
              FROM events
            ), rec AS (
              SELECT path, line_no, text,
                     sum(CASE WHEN NOT regexp_matches(text,
                           '^(\\s+|at\\s|Caused by:|\\.{3}\\s)')
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY path ORDER BY line_no)
                       AS record_no
              FROM lines
            )
            SELECT path, record_no::BIGINT AS record_no,
                   min(line_no) AS first_line_no,
                   count(*)::INT AS n_lines,
                   string_agg(text, chr(10) ORDER BY line_no) AS text
            FROM rec GROUP BY path, record_no
        """,
        "q_scd2": """
            WITH ch AS (
              SELECT user_id, ts, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_type)
                       AS prev
              FROM events
            ), kept AS (
              SELECT user_id, event_type, ts AS vf
              FROM ch WHERE prev IS NULL OR prev <> event_type
            ), ranged AS (
              SELECT user_id, event_type, vf,
                     lead(vf) OVER (PARTITION BY user_id
                                    ORDER BY vf, event_type) AS vt
              FROM kept
            )
            SELECT user_id, event_type,
                   strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
                   strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
                   vt IS NULL AS is_current
            FROM ranged
        """,
        "q_rate_limit": """
            SELECT event_id, event_type,
                   floor(epoch(ts) / 3600)::BIGINT AS rl_window,
                   row_number() OVER (
                     PARTITION BY event_type, floor(epoch(ts) / 3600)
                     ORDER BY ts, event_id) <= 20 AS admitted
            FROM events
        """,
        "q_dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "q_dedup_fingerprint": """
            SELECT md5(array_to_string(list_sort(list_distinct(
                     string_split(text, ' '))), ' ')) AS fp,
                   min(doc_id) AS keeper_id, count(*) AS n_members
            FROM documents GROUP BY 1
        """,
        "q_minhash_lsh": minhash_sql,
        "q_ngram_jaccard": ngram_jaccard_sql,
        "q_dedup_clusters": dedup_clusters_sql,
        # the star variant must produce the EXACT same closure
        "q_dedup_clusters_star": dedup_clusters_sql,
        "q_soft_dedup": """
            WITH g AS (
              SELECT doc_id,
                     count(*) OVER (PARTITION BY md5(text)) AS n_copies,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM documents
            )
            SELECT doc_id, n_copies,
                   round(1.0 / n_copies, 6) AS weight,
                   round(u, 6) AS u,
                   (u * n_copies < 1.0) AS kept
            FROM g
        """,
        "q_tfidf_terms": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
            ), dl AS (
              SELECT doc_id, sum(tf) AS len FROM tf GROUP BY 1
            ), dfr AS (
              SELECT term, count(*) AS dfreq FROM tf GROUP BY 1
            ), n AS (
              SELECT count(*) AS nd FROM documents
            ), scored AS (
              -- round BEFORE the rank cut, like the Spark side: 1-ulp
              -- libm ln() differences must not flip near-ties across
              -- the rank<=3 boundary
              SELECT tf.doc_id, tf.term,
                     round((tf.tf::DOUBLE / dl.len)
                           * ln(n.nd::DOUBLE / dfr.dfreq), 6) AS score
              FROM tf JOIN dl USING (doc_id) JOIN dfr USING (term)
              CROSS JOIN n
            )
            SELECT doc_id, term, score AS tfidf, rank::INT AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "q_bigram_ppl": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), big AS (
              SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
              FROM base, unnest(range(1, len(l))) AS u(i)
              WHERE len(l) >= 2
            ), bc AS (
              SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2
            ), cw AS (
              SELECT w1, sum(cb) AS cwv FROM bc GROUP BY 1
            ), v AS (
              SELECT count(DISTINCT w) AS vv FROM (
                SELECT w1 AS w FROM big UNION ALL SELECT w2 FROM big)
            ), scored AS (
              SELECT b.doc_id,
                     ln((bc.cb + 0.5) / (cw.cwv + 0.5 * v.vv)) AS lp
              FROM big b JOIN bc USING (w1, w2) JOIN cw USING (w1)
              CROSS JOIN v
            ), agg AS (
              SELECT doc_id, count(*) AS n_bigrams,
                     round(avg(lp), 6) AS avg_logprob
              FROM scored GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(a.n_bigrams, 0) AS n_bigrams,
                   coalesce(a.avg_logprob, 0.0) AS avg_logprob
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "q_dsir_weights": """
            WITH base AS (
              SELECT doc_id, lang = 'en' AS tgt,
                     string_split(text, ' ') AS l
              FROM documents
            ), uni AS (
              SELECT doc_id, tgt, l[i] AS f
              FROM base, unnest(range(1, len(l) + 1)) AS u(i)
            ), big AS (
              SELECT doc_id, tgt, l[i] || ' ' || l[i + 1] AS f
              FROM base, unnest(range(1, len(l))) AS u(i)
              WHERE len(l) >= 2
            ), feats AS (
              SELECT doc_id, tgt,
                     ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b
              FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
            ), stats AS (
              SELECT b,
                     sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                     sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
              FROM feats GROUP BY 1
            ), tot AS (
              SELECT sum(ct) AS tct, sum(cr) AS tcr FROM stats
            ), blr AS (
              SELECT b, ln(((ct + 0.5) / (tct + 512.0))
                           / ((cr + 0.5) / (tcr + 512.0))) AS lr
              FROM stats CROSS JOIN tot
            ), docb AS (
              SELECT doc_id, b, count(*) AS n FROM feats GROUP BY 1, 2
            )
            SELECT doc_id, sum(n)::BIGINT AS n_feats,
                   round(sum(n * lr) / sum(n), 6) AS dsir_score
            FROM docb JOIN blr USING (b) GROUP BY 1
        """,
        "q_pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                     sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS cum
              FROM t
            )
            SELECT doc_id, n_tokens,
                   ((cum - n_tokens) // 512)::BIGINT AS seq_first,
                   ((cum - 1) // 512)::BIGINT AS seq_last,
                   ((cum - n_tokens) % 512)::INT AS offset_in_seq
            FROM c
        """,
        "q_budget_select": """
            WITH q AS (
              SELECT doc_id,
                     (length(text) - length(replace(text, ' ', ''))
                      + 1)::BIGINT AS n_tokens,
                     round(
                       CASE WHEN length(text) >= 100 THEN 0.5
                            ELSE length(text) / 200.0 END
                       + CASE WHEN length(regexp_replace(
                                 text, '[^.,;:!?]', '', 'g'))::DOUBLE
                                   / length(text)::DOUBLE <= 0.1
                              THEN 0.25 ELSE 0.0 END
                       + CASE WHEN len(list_filter(string_split(text, ' '),
                                 x -> x IN ('the','a','of','and','to',
                                            'in','is','it')))::DOUBLE
                                   / len(string_split(text, ' '))::DOUBLE
                                   >= 0.05
                              THEN 0.25 ELSE 0.0 END, 4)::DOUBLE AS score
              FROM documents
            )
            SELECT doc_id, n_tokens, score,
                   sum(n_tokens) OVER (
                     ORDER BY score DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_tokens,
                   sum(n_tokens) OVER (
                     ORDER BY score DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) <= 20000 AS selected
            FROM q
        """,
        "q_mixture_weights": """
            WITH g AS (
              SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                     sum(length(text) - length(replace(text, ' ', ''))
                         + 1)::BIGINT AS n_tokens
              FROM documents GROUP BY 1
            )
            , p AS (
              SELECT "group", n_docs, n_tokens,
                     n_tokens::DOUBLE / sum(n_tokens) OVER () AS p_raw
              FROM g
            )
            SELECT "group", n_docs, n_tokens,
                   round(p_raw, 6) AS p_raw,
                   round(pow(p_raw, 0.5)
                         / sum(pow(p_raw, 0.5)) OVER (), 6) AS mix_weight
            FROM p
        """,
        "q_apply_mixture": """
            WITH g AS (
              SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                     sum(length(text) - length(replace(text, ' ', ''))
                         + 1)::BIGINT AS n_tokens
              FROM documents GROUP BY 1
            ), p AS (
              SELECT "group", n_tokens,
                     n_tokens::DOUBLE / sum(n_tokens) OVER () AS p_raw
              FROM g
            ), w AS (
              SELECT "group", n_tokens AS gtok,
                     round(pow(p_raw, 0.5)
                           / sum(pow(p_raw, 0.5)) OVER (), 6) AS mw
              FROM p
            ), d AS (
              SELECT doc_id, lang AS "group",
                     (length(text) - length(replace(text, ' ', ''))
                      + 1)::BIGINT AS n_tokens,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                       ::DOUBLE / power(2, 60) AS u
              FROM documents
            )
            SELECT doc_id, "group", d.n_tokens,
                   round(50000.0 * mw / gtok::DOUBLE, 6) AS rate,
                   (floor(50000.0 * mw / gtok::DOUBLE)
                    + CASE WHEN u < 50000.0 * mw / gtok::DOUBLE
                               - floor(50000.0 * mw / gtok::DOUBLE)
                           THEN 1 ELSE 0 END)::BIGINT AS n_copies
            FROM d JOIN w USING ("group")
        """,
        "q_shard_shuffle": """
            WITH k AS (
              SELECT doc_id,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                       AS key
              FROM documents
            )
            SELECT doc_id, (key % 8)::INT AS shard,
                   row_number() OVER (
                     PARTITION BY key % 8 ORDER BY key, doc_id
                   )::BIGINT AS shard_pos
            FROM k
        """,
        "q_split_assign": """
            -- boundaries are the Python-side int(frac_cum * 2^32)
            -- literals: both engines compare identical integers
            SELECT doc_id,
                   CASE WHEN u < 4209067950 THEN 'train'
                        WHEN u < 4252017623 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(md5('split-v1|' || doc_id::VARCHAR),
                                     1, 8))::BIGINT AS u
              FROM documents
            )
        """,
        "q_boilerplate": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), tok AS (
              SELECT doc_id, i - 1 AS pos, l[i] AS tok
              FROM base, unnest(range(1, len(l) + 1)) AS u(i)
            ), shq AS (
              SELECT doc_id, i - 1 AS spos,
                     substr(md5(array_to_string(l[i:i+4], ' ')), 1, 8) AS sh
              FROM base, unnest(range(1, len(l) - 3)) AS u(i)
              WHERE len(l) >= 5
            ), boiler AS (
              SELECT sh FROM (SELECT DISTINCT sh, doc_id FROM shq)
              GROUP BY sh HAVING count(*) >= 3
            ), covered AS (
              SELECT DISTINCT doc_id, pos FROM (
                SELECT s.doc_id, unnest(range(s.spos, s.spos + 5)) AS pos
                FROM shq s JOIN boiler b USING (sh))
            ), kept AS (
              SELECT t.* FROM tok t ANTI JOIN covered c
              ON t.doc_id = c.doc_id AND t.pos = c.pos
            ), rebuilt AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS text_clean
              FROM kept GROUP BY doc_id
            )
            SELECT base.doc_id, len(l)::INT AS n_tokens,
                   (len(l) - coalesce(n_kept, 0))::INT AS n_removed,
                   coalesce(text_clean, '') AS text_clean
            FROM base LEFT JOIN rebuilt USING (doc_id)
        """,
        "q_dedup_substr": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), tok AS (
              SELECT doc_id, i - 1 AS pos, l[i] AS tok
              FROM base, unnest(range(1, len(l) + 1)) AS u(i)
            ), shq AS (
              SELECT doc_id, i - 1 AS spos,
                     substr(md5(array_to_string(l[i:i+4], ' ')), 1, 8) AS sh
              FROM base, unnest(range(1, len(l) - 3)) AS u(i)
              WHERE len(l) >= 5
            ), occ AS (
              SELECT doc_id, spos,
                     row_number() OVER (
                       PARTITION BY sh ORDER BY doc_id, spos) AS rn
              FROM shq
            ), covered AS (
              SELECT DISTINCT doc_id, pos FROM (
                SELECT doc_id, unnest(range(spos, spos + 5)) AS pos
                FROM occ WHERE rn >= 2)
            ), kept AS (
              SELECT t.* FROM tok t ANTI JOIN covered c
              ON t.doc_id = c.doc_id AND t.pos = c.pos
            ), rebuilt AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS text_clean
              FROM kept GROUP BY doc_id
            )
            SELECT base.doc_id, len(l)::INT AS n_tokens,
                   (len(l) - coalesce(n_kept, 0))::INT AS n_removed,
                   coalesce(text_clean, '') AS text_clean
            FROM base LEFT JOIN rebuilt USING (doc_id)
        """,
        "q_url_filter": """
            WITH src AS (
              SELECT doc_id,
                CASE WHEN doc_id % 19 = 0 THEN NULL
                  WHEN doc_id % 17 = 0
                  THEN printf('https:///broken/%d', doc_id)
                  ELSE
                    ['https','http','ftp','https'][(doc_id % 4)::INT + 1]
                    || '://'
                    || CASE WHEN doc_id % 7 = 0 THEN 'u:p@' ELSE '' END
                    || CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END
                    || printf('site%02d', (doc_id % 40)::INT) || '.'
                    || ['com','org','zip','net','io'][(doc_id % 5)::INT + 1]
                    || CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END
                    || printf('/p/%d?q=%d', doc_id, (doc_id % 9)::INT)
                END AS url
              FROM documents
            ), parsed AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)', 1)),
                  '^www\\.', '') AS host
              FROM src
            ), p2 AS (
              SELECT *,
                regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld,
                coalesce(nullif(regexp_extract(host,
                  '([a-z0-9-]+\\.[a-z0-9-]+)$', 1), ''), host) AS domain
              FROM parsed
            ), decided AS (
              SELECT *,
                CASE
                  WHEN url IS NULL OR url = '' THEN 'no_url'
                  WHEN scheme NOT IN ('http', 'https') THEN 'scheme'
                  WHEN host = '' THEN 'no_host'
                  WHEN domain IN ('site03.net', 'site08.net', 'site21.org')
                    THEN 'blocked_domain'
                  WHEN tld IN ('zip', 'xxx') THEN 'blocked_tld'
                  ELSE 'kept'
                END AS reason
              FROM p2
            )
            SELECT doc_id, url, scheme, host, domain, tld, reason,
                   (reason = 'kept') AS keep
            FROM decided
        """,
        "q_dedup_apply": f"""
            WITH clusters AS ({dedup_clusters_sql})
            SELECT cluster_id AS keeper_id, count(*) AS n_members,
                   (count(*) - 1)::BIGINT AS n_removed
            FROM clusters GROUP BY cluster_id
        """,
        "q_sample_per_group": """
            SELECT lang, doc_id, rn::int AS rn FROM (
              SELECT lang, doc_id,
                row_number() OVER (PARTITION BY lang
                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
              FROM documents
            ) WHERE rn <= 20
        """,
        "q_simhash": simhash_sql,
        "q_simhash_pairs": simhash_pairs_sql,
        "q_ann_topk": """
            WITH q AS (
              SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
            ), sims AS (
              SELECT e.vec_id,
                round(
                  list_dot_product(e.embedding::DOUBLE[], q.qe) /
                  (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[])) *
                   sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
              FROM embeddings e, q
            )
            SELECT vec_id, cos_sim FROM sims
            ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
        "q_ann_lsh": ann_lsh_sql,
        "q_ivf_topk": """
            WITH cents AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              FROM embeddings WHERE vec_id < 16
            ), q AS (
              SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
            ), assign AS (
              SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id ORDER BY
                  round(list_dot_product(e.embedding::DOUBLE[], c.ce) /
                    (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])) *
                     sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
                  c.cid DESC) AS rn
              FROM embeddings e CROSS JOIN cents c
            ), cells AS (
              SELECT vec_id, cid FROM assign WHERE rn = 1
            ), qprobe AS (
              SELECT cid FROM (
                SELECT c.cid, row_number() OVER (ORDER BY
                  round(list_dot_product(c.ce, q.qe) /
                    (sqrt(list_dot_product(c.ce, c.ce)) *
                     sqrt(list_dot_product(q.qe, q.qe))), 6) DESC,
                  c.cid DESC) AS rn
                FROM cents c, q
              ) WHERE rn <= 4
            )
            SELECT e.vec_id,
              round(list_dot_product(e.embedding::DOUBLE[], q.qe) /
                (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                       e.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
            FROM embeddings e
            JOIN cells ON cells.vec_id = e.vec_id
            CROSS JOIN q
            WHERE cells.cid IN (SELECT cid FROM qprobe)
            ORDER BY cos_sim DESC, e.vec_id
            LIMIT 10
        """,
        "q_embed_neardup": neardup_sql,
        "q_kmeans": """
            WITH cents AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              FROM embeddings WHERE vec_id < 8
            ), assign AS (
              SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id ORDER BY
                  round(list_dot_product(e.embedding::DOUBLE[], c.ce) /
                    (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])) *
                     sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
                  c.cid DESC) AS rn
              FROM embeddings e CROSS JOIN cents c
            ), cells AS (
              SELECT vec_id, cid FROM assign WHERE rn = 1
            ), comp AS (
              SELECT cells.cid AS cell, (i - 1)::INT AS pos,
                     CAST(round(e.embedding[i]::DOUBLE * 1000000.0)
                          AS BIGINT) AS qv
              FROM embeddings e
              JOIN cells USING (vec_id),
              unnest(range(1, len(e.embedding) + 1)) AS u(i)
            )
            SELECT cell, pos, count(*)::BIGINT AS n,
                   round(sum(qv) / count(*) / 1000000.0, 6) AS c_mean
            FROM comp GROUP BY cell, pos
        """,
        "q_semdedup": """
            WITH cents AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              FROM embeddings WHERE vec_id < 8
            ), assign AS (
              SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id ORDER BY
                  round(list_dot_product(e.embedding::DOUBLE[], c.ce) /
                    (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])) *
                     sqrt(list_dot_product(c.ce, c.ce))), 6) DESC,
                  c.cid DESC) AS rn
              FROM embeddings e CROSS JOIN cents c
            ), cells AS (
              SELECT vec_id, cid FROM assign WHERE rn = 1
            ), aside AS (
              -- one-sided deterministic cell cap (QUALIFY mirrors the
              -- Spark row_number <= 64 on the proposing side only)
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY cid
                                          ORDER BY vec_id) AS rn
                FROM cells
              ) WHERE rn <= 64
            ), pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM aside a JOIN cells b
                ON a.cid = b.cid AND a.vec_id < b.vec_id
            ), drops AS (
              SELECT DISTINCT p.id_b
              FROM pairs p
              JOIN embeddings ea ON ea.vec_id = p.id_a
              JOIN embeddings eb ON eb.vec_id = p.id_b
              WHERE round(
                list_dot_product(ea.embedding::DOUBLE[],
                                 eb.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(ea.embedding::DOUBLE[],
                                       ea.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(eb.embedding::DOUBLE[],
                                       eb.embedding::DOUBLE[]))), 6)
                >= 0.3
            )
            SELECT c.vec_id, c.cid AS cell, (d.id_b IS NULL) AS keep
            FROM cells c LEFT JOIN drops d ON c.vec_id = d.id_b
        """,
        "q_classifier": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), uni AS (
              SELECT doc_id, l[i] AS f
              FROM base, unnest(range(1, len(l) + 1)) AS u(i)
            ), big AS (
              SELECT doc_id, l[i] || ' ' || l[i + 1] AS f
              FROM base, unnest(range(1, len(l))) AS u(i)
              WHERE len(l) >= 2
            ), feats AS (
              SELECT doc_id,
                     ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b
              FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
            ), docb AS (
              SELECT doc_id, b, count(*) AS n FROM feats GROUP BY 1, 2
            ), agg AS (
              SELECT doc_id, sum(n)::BIGINT AS n_feats,
                     sum(n * ((b * 1103515245 + 12345) % 2001 - 1000))
                       ::BIGINT AS raw
              FROM docb GROUP BY 1
            )
            SELECT doc_id, n_feats,
                   round(0.0 + raw / (n_feats * 1000.0), 6) AS clf_score,
                   (round(0.0 + raw / (n_feats * 1000.0), 6) >= 0.0)
                     AS keep
            FROM agg
        """,
        "q_text_stats": """
            -- sums cast to BIGINT: DuckDB sum(BIGINT) yields HUGEINT,
            -- which the driver's normalizer renders as float64 while
            -- Spark returns int64 (CLAUDE.md cast-both-sides contract)
            SELECT lang, count(*) AS n_docs,
                   sum(length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
                     AS sum_tokens,
                   sum(length(text))::BIGINT AS sum_chars
            FROM documents GROUP BY lang
        """,
        "q_token_pctl": """
            WITH tc AS (
              SELECT lang,
                (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
                  AS tc
              FROM documents
            )
            SELECT lang,
              round(quantile_cont(tc, 0.5), 4) AS p50_tokens,
              round(quantile_cont(tc, 0.95), 4) AS p95_tokens,
              max(tc) AS max_tokens
            FROM tc GROUP BY lang
        """,
        "q_bpe_tokens": r"""
            SELECT lang, count(*) AS n_docs,
                   sum(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::BIGINT
                     AS sum_bpe_tokens
            FROM documents GROUP BY lang
        """,
        "q_winnow_fp": """
            -- winnowing (SIGMOD'03): rolling 8-gram md5-prefix hashes,
            -- min per window of 4, md5 of sorted distinct minima
            SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                list_transform(
                  range(1, greatest(greatest(length(text) - 7, 1) - 3, 1) + 1),
                  j -> list_min(list_transform(range(j, j + 4),
                    i -> substr(md5(substr(text, i, 8)), 1, 8)))
                ))), '')) AS wfp
            FROM documents
        """,
        "q_lang_id": """
            SELECT CASE WHEN strpos(text, ' the ') > 0 THEN 'en'
                        WHEN strpos(text, ' el ') > 0 THEN 'es'
                        WHEN strpos(text, ' le ') > 0 THEN 'fr'
                        WHEN strpos(text, ' der ') > 0 THEN 'de'
                        ELSE 'unk' END AS predicted_lang,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "q_doc_fingerprint": """
            SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
                     string_split(text, ' '))), ' ')) AS fp
            FROM documents
        """,
        "q_parse_json": """
            WITH j AS (
              SELECT event_id,
                ['kern','auth','cron','local3'][(event_id % 4)::int + 1] AS fn,
                ['emerg','crit','notice','debug'][(event_id % 3)::int + 1] AS sn,
                'jh' || lpad((user_id % 30)::varchar, 2, '0') AS hostname,
                event_type AS message,
                date_trunc('second', ts) AS tr
              FROM events
            ), c AS (
              SELECT *,
                CASE fn WHEN 'kern' THEN 0 WHEN 'auth' THEN 4
                        WHEN 'cron' THEN 15 ELSE 19 END AS facility,
                CASE sn WHEN 'emerg' THEN 0 WHEN 'crit' THEN 2
                        WHEN 'notice' THEN 5 ELSE 7 END AS severity
              FROM j
            )
            SELECT event_id, (facility * 8 + severity)::int AS priority,
                   facility::int AS facility, severity::int AS severity,
                   hostname, 'japp' AS appname, message,
                   strftime(tr, '%Y-%m-%d %H:%M:%S') AS tr_str
            FROM c
        """,
        "q_parse_influx": """
            SELECT event_id,
                   134 AS priority, 16 AS facility, 6 AS severity,
                   'ih' || lpad((user_id % 40)::varchar, 2, '0') AS hostname,
                   'influxdb' AS appname, 'cpu' AS message,
                   (event_id % 1000)::varchar AS count_i,
                   'r' || (event_id % 5)::varchar AS region,
                   strftime(to_timestamp(event_id), '%Y-%m-%d %H:%M:%S') AS tr_str
            FROM events
        """,
        "q_quality_score": """
            WITH q AS (
              SELECT
                CASE WHEN length(text) >= 100 THEN 0.5
                     ELSE length(text) / 200.0 END
                + CASE WHEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                            / length(text)::DOUBLE <= 0.1 THEN 0.25 ELSE 0.0 END
                + CASE WHEN len(list_filter(string_split(text, ' '),
                          x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
                            / len(string_split(text, ' '))::DOUBLE >= 0.05
                       THEN 0.25 ELSE 0.0 END AS raw
              FROM documents
            )
            SELECT round(raw, 4) AS quality, count(*) AS n FROM q GROUP BY 1
        """,
        "q_pii_redact": r"""
            WITH src AS (
              SELECT event_id,
                'user u' || (user_id % 50) || '@example.org at ' ||
                (event_id % 223 + 1) || '.' || (event_id % 250) || '.' ||
                (user_id % 250) || '.' || (event_id % 254 + 1) ||
                ' card 4111111111' || lpad((event_id % 1000000)::VARCHAR, 6, '0') ||
                ' tel +3361234' || lpad((event_id % 10000)::VARCHAR, 4, '0') ||
                ' note ' || event_type AS text
              FROM events
            ), s1 AS (
              SELECT *, regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g') AS t1 FROM src
            ), s2 AS (
              SELECT *, regexp_replace(t1,
                '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t2 FROM s1
            ), s3 AS (
              SELECT *, regexp_replace(t2,
                '\+[0-9]{7,15}\b', '<PHONE>', 'g') AS t3 FROM s2
            )
            SELECT event_id,
              regexp_replace(t3, '\b[0-9]{13,16}\b', '<CARD>', 'g') AS redacted,
              len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                AS n_emails,
              len(regexp_extract_all(t1,
                '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))::BIGINT AS n_ips,
              len(regexp_extract_all(t2, '\+[0-9]{7,15}\b'))::BIGINT AS n_phones,
              len(regexp_extract_all(t3, '\b[0-9]{13,16}\b'))::BIGINT AS n_cards
            FROM s3
        """,
        "q_repetition": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), g AS (
              SELECT doc_id, toks,
                list_transform(generate_series(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+1], ' ')) AS grams
              FROM w
            )
            SELECT doc_id,
              round(1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 4)
                AS dup_word_frac,
              round(list_max(list_transform(list_distinct(toks),
                  w2 -> len(list_filter(toks, x -> x = w2))))::DOUBLE
                / len(toks), 4) AS top_word_frac,
              round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4)
                AS dup_2gram_frac
            FROM g
        """,
        "q_decontam": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 3 THEN
                  list_transform(generate_series(0, len(toks) - 3),
                    i -> array_to_string(toks[i+1:i+3], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS shingles
              FROM w
            ), bench AS (
              SELECT DISTINCT unnest(shingles) AS shingle FROM sh
              WHERE doc_id % 10 = 0
            ), docs AS (
              SELECT doc_id, shingles, len(shingles) AS n_shingles FROM sh
              WHERE doc_id % 10 <> 0
            ), m AS (
              SELECT d.doc_id, count(*) AS n_matched
              FROM (SELECT doc_id, unnest(shingles) AS shingle FROM docs) d
              JOIN bench USING (shingle) GROUP BY d.doc_id
            )
            SELECT docs.doc_id,
              n_shingles::BIGINT AS n_shingles,
              coalesce(m.n_matched, 0)::BIGINT AS n_matched,
              round(coalesce(m.n_matched, 0)::DOUBLE /
                    greatest(n_shingles, 1), 4) AS overlap_frac,
              (coalesce(m.n_matched, 0)::DOUBLE /
                    greatest(n_shingles, 1)) >= 0.1 AS contaminated
            FROM docs LEFT JOIN m ON docs.doc_id = m.doc_id
        """,
        "q_curation": """
            WITH w AS (
              SELECT doc_id, text, string_split(text, ' ') AS toks
              FROM documents
            ), sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 3 THEN
                  list_transform(generate_series(0, len(toks) - 3),
                    i -> array_to_string(toks[i+1:i+3], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS shingles
              FROM w
            ), bench AS (
              SELECT DISTINCT unnest(shingles) AS shingle FROM sh
              WHERE doc_id % 10 = 0
            ), docs AS (
              SELECT w.doc_id, w.text, w.toks, sh.shingles,
                     len(sh.shingles) AS n_shingles
              FROM w JOIN sh USING (doc_id) WHERE w.doc_id % 10 <> 0
            ), m AS (
              SELECT d.doc_id, count(*) AS n_matched
              FROM (SELECT doc_id, unnest(shingles) AS shingle FROM docs) d
              JOIN bench USING (shingle) GROUP BY d.doc_id
            ), scored AS (
              SELECT docs.doc_id,
                min(docs.doc_id) OVER (PARTITION BY md5(docs.text))
                  AS keeper_id,
                CASE WHEN strpos(text, ' the ') > 0 THEN 'en'
                     WHEN strpos(text, ' el ') > 0 THEN 'es'
                     WHEN strpos(text, ' le ') > 0 THEN 'fr'
                     WHEN strpos(text, ' der ') > 0 THEN 'de'
                     ELSE 'unk' END AS lang,
                round(
                  CASE WHEN length(text) >= 100 THEN 0.5
                       ELSE length(text) / 200.0 END
                  + CASE WHEN length(regexp_replace(text, '[^.,;:!?]',
                              '', 'g'))::DOUBLE
                              / length(text)::DOUBLE <= 0.1
                         THEN 0.25 ELSE 0.0 END
                  + CASE WHEN len(list_filter(toks,
                            x -> x IN ('the','a','of','and','to','in',
                                       'is','it')))::DOUBLE
                              / len(toks)::DOUBLE >= 0.05
                         THEN 0.25 ELSE 0.0 END, 4) AS quality,
                coalesce(m.n_matched, 0)::DOUBLE
                  / greatest(n_shingles, 1) AS frac
              FROM docs LEFT JOIN m ON docs.doc_id = m.doc_id
            ), dec AS (
              SELECT doc_id, keeper_id, lang, quality,
                round(frac, 4) AS overlap_frac,
                CASE WHEN doc_id <> keeper_id THEN 'duplicate'
                     WHEN lang <> 'en' THEN 'language'
                     WHEN quality < 0.75 THEN 'low_quality'
                     WHEN frac >= 0.1 THEN 'contaminated'
                     ELSE 'kept' END AS reason
              FROM scored
            )
            SELECT doc_id, keeper_id, lang, quality, overlap_frac,
                   reason, (reason = 'kept') AS keep
            FROM dec
        """,
        "q_image_decode": """
            -- recompute channel sums arithmetically (pixel i of the
            -- 4x2 RGB raster = (event_id*7+i) % 256; channel c sits at
            -- i = 3k+c) — the codec itself is never invoked here
            SELECT event_id, 4 AS width, 2 AS height,
              list_aggregate(list_transform(generate_series(0, 7),
                k -> (event_id*7 + 3*k) % 256), 'sum')::BIGINT AS sum_r,
              list_aggregate(list_transform(generate_series(0, 7),
                k -> (event_id*7 + 3*k + 1) % 256), 'sum')::BIGINT AS sum_g,
              list_aggregate(list_transform(generate_series(0, 7),
                k -> (event_id*7 + 3*k + 2) % 256), 'sum')::BIGINT AS sum_b
            FROM events
        """,
        "q_audio_decode": """
            -- sample i = int16 reinterpretation of the u16 value
            -- (event_id*31 + i*997) % 65536, i.e. two's complement:
            -- (v + 32768) % 65536 - 32768
            SELECT event_id, 16000 AS rate, 16::BIGINT AS n_samples,
              list_aggregate(list_transform(generate_series(0, 15),
                i -> ((event_id*31 + i*997) % 65536 + 32768) % 65536 - 32768),
                'sum')::BIGINT AS sum_amp
            FROM events
        """,
        "q_asof_enrich": """
            WITH cfg AS (
              SELECT user_id, ts, event_id AS cfg_version FROM events
              WHERE event_id % 23 = 0
            ), l AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_id % 23 <> 0
            )
            SELECT l.event_id, l.user_id, cfg.cfg_version
            FROM l ASOF LEFT JOIN cfg
              ON l.user_id = cfg.user_id AND l.ts >= cfg.ts
        """,
        "q_session_agg": """
            -- new session when the gap EXCEEDS 4h (measured Spark
            -- semantics, pinned by test_session_agg_gap_boundary: an
            -- event at exactly prev + gap still merges, hence >)
            WITH x AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
                     THEN 1 ELSE 0 END AS ns
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id, ts,
                sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
              FROM x
            )
            SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_last,
              count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "q_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        # the oracle states SFT extraction as the NAIVE per-conv window;
        # the Spark side runs the skew-safe join formulation — their
        # equality is the point of the check
        "q_sft_pairs": """
            WITH t AS (
              SELECT user_id::VARCHAR AS conv_id, event_id::INT AS turn_idx,
                     event_type AS role,
                     event_type || ' msg ' || event_id ||
                       (CASE WHEN event_id % 11 = 0 THEN ' REJECTME'
                             ELSE '' END) AS text
              FROM events
            ), wi AS (
              SELECT conv_id, turn_idx, role, text,
                count(*) OVER w AS n_context,
                coalesce(string_agg(text, chr(10)) OVER w, '') AS prompt
              FROM t
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
            )
            SELECT conv_id, turn_idx, n_context::INT AS n_context,
                   prompt, text AS response
            FROM wi WHERE role = 'purchase'
        """,
        # CMS mirrored cell-for-cell: same md5 row personas, same mod-
        # width buckets; the oracle builds the sketch single-pass, the
        # Spark side builds per-slice partials and SUM-merges — equality
        # IS the mergeability proof
        "q_cms_heavy": """
            WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row_id),
            cells AS (
              SELECT r.row_id,
                     (('0x' || substr(md5('cms' || r.row_id || '|' ||
                                          e.user_id::VARCHAR), 1, 8))::BIGINT
                      % 1024)::INT AS bucket,
                     count(*)::BIGINT AS cnt
              FROM events e CROSS JOIN rows_ r
              GROUP BY 1, 2
            ), top AS (
              SELECT user_id, count(*)::BIGINT AS exact_n FROM events
              GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT 10
            ), est AS (
              SELECT t.user_id,
                     min(coalesce(c.cnt, 0)) AS cms_n
              FROM top t CROSS JOIN rows_ r
              LEFT JOIN cells c ON c.row_id = r.row_id
                AND c.bucket = (('0x' || substr(md5('cms' || r.row_id ||
                  '|' || t.user_id::VARCHAR), 1, 8))::BIGINT % 1024)::INT
              GROUP BY t.user_id
            )
            SELECT t.user_id::BIGINT AS user_id, t.exact_n,
                   e.cms_n::BIGINT AS cms_n
            FROM top t JOIN est e USING (user_id)
        """,
        # hybrid = the bm25 top-20 CTE + the ann top-20 CTE + RRF
        # (1/(60+rank)); at most two addends per doc so the float sum is
        # order-independent
        "q_hybrid_search": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, avg(len(toks)) AS avgdl
              FROM d
            ), tok AS (
              SELECT doc_id, unnest(toks) AS term, len(toks) AS dl FROM d
            ), post AS (
              SELECT term, doc_id, count(*)::BIGINT AS tf, first(dl) AS dl
              FROM tok WHERE term IN ('join', 'spark', 'window')
              GROUP BY term, doc_id
            ), dfreq AS (
              SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term
            ), bm AS (
              SELECT p.doc_id,
                     round(sum(
                       ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * (p.tf * 2.2)
                       / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))
                     ), 6) AS score
              FROM post p JOIN dfreq f USING (term) CROSS JOIN stats s
              GROUP BY p.doc_id ORDER BY score DESC, p.doc_id LIMIT 20
            ), q AS (
              SELECT embedding::DOUBLE[] AS qe FROM embeddings
              WHERE vec_id = 0
            ), ann AS (
              SELECT e.vec_id AS doc_id,
                round(
                  list_dot_product(e.embedding::DOUBLE[], q.qe) /
                  (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[])) *
                   sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
              FROM embeddings e, q
              ORDER BY score DESC, doc_id LIMIT 20
            ), ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
              FROM bm
              UNION ALL
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
              FROM ann
            )
            SELECT doc_id, count(*)::BIGINT AS n_lists,
                   round(sum(1.0 / (60.0 + rnk)), 6) AS rrf_score
            FROM ranked GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id LIMIT 10
        """,
        # chunk starts 0, 48, 96, … while start < max(n-16, 1); chunk =
        # 64-token slice from each start, final chunk may be short
        "q_doc_chunks": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
            ), st AS (
              SELECT doc_id, toks, n,
                     unnest(range(0, greatest(n - 16, 1), 48)) AS start
              FROM s
            )
            SELECT doc_id,
                   (start // 48)::INT AS chunk_idx,
                   least(64, n - start)::INT AS n_tokens,
                   array_to_string(toks[start + 1 : start + 64],
                                   ' ') AS chunk_text
            FROM st
        """,
        # the oracle replays the JVM double-space replace-chain encoding
        # (apply_bpe's documented algebra) against the PANDAS encoder —
        # cross-implementation parity is the point of the check
        "q_bpe_apply": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS words
              FROM documents
            ), enc AS (
              SELECT doc_id,
                flatten(list_transform(words, w ->
                  list_filter(
                    string_split(
                      trim(
                        replace(replace(replace(replace(
                          '  ' || regexp_replace(w, '(.)', '\\1  ', 'g'),
                          ' t  h ', ' th '),
                          ' th  e ', ' the '),
                          ' i  n ', ' in '),
                          ' a  n ', ' an ')
                      ), '  '),
                    t -> t <> ''))) AS tokens
              FROM w
            )
            SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
                   array_to_string(tokens[1:12], '|') AS head_tokens
            FROM enc
        """,
        "q_conv_stats": """
            WITH t AS (
              SELECT user_id::VARCHAR AS conv_id, event_id::INT AS turn_idx,
                     event_type AS role,
                     event_type || ' msg ' || event_id ||
                       (CASE WHEN event_id % 11 = 0 THEN ' REJECTME'
                             ELSE '' END) AS text,
                     CASE event_type WHEN 'click' THEN 'browser'
                       WHEN 'view' THEN 'browser' WHEN 'purchase' THEN 'bash'
                       WHEN 'signup' THEN 'editor' ELSE 'none' END AS tool,
                     ts
              FROM events
            )
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   count(DISTINCT role)::BIGINT AS n_roles,
                   count(DISTINCT tool)::BIGINT AS n_tools,
                   array_to_string(list_sort(list(DISTINCT tool)), ',') AS tools,
                   min(turn_idx) AS first_turn, max(turn_idx) AS last_turn,
                   (epoch_us(max(ts)) // 1000000
                    - epoch_us(min(ts)) // 1000000)::BIGINT AS duration_sec,
                   sum(length(text))::BIGINT AS total_chars,
                   max(length(text))::BIGINT AS max_chars
            FROM t GROUP BY conv_id
        """,
        "q_domain_quantile": """
            WITH s AS (
              SELECT doc_id, source AS domain, n_chars::DOUBLE AS score
              FROM documents
            ), thr AS (
              SELECT domain, quantile_cont(score, 0.75) AS thr
              FROM s GROUP BY domain
            )
            SELECT s.doc_id, s.domain, s.score, thr.thr,
                   s.score >= thr.thr AS keep
            FROM s JOIN thr USING (domain)
        """,
        "q_pagerank": pagerank_sql,
        "q_bpe_merges": bpe_merges_sql,
        "q_zorder": """
            -- Morton interleave after min/max width-bucket
            -- normalization; scale factors are computed as
            -- (grid / (max - min)) FIRST then multiplied, matching the
            -- Spark driver-literal order bit-for-bit (IEEE doubles)
            WITH s AS (
              SELECT min(n_chars)::DOUBLE AS mn1, max(n_chars)::DOUBLE AS mx1,
                     min(doc_id)::DOUBLE  AS mn2, max(doc_id)::DOUBLE  AS mx2
              FROM documents
            ), b AS (
              SELECT doc_id,
                least(floor((n_chars::DOUBLE - mn1)
                            * (256.0 / (mx1 - mn1)))::BIGINT, 255) AS b0,
                least(floor((doc_id::DOUBLE - mn2)
                            * (256.0 / (mx2 - mn2)))::BIGINT, 255) AS b1
              FROM documents CROSS JOIN s
            )
            SELECT doc_id,
                   (list_sum(list_transform(range(0, 8),
                      i -> ((b0 >> i) & 1) << (2 * i)))
                  + list_sum(list_transform(range(0, 8),
                      i -> ((b1 >> i) & 1) << (2 * i + 1))))::BIGINT AS zkey
            FROM b
        """,
        "q_bucketed_join": """
            -- the bucketed layout must not change the JOIN's answer:
            -- plain join + aggregate (the plan property — zero
            -- exchanges — is pinned by tests/test_layout.py)
            WITH tot AS (
              SELECT user_id, SUM(event_id)::BIGINT AS user_mass
              FROM events GROUP BY user_id
            )
            SELECT e.event_type, COUNT(*)::BIGINT AS n,
                   SUM(t.user_mass)::BIGINT AS mass
            FROM events e JOIN tot t USING (user_id)
            GROUP BY e.event_type
        """,
        "q_sketch_distinct": """
            -- bitmap sketches are exact: merged-slice count == the
            -- plain COUNT(DISTINCT) regardless of how slices cut keys
            SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type
        """,
        # Efraimidis–Spirakis weighted sample with md5 uniforms; the
        # 6-dp round on u^(1/w) BEFORE the (key desc, id-string) cut
        # pins the rank-50 boundary across engines (pow may differ by
        # 1 ulp between libm implementations)
        "q_weighted_sample": """
            WITH k AS (
              SELECT doc_id,
                     round(pow(
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                         / 4294967296.0,
                       1.0 / n_chars::DOUBLE), 6) AS sample_key
              FROM documents WHERE n_chars::DOUBLE > 0
            )
            SELECT doc_id, sample_key FROM k
            ORDER BY sample_key DESC, doc_id::VARCHAR
            LIMIT 50
        """,
        # robust windowed rate anomaly: gap-filled per-key hourly
        # counts, median/MAD (quantile_cont ≡ Spark F.percentile,
        # bit-for-bit on small-integer interpolation), modified
        # z-score arithmetic mirrored operand-for-operand; is_anomaly
        # compares the ROUNDED score so the flag is engine-independent
        "q_rate_anomaly": """
            WITH c AS (
              SELECT event_type AS k, date_trunc('hour', ts) AS w,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            ), span AS (
              SELECT k, min(w) AS lo, max(w) AS hi FROM c GROUP BY k
            ), allw AS (
              SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS w
              FROM span
            ), d AS (
              SELECT a.k, a.w, coalesce(c.n, 0)::BIGINT AS n
              FROM allw a LEFT JOIN c ON a.k = c.k AND a.w = c.w
            ), m1 AS (
              SELECT k, quantile_cont(n, 0.5)::DOUBLE AS med
              FROM d GROUP BY k
            ), e AS (
              SELECT d.k, d.w, d.n, m1.med, abs(d.n - m1.med) AS ad
              FROM d JOIN m1 ON d.k = m1.k
            ), m2 AS (
              SELECT k, quantile_cont(ad, 0.5)::DOUBLE AS mad,
                     avg(ad) AS mean_ad
              FROM e GROUP BY k
            ), z AS (
              SELECT e.k, e.w, e.n, e.med, m2.mad,
                     round(CASE
                       WHEN m2.mad > 0
                         THEN 0.6745 * (e.n - e.med) / m2.mad
                       WHEN m2.mean_ad > 0
                         THEN (e.n - e.med) / (1.253314 * m2.mean_ad)
                       ELSE 0.0 END, 6) AS z_score
              FROM e JOIN m2 ON e.k = m2.k
            )
            SELECT k AS event_type,
                   strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
                   n AS n_events, med, mad, z_score,
                   abs(z_score) > 3.5 AS is_anomaly
            FROM z
        """,
        # BM25 (Lucene non-negative idf); tokenizer contract shared
        # with operators/search.py: lowercase, split on non-alnum runs,
        # drop empties.  Arithmetic mirrors the Spark expression
        # order exactly (idf * (tf*2.2) / denom, denom = tf +
        # 1.2*(0.25 + 0.75*dl/avgdl)) so doubles agree bit-for-bit up
        # to summation order; the 6-dp round + (score, doc_id) order
        # pins the rank-10 cut.
        "q_bm25_search": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, avg(len(toks)) AS avgdl
              FROM d
            ), tok AS (
              SELECT doc_id, unnest(toks) AS term, len(toks) AS dl FROM d
            ), post AS (
              SELECT term, doc_id, count(*)::BIGINT AS tf, first(dl) AS dl
              FROM tok WHERE term IN ('join', 'spark', 'window')
              GROUP BY term, doc_id
            ), dfreq AS (
              SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term
            )
            SELECT p.doc_id,
                   count(*)::BIGINT AS n_terms_hit,
                   round(sum(
                     ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                     * (p.tf * 2.2)
                     / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))
                   ), 6) AS score
            FROM post p JOIN dfreq f USING (term) CROSS JOIN stats s
            GROUP BY p.doc_id
            ORDER BY score DESC, p.doc_id
            LIMIT 10
        """,
        # strict-after funnel milestones: each step's timestamp is the
        # earliest event of that type STRICTLY AFTER the previous
        # milestone (same-ts events do not advance the funnel)
        "q_funnel": """
            WITH m1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'signup' GROUP BY user_id
            ), m2 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN m1 ON e.user_id = m1.user_id
              WHERE e.event_type = 'view' AND e.ts > m1.t
              GROUP BY e.user_id
            ), m3 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN m2 ON e.user_id = m2.user_id
              WHERE e.event_type = 'click' AND e.ts > m2.t
              GROUP BY e.user_id
            ), m4 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN m3 ON e.user_id = m3.user_id
              WHERE e.event_type = 'purchase' AND e.ts > m3.t
              GROUP BY e.user_id
            ), c AS (
              SELECT (SELECT count(*) FROM m1)::BIGINT AS c1,
                     (SELECT count(*) FROM m2)::BIGINT AS c2,
                     (SELECT count(*) FROM m3)::BIGINT AS c3,
                     (SELECT count(*) FROM m4)::BIGINT AS c4
            )
            SELECT 1::INT AS step, 'signup' AS step_name,
                   c1 AS n_reached, 1.0::DOUBLE AS conversion FROM c
            UNION ALL
            SELECT 2::INT, 'view', c2,
                   round(c2::DOUBLE / nullif(c1, 0), 6) FROM c
            UNION ALL
            SELECT 3::INT, 'click', c3,
                   round(c3::DOUBLE / nullif(c2, 0), 6) FROM c
            UNION ALL
            SELECT 4::INT, 'purchase', c4,
                   round(c4::DOUBLE / nullif(c3, 0), 6) FROM c
        """,
        # interval containment (half-open [start, end)) — the oracle
        # states the naive range join; the Spark side must reproduce it
        # through the bucketed equi-join
        "q_range_join": """
            WITH iv AS (
              SELECT user_id, ts AS start_ts,
                     ts + INTERVAL 6 HOUR AS end_ts,
                     event_id AS iv_id
              FROM events WHERE event_id % 29 = 0
            )
            SELECT e.event_id, iv.iv_id
            FROM events e JOIN iv ON e.user_id = iv.user_id
             AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
        """,
        "q_seq_ngrams": """
            WITH t AS (
              SELECT event_type AS r0,
                     lead(event_type, 1) OVER w AS r1,
                     lead(event_type, 2) OVER w AS r2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            )
            SELECT r0 || '>' || r1 || '>' || r2 AS pattern,
                   count(*)::BIGINT AS n_occurrences
            FROM t
            WHERE r0 IS NOT NULL AND r1 IS NOT NULL AND r2 IS NOT NULL
            GROUP BY 1
        """,
        "q_context_windows": """
            WITH t AS (
              SELECT user_id::VARCHAR AS conv_id, event_id::INT AS turn_idx,
                     event_type || ' msg ' || event_id::VARCHAR AS text
              FROM events
            ), w AS (
              SELECT conv_id, turn_idx,
                     count(*) OVER win AS n,
                     array_to_string(list(text) OVER win, '|')
                       AS window_text
              FROM t
              WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
            )
            SELECT conv_id, turn_idx, window_text FROM w WHERE n = 3
        """,
        # brute-force all-pairs exact Jaccard on bigram shingles — the
        # prefix-filtered Spark plan must return the IDENTICAL pair set
        # (exactness is the operator's contract: no LSH recall loss)
        "q_setsim_exact": """
            WITH tok AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(w) >= 2 THEN
                  list_transform(generate_series(0, len(w) - 2),
                    i -> array_to_string(w[i+1:i+2], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS toks
              FROM tok
            ), ne AS (SELECT * FROM sh WHERE len(toks) > 0)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE /
                    (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
                    (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))) >= 0.5
        """,
        # cell-for-cell replay of the Bloom filter arithmetic (60-bit
        # md5 positions mod 2^20, k=5, int64 words; DuckDB raises on
        # 1::BIGINT << 63 where Spark wraps — the sign bit is spelled
        # out).  Slice-merge on the Spark side vs single-pass here:
        # equality IS the mergeability proof (same contract as
        # q_cms_heavy / q_quantile_sketch).
        "q_bloom_decontam": """
            WITH tok AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '') AS w
              FROM documents
            ), shl AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(w) >= 3 THEN
                  list_transform(generate_series(0, len(w) - 3),
                    i -> array_to_string(w[i+1:i+3], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS toks
              FROM tok
            ), sh AS (
              SELECT doc_id, unnest(toks) AS tok FROM shl
            ), bench AS (
              SELECT DISTINCT tok FROM sh WHERE doc_id % 10 = 0
            ), bpos AS (
              SELECT ('0x' || substr(md5(tok || ':' || i), 1, 15))::BIGINT
                     % 1048576 AS p
              FROM bench, range(5) r(i)
            ), words AS (
              SELECT p // 64 AS word_idx,
                bit_or(CASE WHEN p % 64 = 63 THEN -9223372036854775808
                       ELSE 1::BIGINT << (p % 64)::INT END) AS word
              FROM bpos GROUP BY 1
            ), probes AS (
              SELECT DISTINCT tok FROM sh WHERE doc_id % 10 <> 0
            ), pp AS (
              SELECT tok,
                ('0x' || substr(md5(tok || ':' || i), 1, 15))::BIGINT
                % 1048576 AS p
              FROM probes, range(5) r(i)
            ), hits AS (
              SELECT pp.tok,
                CASE WHEN (coalesce(w.word, 0) &
                  (CASE WHEN pp.p % 64 = 63 THEN -9223372036854775808
                   ELSE 1::BIGINT << (pp.p % 64)::INT END)) <> 0
                THEN 1 ELSE 0 END AS hit
              FROM pp LEFT JOIN words w ON pp.p // 64 = w.word_idx
            ), verd AS (
              SELECT tok, (sum(hit) = 5) AS might_contain
              FROM hits GROUP BY tok
            )
            SELECT s.doc_id,
              count(*)::BIGINT AS n_shingles,
              sum(CASE WHEN v.might_contain THEN 1 ELSE 0 END)::BIGINT
                AS n_flagged
            FROM sh s JOIN verd v USING (tok)
            WHERE s.doc_id % 10 <> 0
            GROUP BY s.doc_id
        """,
        # LOCF via ASOF join (greatest observed bucket <= grid bucket)
        # — an independent formulation of the Spark side's
        # last(ignorenulls) running window
        "q_resample_locf": """
            WITH obs AS (
              -- last value per bucket, (ts, event_id)-deterministic
              -- (DuckDB max_by has no composite order key)
              SELECT event_type, b, v FROM (
                SELECT event_type,
                       (epoch_ms(ts) // 1000) // 3600 AS b,
                       value AS v,
                       row_number() OVER (
                         PARTITION BY event_type,
                                      (epoch_ms(ts) // 1000) // 3600
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
            ), span AS (
              SELECT event_type, min(b) AS lo, max(b) AS hi
              FROM obs GROUP BY 1
            ), grid AS (
              SELECT event_type, unnest(generate_series(lo, hi)) AS b
              FROM span
            )
            SELECT g.event_type,
              strftime(to_timestamp(g.b * 3600),
                       '%Y-%m-%d %H:%M:%S') AS bucket_start,
              o2.v AS value,
              (o.b IS NOT NULL) AS is_observed
            FROM grid g
            LEFT JOIN obs o
              ON g.event_type = o.event_type AND g.b = o.b
            ASOF LEFT JOIN obs o2
              ON g.event_type = o2.event_type AND g.b >= o2.b
        """,
        # per-column profile: one literal SELECT per column, dtype
        # strings pinned to Spark's names; float extrema via %.6f
        # printf, timestamps via %f microseconds (both sides 6 dp)
        "q_profile": """
            SELECT 'event_id' AS column, 'bigint' AS dtype,
                   count(*) AS n_rows,
                   count(*) - count(event_id) AS n_nulls,
                   count(DISTINCT event_id) AS n_distinct,
                   CAST(min(event_id) AS VARCHAR) AS min_value,
                   CAST(max(event_id) AS VARCHAR) AS max_value
            FROM events
            UNION ALL
            SELECT 'ts', 'timestamp_ntz', count(*),
                   count(*) - count(ts), count(DISTINCT ts),
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f'),
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f')
            FROM events
            UNION ALL
            SELECT 'user_id', 'bigint', count(*),
                   count(*) - count(user_id), count(DISTINCT user_id),
                   CAST(min(user_id) AS VARCHAR),
                   CAST(max(user_id) AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'event_type', 'string', count(*),
                   count(*) - count(event_type),
                   count(DISTINCT event_type),
                   min(event_type), max(event_type)
            FROM events
            UNION ALL
            SELECT 'value', 'double', count(*),
                   count(*) - count(value), count(DISTINCT value),
                   printf('%.6f', min(value)), printf('%.6f', max(value))
            FROM events
        """,
        "q_json_schema": """
            WITH src AS (
                SELECT CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN '{"k":' || CAST(event_id % 100 AS VARCHAR)
                        || ',"tags":["' || event_type
                        || '"],"meta":{"u":' || CAST(user_id % 50 AS VARCHAR)
                        || ',"src":"' || event_type || '"}}'
                    WHEN 1 THEN '{"k":"' || CAST(event_id % 100 AS VARCHAR)
                        || '","flag":true}'
                    WHEN 2 THEN '{"k":' || CAST(event_id % 100 AS VARCHAR)
                        || ',"score":1.5,"meta":{"u":null}}'
                    ELSE '{"k":'
                END AS j
                FROM events
            ),
            parsed AS (
                -- TRY_CAST: malformed text -> NULL json (never errors,
                -- unlike ::JSON inside a lateral which runs pre-WHERE)
                SELECT TRY_CAST(j AS JSON) AS jj FROM src
            ),
            root AS (
                SELECT '$' AS path,
                       CASE WHEN jj IS NULL THEN 'malformed'
                            ELSE json_type(jj) END AS t
                FROM parsed
            ),
            lvl1 AS (
                -- json_keys(NULL) is NULL -> unnest yields zero rows,
                -- so malformed/non-object roots never reach here
                -- COALESCE: the path-addressed json_type returns SQL
                -- NULL (not 'NULL') for JSON null members
                SELECT jj, '$.' || k AS path,
                       COALESCE(json_type(jj, '$.' || k), 'NULL') AS t,
                       '$.' || k AS jpath
                FROM parsed, unnest(json_keys(jj)) AS u(k)
            ),
            lvl2 AS (
                SELECT l.jpath || '.' || k2 AS path,
                       COALESCE(
                           json_type(l.jj, l.jpath || '.' || k2), 'NULL'
                       ) AS t
                FROM lvl1 l, unnest(json_keys(l.jj, l.jpath)) AS u(k2)
                WHERE l.t = 'OBJECT'
            ),
            hist AS (
                SELECT path, t FROM root
                UNION ALL SELECT path, t FROM lvl1
                UNION ALL SELECT path, t FROM lvl2
            ),
            norm AS (
                SELECT path,
                       CASE t WHEN 'VARCHAR' THEN 'string'
                              WHEN 'BIGINT' THEN 'int'
                              WHEN 'UBIGINT' THEN 'int'
                              WHEN 'DOUBLE' THEN 'float'
                              WHEN 'BOOLEAN' THEN 'bool'
                              WHEN 'NULL' THEN 'null'
                              WHEN 'OBJECT' THEN 'object'
                              WHEN 'ARRAY' THEN 'array'
                              WHEN 'malformed' THEN 'malformed'
                              ELSE 'other' END AS vtype
                FROM hist
            )
            SELECT path, vtype, count(*) AS n,
                   round(CAST(count(*) AS DOUBLE)
                         / (SELECT count(*) FROM src), 6) AS frac
            FROM norm
            GROUP BY path, vtype
        """,
        "q_sq8_topk": """
            WITH expl AS (
                SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x
                FROM embeddings
            ),
            sc AS (
                -- global symmetric scale: max is order-independent and
                -- exact, so the one division yields the identical
                -- double on any engine
                SELECT max(abs(CAST(x AS DOUBLE))) / 127.0 AS s FROM expl
            ),
            codes AS (
                -- identical IEEE-double op order as _sq8_code
                SELECT vec_id, pos,
                       GREATEST(-127, LEAST(127, CAST(FLOOR(
                           CAST(x AS DOUBLE) / s + 0.5
                       ) AS INT))) AS c
                FROM expl, sc
            ),
            qcodes AS (
                SELECT pos, c AS qc FROM codes WHERE vec_id = 0
            ),
            scores AS (
                SELECT codes.vec_id AS vec_id,
                       CAST(SUM(CAST(c AS BIGINT) * CAST(qc AS BIGINT))
                            AS BIGINT) AS qdot
                FROM codes JOIN qcodes USING (pos)
                GROUP BY codes.vec_id
            )
            SELECT vec_id, qdot FROM scores
            ORDER BY qdot DESC, vec_id
            LIMIT 10
        """,
        "q_json_drift": """
            WITH src AS (
                SELECT CAST(event_id % 2 AS INT) AS half,
                       CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN '{"k":' || CAST(event_id % 100 AS VARCHAR)
                        || ',"tags":["' || event_type
                        || '"],"meta":{"u":' || CAST(user_id % 50 AS VARCHAR)
                        || ',"src":"' || event_type || '"}}'
                    WHEN 1 THEN '{"k":"' || CAST(event_id % 100 AS VARCHAR)
                        || '","flag":true}'
                    WHEN 2 THEN '{"k":' || CAST(event_id % 100 AS VARCHAR)
                        || ',"score":1.5,"meta":{"u":null}}'
                    ELSE '{"k":'
                END AS j
                FROM events
            ),
            parsed AS (
                SELECT half, TRY_CAST(j AS JSON) AS jj FROM src
            ),
            root AS (
                SELECT half, '$' AS path,
                       CASE WHEN jj IS NULL THEN 'malformed'
                            ELSE json_type(jj) END AS t
                FROM parsed
            ),
            lvl1 AS (
                SELECT half, jj, '$.' || k AS path,
                       COALESCE(json_type(jj, '$.' || k), 'NULL') AS t,
                       '$.' || k AS jpath
                FROM parsed, unnest(json_keys(jj)) AS u(k)
            ),
            lvl2 AS (
                SELECT half, l.jpath || '.' || k2 AS path,
                       COALESCE(
                           json_type(l.jj, l.jpath || '.' || k2), 'NULL'
                       ) AS t
                FROM lvl1 l, unnest(json_keys(l.jj, l.jpath)) AS u(k2)
                WHERE l.t = 'OBJECT'
            ),
            hist AS (
                SELECT half, path, t FROM root
                UNION ALL SELECT half, path, t FROM lvl1
                UNION ALL SELECT half, path, t FROM lvl2
            ),
            norm AS (
                SELECT half, path,
                       CASE t WHEN 'VARCHAR' THEN 'string'
                              WHEN 'BIGINT' THEN 'int'
                              WHEN 'UBIGINT' THEN 'int'
                              WHEN 'DOUBLE' THEN 'float'
                              WHEN 'BOOLEAN' THEN 'bool'
                              WHEN 'NULL' THEN 'null'
                              WHEN 'OBJECT' THEN 'object'
                              WHEN 'ARRAY' THEN 'array'
                              WHEN 'malformed' THEN 'malformed'
                              ELSE 'other' END AS vtype
                FROM hist
            ),
            tot AS (
                SELECT half, count(*) AS n FROM src GROUP BY half
            ),
            fr AS (
                SELECT c.half, c.path, c.vtype,
                       round(CAST(c.n AS DOUBLE) / t.n, 6) AS frac
                FROM (
                    SELECT half, path, vtype, count(*) AS n
                    FROM norm GROUP BY half, path, vtype
                ) c JOIN tot t ON c.half = t.half
            )
            SELECT COALESCE(o.path, nw.path) AS path,
                   COALESCE(o.vtype, nw.vtype) AS vtype,
                   COALESCE(o.frac, -1.0) AS old_frac,
                   COALESCE(nw.frac, -1.0) AS new_frac,
                   CASE WHEN o.frac IS NULL THEN 'added'
                        WHEN nw.frac IS NULL THEN 'removed'
                        WHEN o.frac = nw.frac THEN 'same'
                        ELSE 'shifted' END AS status
            FROM (SELECT * FROM fr WHERE half = 0) o
            FULL OUTER JOIN (SELECT * FROM fr WHERE half = 1) nw
              ON o.path = nw.path AND o.vtype = nw.vtype
        """,
        # identical HTML shell built from documents, then the identical
        # strip algebra: script/style/comment/tag regex passes (RE2 ==
        # the Java∩RE2 subset the Spark side uses), one-level entity
        # decode with &amp; LAST, whitespace collapse.
        "q_html_text": r"""
            WITH shell AS (
              SELECT doc_id AS id,
                '<html><head><title>Doc ' || doc_id ||
                '</title><style>p{color:red}</style></head><body>' ||
                CASE
                  WHEN doc_id % 4 = 0 THEN
                    '<!-- hidden --><h1>' || source || ' &amp; more</h1><p>'
                    || substr(text, 1, 60) || '</p>'
                  WHEN doc_id % 4 = 1 THEN
                    '<script>var a="' || lang || '";</script><p>'
                    || substr(text, 1, 60) || '</p><a href="/d/' || doc_id
                    || '">next</a>'
                  WHEN doc_id % 4 = 2 THEN
                    '<div' || chr(10) || 'class="x">' || substr(text, 1, 60)
                    || '&nbsp;&quot;' || lang
                    || '&quot; &amp;lt;esc&amp;gt;</div>'
                  ELSE substr(text, 1, 60)
                END || '</body></html>' AS html
              FROM documents
            ), t AS (
              SELECT id, html,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(
                    regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(html,
                        '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                      '(?s)<!--.*?-->', ' ', 'g'),
                      '(?s)<[^>]*>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
                  '\s+', ' ', 'g')) AS text
              FROM shell
            )
            SELECT id,
              len(regexp_extract_all(html, '(?s)<[a-zA-Z!/][^>]*>'))::BIGINT
                AS n_tags,
              len(regexp_extract_all(html, '(?i)<a\b'))::BIGINT AS n_links,
              len(regexp_extract_all(html, '(?i)<script\b'))::BIGINT
                AS n_scripts,
              len(html)::INT AS html_chars,
              len(text)::INT AS text_chars,
              round(len(text)::DOUBLE / greatest(len(html), 1), 6)
                AS text_ratio,
              text
            FROM t
        """,
        # identical URL construction from events, then the identical
        # canonicalization algebra (case-fold, userinfo/default-port/
        # fragment strip, path collapse, tracking-param drop, param
        # sort, schemeless -> NULL), then the dedup groupBy.
        "q_url_canon": r"""
            WITH raw AS (
              SELECT event_id AS doc_id,
                CASE event_id % 7
                  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/p/'
                    || (event_id % 40) || '/?utm_source=x&b=2&a='
                    || (user_id % 3) || '#f'
                  WHEN 1 THEN 'https://example.com:8443/a//b?gclid=z&q='
                    || (event_id % 40)
                  WHEN 2 THEN 'http://Example.com/p/' || (event_id % 40)
                    || '?a=' || (user_id % 3)
                  WHEN 3 THEN 'https://u:p@Sub.Example.com/p/'
                    || (event_id % 40) || '/'
                  WHEN 4 THEN 'ftp://files.example.com/x/' || (event_id % 40)
                  WHEN 5 THEN 'example.com/skip/' || (event_id % 40)
                  ELSE 'https://example.com/p/' || (event_id % 40)
                    || '?b=2&utm_medium=m&a=' || (user_id % 3)
                END AS url
              FROM events
            ), s2 AS (
              SELECT doc_id,
                lower(regexp_extract(trim(url),
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(trim(url),
                  '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
              FROM raw
            ), s3 AS (
              SELECT doc_id, scheme,
                regexp_replace(regexp_extract(rest, '^([^/?#]*)', 1),
                  '^[^@]*@', '') AS hostport,
                regexp_replace(rest, '^[^/?#]*', '') AS pathqf
              FROM s2
            ), s4 AS (
              SELECT doc_id, scheme,
                lower(regexp_replace(hostport, ':[0-9]*$', '')) AS host,
                regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
                regexp_replace(regexp_extract(pathqf, '^([^?#]*)', 1),
                  '//+', '/', 'g') AS cpath,
                regexp_extract(pathqf, '^[^?#]*\?([^#]*)', 1) AS query
              FROM s3
            ), s5 AS (
              SELECT doc_id, scheme, host,
                CASE WHEN port <> '' AND NOT
                  (scheme || ':' || port IN ('http:80', 'https:443'))
                  THEN ':' || port ELSE '' END AS portpart,
                CASE WHEN cpath = '' THEN '/'
                     WHEN len(cpath) > 1 AND cpath LIKE '%/'
                       THEN substr(cpath, 1, len(cpath) - 1)
                     ELSE cpath END AS path,
                array_to_string(list_sort(list_filter(
                  string_split(query, '&'),
                  p -> p <> '' AND NOT regexp_matches(p,
                    '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='
                  ))), '&') AS qs
              FROM s4
            ), canon AS (
              SELECT doc_id,
                CASE WHEN scheme = '' THEN NULL
                     ELSE scheme || '://' || host || portpart || path ||
                       CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                END AS canon_url
              FROM s5
            )
            SELECT canon_url, count(*)::BIGINT AS n_docs,
                   min(doc_id) AS keeper_id
            FROM canon WHERE canon_url IS NOT NULL
            GROUP BY canon_url
        """,
        # same QI grouping + exact distinct over the floor-bucketed
        # sensitive band; DuckDB count(*) is BIGINT like Spark's.
        "q_kanon": """
            SELECT event_type,
                   user_id % 20 AS user_bucket,
                   count(*)::BIGINT AS group_size,
                   count(DISTINCT floor(value)::BIGINT % 5)::BIGINT
                     AS n_sensitive,
                   count(*) >= 5 AS k_anonymous,
                   count(DISTINCT floor(value)::BIGINT % 5) >= 3 AS l_diverse
            FROM events
            GROUP BY event_type, user_id % 20
        """,
        # identical vote construction; winner via QUALIFY with the
        # (count DESC, label ASC) deterministic tie-break.
        "q_label_agg": """
            WITH votes AS (
              SELECT event_id % 250 AS item,
                     'ann' || (user_id % 7) AS annotator,
                     event_type AS label
              FROM events
            ), counts AS (
              SELECT item, label, count(*)::BIGINT AS cnt
              FROM votes GROUP BY item, label
            ), tot AS (
              SELECT item, sum(cnt)::BIGINT AS n_annotations,
                     count(*)::BIGINT AS n_labels
              FROM counts GROUP BY item
            )
            SELECT c.item, t.n_annotations, t.n_labels,
                   c.label AS majority_label, c.cnt AS majority_n,
                   round(c.cnt::DOUBLE / t.n_annotations, 6) AS agreement
            FROM counts c JOIN tot t USING (item)
            QUALIFY row_number() OVER (
              PARTITION BY c.item ORDER BY c.cnt DESC, c.label ASC) = 1
        """,
        # identical md5-derived integer planes + the identical JL scale
        # formula; list_dot_product folds left-to-right like Spark's
        # sequential aggregate (the q_embed_neardup-proven pairing).
        "q_rand_proj": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), p AS (
              SELECT j, list_transform(generate_series(0, 63), d ->
                (('0x' || substr(md5('jl:' || (5000 + j) || ':' || d),
                   1, 15))::BIGINT % 2001 - 1000)::DOUBLE) AS plane
              FROM range(8) t(j)
            )
            SELECT vec_id, j::INT AS proj_idx,
                   round(list_dot_product(v, plane) *
                     (1.0 / (sqrt(8.0) *
                             sqrt((2001.0 * 2001.0 - 1.0) / 12.0))), 6)
                     AS val
            FROM e, p
        """,
        # identical one-permutation md5 signatures (the q_minhash_lsh
        # algebra), split even=corpus / odd=new, banded asymmetric
        # join, signature-agreement estimate, best-match QUALIFY with
        # the (est DESC, corpus_id ASC) tie-break, LEFT join back so
        # collision-free new docs keep a (NULL, false) verdict.
        "q_incr_dedup": f"""
            WITH toks AS (
              SELECT doc_id,
                unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents
            ), digs AS (
              SELECT doc_id, md5('g0|' || tok) AS d0, md5('g1|' || tok) AS d1
              FROM toks
            ), sigs AS (
              SELECT doc_id, {', '.join(mh_slices)} FROM digs GROUP BY doc_id
            ), nsig AS (
              SELECT * FROM sigs WHERE doc_id % 2 = 1
            ), csig AS (
              SELECT * FROM sigs WHERE doc_id % 2 = 0
            ), nb AS (
              SELECT doc_id AS new_id, 0 AS band_id,
                     md5(mh_0 || '|' || mh_1) AS band_key FROM nsig
              UNION ALL SELECT doc_id, 1, md5(mh_2 || '|' || mh_3) FROM nsig
              UNION ALL SELECT doc_id, 2, md5(mh_4 || '|' || mh_5) FROM nsig
              UNION ALL SELECT doc_id, 3, md5(mh_6 || '|' || mh_7) FROM nsig
            ), cb AS (
              SELECT doc_id AS corpus_id, 0 AS band_id,
                     md5(mh_0 || '|' || mh_1) AS band_key FROM csig
              UNION ALL SELECT doc_id, 1, md5(mh_2 || '|' || mh_3) FROM csig
              UNION ALL SELECT doc_id, 2, md5(mh_4 || '|' || mh_5) FROM csig
              UNION ALL SELECT doc_id, 3, md5(mh_6 || '|' || mh_7) FROM csig
            ), cands AS (
              SELECT DISTINCT new_id, corpus_id
              FROM nb JOIN cb USING (band_id, band_key)
            ), est AS (
              SELECT new_id, corpus_id,
                round(((n.mh_0 = c.mh_0)::INT + (n.mh_1 = c.mh_1)::INT
                     + (n.mh_2 = c.mh_2)::INT + (n.mh_3 = c.mh_3)::INT
                     + (n.mh_4 = c.mh_4)::INT + (n.mh_5 = c.mh_5)::INT
                     + (n.mh_6 = c.mh_6)::INT + (n.mh_7 = c.mh_7)::INT)
                     / 8.0, 6) AS est_jaccard
              FROM cands
              JOIN nsig n ON n.doc_id = cands.new_id
              JOIN csig c ON c.doc_id = cands.corpus_id
            ), best AS (
              SELECT * FROM est
              QUALIFY row_number() OVER (
                PARTITION BY new_id
                ORDER BY est_jaccard DESC, corpus_id ASC) = 1
            )
            SELECT d.doc_id AS new_id, b.corpus_id AS best_corpus_id,
                   b.est_jaccard,
                   coalesce(b.est_jaccard >= 0.5, false) AS is_dup
            FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
            LEFT JOIN best b ON b.new_id = d.doc_id
        """,
        # identical feed construction, token blocking with the same
        # per-side df<=40 stop-token rule, Jaccard + exact-field
        # agreement, (2*jac + n_exact)/4 score, same verdict cuts on
        # the ROUNDED score.
        "q_link_records": """
            WITH lrec AS (
              SELECT doc_id AS rec_id,
                array_to_string((string_split(text, ' '))[1:3], ' ') AS name,
                source AS city,
                (1970 + n_chars % 30)::INT AS year
              FROM documents WHERE doc_id % 2 = 0
            ), rrec AS (
              SELECT doc_id AS rec_id,
                array_to_string(list_reverse((string_split(text, ' '))[1:3]),
                                ' ') AS name,
                source AS city,
                (1970 + n_chars % 30
                 + CASE WHEN doc_id % 12 = 6 THEN 1 ELSE 0 END)::INT AS year
              FROM documents WHERE doc_id % 3 = 0
            ), ltok AS (
              SELECT rec_id AS left_id,
                list_distinct(list_filter(
                  string_split_regex(lower(name), '[^a-z0-9]+'),
                  x -> x <> '')) AS toks
              FROM lrec
            ), rtok AS (
              SELECT rec_id AS right_id,
                list_distinct(list_filter(
                  string_split_regex(lower(name), '[^a-z0-9]+'),
                  x -> x <> '')) AS toks
              FROM rrec
            ), lx AS (
              SELECT left_id, unnest(toks) AS tok FROM ltok
            ), rx AS (
              SELECT right_id, unnest(toks) AS tok FROM rtok
            ), lok AS (
              SELECT tok FROM lx GROUP BY tok HAVING count(*) <= 40
            ), rok AS (
              SELECT tok FROM rx GROUP BY tok HAVING count(*) <= 40
            ), ok AS (
              SELECT lok.tok FROM lok JOIN rok ON lok.tok = rok.tok
            ), cands AS (
              SELECT DISTINCT lx.left_id, rx.right_id
              FROM lx JOIN ok ON lx.tok = ok.tok
              JOIN rx ON rx.tok = lx.tok
            ), scored AS (
              SELECT c.left_id, c.right_id,
                len(list_intersect(lt.toks, rt.toks))::DOUBLE /
                  greatest(len(lt.toks) + len(rt.toks)
                           - len(list_intersect(lt.toks, rt.toks)), 1)
                  AS jac,
                -- null-safe-0 agreement (mirrors eqNullSafe & isNotNull:
                -- agree only when BOTH sides are non-null and equal;
                -- TRUE AND NULL would otherwise poison n_exact/score)
                ((CASE WHEN ll.city IS NOT NULL AND rr.city IS NOT NULL
                        AND ll.city = rr.city THEN 1 ELSE 0 END)
                 + (CASE WHEN ll.year IS NOT NULL AND rr.year IS NOT NULL
                        AND ll.year = rr.year THEN 1 ELSE 0 END))
                  AS n_exact
              FROM cands c
              JOIN ltok lt ON lt.left_id = c.left_id
              JOIN rtok rt ON rt.right_id = c.right_id
              JOIN lrec ll ON ll.rec_id = c.left_id
              JOIN rrec rr ON rr.rec_id = c.right_id
            )
            SELECT left_id, right_id,
              round(jac, 6) AS name_jaccard,
              n_exact::INT AS n_exact,
              round((2.0 * jac + n_exact) / 4.0, 6) AS score,
              CASE WHEN round((2.0 * jac + n_exact) / 4.0, 6) >= 0.75
                     THEN 'match'
                   WHEN round((2.0 * jac + n_exact) / 4.0, 6) >= 0.5
                     THEN 'possible'
                   ELSE 'non_match' END AS verdict
            FROM scored
        """,
        # identical perturbations, identical normalization algebra
        # (lower / translate accent fold / digit fold / punct strip /
        # whitespace collapse), hashed per row.
        "q_normalize": f"""
            WITH pert AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN upper(text)
                     WHEN doc_id % 3 = 1 THEN text || ' 42'
                     ELSE translate(text, 'ae', 'áé') END AS t
              FROM documents
            ), norm AS (
              SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(
                  translate(lower(t), '{_ACCENT_SRC}', '{_ACCENT_DST}'),
                  '[0-9]', '0', 'g'),
                  '[^a-z0 ]+', ' ', 'g'),
                  '\\s+', ' ', 'g')) AS n
              FROM pert
            )
            SELECT doc_id, md5(n) AS norm_hash, len(n)::INT AS n_chars
            FROM norm
        """,
        # identical skew report algebra on the compact counts frame;
        # log2 ULP noise is absorbed by the 6-dp round on both sides.
        "q_key_skew": """
            WITH counts AS (
              SELECT event_type, count(*)::BIGINT AS cnt
              FROM events GROUP BY event_type
            ), summary AS (
              SELECT sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
                     max(cnt) AS mx,
                     sum(cnt::DOUBLE * log2(cnt::DOUBLE)) AS s
              FROM counts
            ), top AS (
              SELECT event_type, cnt,
                row_number() OVER (ORDER BY cnt DESC, event_type ASC)
                  AS rank
              FROM counts
              QUALIFY rank <= 5
            ), tshare AS (
              SELECT sum(cnt)::DOUBLE AS ts FROM top
            )
            SELECT event_type, cnt,
              round(cnt::DOUBLE / n_rows, 6) AS share,
              rank::INT AS rank, n_rows, n_keys,
              round(mx::DOUBLE / (n_rows::DOUBLE / n_keys), 6) AS skew_ratio,
              round(ts / n_rows, 6) AS top_share,
              round(log2(n_rows::DOUBLE) - s / n_rows::DOUBLE, 6) AS entropy,
              round(log2(n_keys::DOUBLE), 6) AS entropy_max
            FROM top, summary, tshare
        """,
        # the q_embed_neardup CTE machinery (same planes, same cap=200,
        # same rounded cosine), then the [lo, hi) band, both pair
        # orientations, and the per-anchor QUALIFY top-5 with the
        # (cos DESC, id ASC) tie-break.
        "q_hard_neg": f"""
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), b AS (
              {band_rows}
            ), capped AS (
              SELECT vec_id, band_id, bucket FROM (
                SELECT *, row_number() OVER (PARTITION BY band_id, bucket
                                             ORDER BY vec_id) AS rn FROM b
              ) WHERE rn <= 200
            ), pairs AS (
              SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
              FROM capped a JOIN capped c USING (band_id, bucket)
              WHERE a.vec_id < c.vec_id
            ), scored AS (
              SELECT id_a, id_b,
                round(list_dot_product(ea.v, eb.v) /
                      (sqrt(list_dot_product(ea.v, ea.v)) *
                       sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
              FROM pairs
              JOIN e ea ON ea.vec_id = pairs.id_a
              JOIN e eb ON eb.vec_id = pairs.id_b
            ), banded AS (
              SELECT * FROM scored
              WHERE cos_sim >= 0.1 AND cos_sim < 0.9
            ), both_dir AS (
              SELECT id_a AS anchor_id, id_b AS negative_id, cos_sim
              FROM banded
              UNION ALL
              SELECT id_b, id_a, cos_sim FROM banded
            )
            SELECT anchor_id, negative_id, cos_sim, rank::INT AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY anchor_id
                ORDER BY cos_sim DESC, negative_id ASC) AS rank
              FROM both_dir
            ) WHERE rank <= 5
        """,
        # identical NULL injection + rule algebra; fail-closed NULL
        # predicates, and the uniqueness count mirrors Spark's
        # skip-any-null COUNT DISTINCT via a CASE-nulled tuple.
        "q_validate": """
            WITH ev AS (
              SELECT event_id, ts, user_id, value,
                CASE WHEN event_id % 100 = 0 THEN NULL
                     ELSE event_type END AS event_type
              FROM events
            ), agg AS (
              SELECT count(*)::BIGINT AS n,
                sum(CASE WHEN coalesce(value >= 0, false)
                    THEN 0 ELSE 1 END)::BIGINT AS v0,
                sum(CASE WHEN coalesce(value < 400, false)
                    THEN 0 ELSE 1 END)::BIGINT AS v1,
                sum(CASE WHEN coalesce(event_type IN
                    ('click','error','purchase','signup','view'), false)
                    THEN 0 ELSE 1 END)::BIGINT AS v2,
                sum(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END)::BIGINT
                  AS v3,
                (count(*) - count(DISTINCT event_id))::BIGINT AS v4,
                (count(*) - count(DISTINCT
                  CASE WHEN user_id IS NOT NULL AND event_type IS NOT NULL
                       THEN (user_id, event_type) END))::BIGINT AS v5
              FROM ev
            ), rules AS (
              SELECT * FROM (VALUES
                (0, 'value_nonneg'), (1, 'value_below_400'),
                (2, 'type_known'), (3, 'ts_not_null'),
                (4, 'unique:event_id'),
                (5, 'unique:user_id,event_type')) r(i, rule)
            ), vals AS (
              SELECT rule, n,
                CASE i WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2
                       WHEN 3 THEN v3 WHEN 4 THEN v4 ELSE v5 END AS nv
              FROM rules, agg
            )
            SELECT rule, n AS n_rows, nv AS n_violations,
              round(nv::DOUBLE / greatest(n, 1), 6) AS frac_violated,
              nv = 0 AS passed
            FROM vals
        """,
        # identical tokenizer, adjacent bigrams via index series,
        # occurrence-margin PMI, min_count floor; log2 on both sides,
        # 6-dp round.
        "q_pmi": """
            WITH wl AS (
              SELECT list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS w
              FROM documents
            ), uni AS (
              SELECT unnest(w) AS tok FROM wl
            ), un AS (
              SELECT tok, count(*)::BIGINT AS n_tok FROM uni GROUP BY tok
            ), bidx AS (
              SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM wl WHERE len(w) >= 2
            ), bg AS (
              SELECT w[i] AS w1, w[i + 1] AS w2,
                     count(*)::BIGINT AS n_pair
              FROM bidx GROUP BY w[i], w[i + 1]
            ), tot AS (
              SELECT (SELECT count(*) FROM uni)::BIGINT AS n_uni_total,
                     (SELECT count(*) FROM bidx)::BIGINT AS n_big_total
            )
            SELECT w1, w2, n_pair, a.n_tok AS n_w1, b.n_tok AS n_w2,
              round(log2(
                (n_pair::DOUBLE / n_big_total) /
                ((a.n_tok::DOUBLE / n_uni_total) *
                 (b.n_tok::DOUBLE / n_uni_total))), 6) AS pmi
            FROM bg
            JOIN un a ON a.tok = bg.w1
            JOIN un b ON b.tok = bg.w2
            CROSS JOIN tot
            WHERE n_pair >= 20
        """,
        # identical old/new construction; presence-tagged unit-separator
        # content hash (NULL never collides with '' or the tag), FULL
        # OUTER on the key, verdict groupBy.
        "q_snapshot_diff": """
            WITH base AS (
              SELECT event_id, user_id,
                CASE WHEN event_id % 13 = 0 THEN NULL
                     ELSE event_type END AS event_type,
                value
              FROM events
            ), old AS (
              SELECT event_id,
                md5(concat_ws(chr(31),
                  CASE WHEN user_id IS NULL THEN '0'
                       ELSE '1' || user_id::VARCHAR END,
                  CASE WHEN event_type IS NULL THEN '0'
                       ELSE '1' || event_type END,
                  CASE WHEN value IS NULL THEN '0'
                       ELSE '1' || value::VARCHAR END)) AS h
              FROM base WHERE event_id % 10 <> 0
            ), neww AS (
              SELECT event_id,
                md5(concat_ws(chr(31),
                  CASE WHEN user_id IS NULL THEN '0'
                       ELSE '1' || user_id::VARCHAR END,
                  CASE WHEN event_id % 11 = 0 OR event_type IS NULL
                       THEN '0' ELSE '1' || event_type END,
                  CASE WHEN value IS NULL THEN '0'
                       ELSE '1' || (CASE WHEN event_id % 7 = 0
                                    THEN value + 1 ELSE value
                                    END)::VARCHAR END)) AS h
              FROM base WHERE event_id % 9 <> 0
            ), verdict AS (
              SELECT CASE WHEN o.h IS NULL THEN 'added'
                          WHEN n.h IS NULL THEN 'removed'
                          WHEN o.h <> n.h THEN 'changed'
                          ELSE 'unchanged' END AS status
              FROM old o FULL OUTER JOIN neww n USING (event_id)
            )
            SELECT status, count(*)::BIGINT AS n_keys
            FROM verdict GROUP BY status
        """,
        # identical token-count derivation (k tokens per turn) and the
        # identical conv-partitioned running sum.
        "q_sft_spans": """
            WITH t AS (
              SELECT user_id AS conv, event_id AS turn,
                     event_type AS role,
                     (event_id % 9 + 1)::BIGINT AS n_tok
              FROM events
            )
            SELECT conv, turn, role,
              coalesce(sum(n_tok) OVER (
                PARTITION BY conv ORDER BY turn
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0)::BIGINT AS start_tok,
              (coalesce(sum(n_tok) OVER (
                PARTITION BY conv ORDER BY turn
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n_tok)::BIGINT AS end_tok,
              n_tok,
              role IN ('purchase', 'signup') AS loss_mask
            FROM t
        """,
        # identical bounded ROWS frame + (ts, event_id) order.
        "q_rolling": """
            SELECT event_type AS key,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
              event_id, value,
              round(avg(value) OVER w, 6) AS roll_mean,
              min(value) OVER w AS roll_min,
              max(value) OVER w AS roll_max,
              count(value) OVER w AS roll_n
            FROM events
            WINDOW w AS (
              PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        # identical double-precision bin arithmetic from the same
        # data-derived bounds.
        "q_histogram": """
            WITH b AS (
              SELECT min(value) AS lo, max(value) AS hi FROM events
            ), c AS (
              SELECT least(greatest(
                       floor((value - lo) / ((hi - lo) / 20.0)), 0),
                     19)::INT AS bin, lo, hi
              FROM events, b WHERE value IS NOT NULL
            ), g AS (
              SELECT bin, any_value(lo) AS lo, any_value(hi) AS hi,
                     count(*)::BIGINT AS n
              FROM c GROUP BY bin
            ), t AS (SELECT sum(n) AS tt FROM g)
            SELECT bin,
              round(lo + bin * ((hi - lo) / 20.0), 6) AS bin_lo,
              round(lo + (bin + 1) * ((hi - lo) / 20.0), 6) AS bin_hi,
              n, round(n::DOUBLE / tt, 6) AS frac
            FROM g, t
        """,
        # exact quantile thresholds (quantile_cont == F.percentile),
        # same clamp + flag algebra.
        "q_winsorize": """
            WITH th AS (
              SELECT quantile_cont(value, 0.01) AS lo,
                     quantile_cont(value, 0.99) AS hi
              FROM events
            )
            SELECT event_id, value,
              round(least(greatest(value, lo), hi), 6) AS value_w,
              (value < lo OR value > hi) AS is_clipped
            FROM events, th
        """,
        # unrolled 2-step replay: iter 1 from w=0 (p = 0.5 exactly, so
        # the quantized sums are pure integers), iter 2 through the
        # sigmoid; HALF-AWAY-FROM-ZERO rounding spelled out as
        # floor(|v|+0.5) to pin both engines to Spark's round().
        "q_logreg": """
            WITH f AS (
              SELECT list_transform(embedding[1:4], v -> v::DOUBLE) AS x,
                     CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS y
              FROM embeddings
            ), n AS (SELECT count(*)::BIGINT AS cnt FROM f
            ), c1 AS (
              SELECT j,
                (0.5 - y) * x[j] * 1048576.0 AS v
              FROM f, (SELECT unnest(generate_series(1, 4)) AS j)
            ), g1 AS (
              SELECT j, sum(CASE WHEN v >= 0 THEN floor(v + 0.5)
                            ELSE -floor(-v + 0.5) END)::BIGINT AS s
              FROM c1 GROUP BY j
            ), w1 AS (
              SELECT j, 0.0 - 0.5 * ((s / 1048576.0) / cnt) AS w
              FROM g1, n
            ), lw AS (
              SELECT list(w ORDER BY j) AS wv FROM w1
            ), c2 AS (
              SELECT j,
                ((1.0 / (1.0 + exp(-list_dot_product(x, wv)))) - y)
                  * x[j] * 1048576.0 AS v
              FROM f, lw, (SELECT unnest(generate_series(1, 4)) AS j)
            ), g2 AS (
              SELECT j, sum(CASE WHEN v >= 0 THEN floor(v + 0.5)
                            ELSE -floor(-v + 0.5) END)::BIGINT AS s
              FROM c2 GROUP BY j
            )
            SELECT (w1.j - 1)::INT AS pos,
              round(w1.w - 0.5 * ((g2.s / 1048576.0) / cnt), 6) AS weight
            FROM w1 JOIN g2 ON w1.j = g2.j, n
        """,
        # identical role->level map and window algebra (running
        # max-turn per level + running user count).
        "q_threads": """
            WITH t AS (
              SELECT user_id AS conv, event_id AS turn,
                CASE WHEN event_type IN ('click', 'view') THEN 'user'
                     WHEN event_type IN ('signup', 'purchase')
                       THEN 'assistant'
                     ELSE 'tool' END AS role
              FROM events
            ), l AS (
              SELECT conv, turn, role,
                CASE role WHEN 'user' THEN 0
                          WHEN 'assistant' THEN 1 ELSE 2 END AS level
              FROM t
            )
            SELECT conv, turn, role, level,
              sum(CASE WHEN level = 0 THEN 1 ELSE 0 END) OVER cur
                ::BIGINT AS thread_id,
              CASE WHEN level = 0 THEN NULL
                   WHEN level = 1 THEN
                     max(CASE WHEN level = 0 THEN turn END) OVER prev
                   ELSE coalesce(
                     max(CASE WHEN level = 1 THEN turn END) OVER prev,
                     max(CASE WHEN level = 0 THEN turn END) OVER prev)
              END AS parent_turn
            FROM l
            WINDOW
              prev AS (PARTITION BY conv ORDER BY turn
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              cur AS (PARTITION BY conv ORDER BY turn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        # identical histogram-product algebra with the (pairs DESC,
        # key ASC) top-10 cut.
        "q_join_size": """
            WITH lc AS (
              SELECT user_id % 30 AS ub, count(*)::BIGINT AS n_left
              FROM events WHERE event_id % 2 = 0 GROUP BY user_id % 30
            ), rc AS (
              SELECT user_id % 30 AS ub, count(*)::BIGINT AS n_right
              FROM events WHERE event_id % 2 = 1 GROUP BY user_id % 30
            ), prod AS (
              SELECT lc.ub, n_left, n_right,
                     n_left::DOUBLE * n_right::DOUBLE AS pairs
              FROM lc JOIN rc ON lc.ub = rc.ub
            ), summary AS (
              SELECT sum(pairs) AS total_pairs,
                     count(*)::BIGINT AS n_join_keys
              FROM prod
            ), top AS (
              SELECT *, row_number() OVER (ORDER BY pairs DESC, ub ASC)
                AS rank
              FROM prod QUALIFY rank <= 10
            ), ts AS (SELECT sum(pairs) AS tp FROM top)
            SELECT ub, n_left, n_right, pairs, rank::INT AS rank,
              total_pairs, n_join_keys,
              round(tp / greatest(total_pairs, 1.0), 6) AS top_frac
            FROM top, summary, ts
        """,
        # identical windowed next-fit-decreasing assignment: running
        # bytes before each file, integer-divided by the 2 MB target.
        "q_compaction": """
            WITH f AS (
              SELECT user_id % 4 AS part, event_id % 240 AS file_id,
                (count(*) * 1000 + sum(floor(value * 100)))::BIGINT
                  AS bytes
              FROM events GROUP BY 1, 2
            ), p AS (
              SELECT part, file_id, bytes,
                floor((sum(bytes) OVER (PARTITION BY part
                    ORDER BY bytes DESC, file_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - bytes) / 2000000.0)::BIGINT AS grp
              FROM f
            )
            SELECT part, file_id, bytes, grp,
              sum(bytes) OVER (PARTITION BY part, grp)::BIGINT
                AS grp_bytes,
              count(*) OVER (PARTITION BY part, grp)::BIGINT
                AS grp_files
            FROM p
        """,
        # same daily-file zone maps + disjoint-range skip test over
        # integer epoch seconds.
        "q_zonemap": """
            WITH k AS (
              SELECT floor(floor(epoch(ts)) / 86400)::BIGINT AS file_id,
                     floor(epoch(ts))::BIGINT AS v
              FROM events
            ), zm AS (
              SELECT file_id, min(v) AS min_v, max(v) AS max_v,
                     count(*)::BIGINT AS n_rows
              FROM k GROUP BY file_id
            ), fl AS (
              SELECT file_id, min_v, max_v, n_rows,
                (CASE WHEN max_v < 1704844800 OR min_v > 1705103999
                  THEN 1 ELSE 0 END)::INT AS skipped
              FROM zm
            ), t AS (
              SELECT sum(skipped)::BIGINT AS n_files_skipped,
                round(sum(n_rows * skipped)
                  / greatest(sum(n_rows), 1)::DOUBLE, 6)
                  AS skip_fraction
              FROM fl
            )
            SELECT file_id, min_v, max_v, n_rows, skipped,
                   n_files_skipped, skip_fraction
            FROM fl, t
        """,
        # identical per-partition running-max watermark over arrival
        # order with the same integer-second jitter.
        "q_late_events": """
            WITH t AS (
              SELECT user_id % 8 AS p, event_id AS arrival,
                floor(epoch(ts)) - (event_id % 37) * 60 AS tss
              FROM events
            ), fl AS (
              SELECT floor(tss / 3600)::BIGINT AS w,
                CASE WHEN max(tss) OVER (PARTITION BY p ORDER BY arrival
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - 600 > tss THEN 1 ELSE 0 END AS late
              FROM t
            ), g AS (
              SELECT w, sum(1 - late)::BIGINT AS n_on_time,
                     sum(late)::BIGINT AS n_late
              FROM fl GROUP BY w
            )
            SELECT strftime(to_timestamp(w * 3600),
                '%Y-%m-%d %H:%M:%S') AS window_start,
              n_on_time, n_late,
              round(n_late / greatest(n_on_time + n_late, 1)::DOUBLE, 6)
                AS late_fraction
            FROM g
        """,
        # identical clamped equi-width bins, epsilon smoothing, and
        # rounding points.
        "q_psi": """
            WITH b AS (
              SELECT least(greatest(floor(value / 50.0), 0), 9)::INT
                  AS bin,
                CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
              FROM events
            ), r AS (
              SELECT bin, count(*)::BIGINT AS n_ref
              FROM b WHERE is_ref = 1 GROUP BY bin
            ), c AS (
              SELECT bin, count(*)::BIGINT AS n_cur
              FROM b WHERE is_ref = 0 GROUP BY bin
            ), j AS (
              SELECT coalesce(r.bin, c.bin) AS bin,
                coalesce(n_ref, 0) AS n_ref,
                coalesce(n_cur, 0) AS n_cur
              FROM r FULL OUTER JOIN c ON r.bin = c.bin
            ), tr AS (SELECT sum(n_ref) AS t_ref FROM r),
            tc AS (SELECT sum(n_cur) AS t_cur FROM c),
            pb AS (
              SELECT bin, n_ref, n_cur,
                greatest(n_ref / greatest(t_ref, 1)::DOUBLE, 0.000001)
                  AS praw_ref,
                greatest(n_cur / greatest(t_cur, 1)::DOUBLE, 0.000001)
                  AS praw_cur
              FROM j, tr, tc
            ), o1 AS (
              SELECT bin, n_ref, n_cur,
                round(praw_ref, 6) AS p_ref,
                round(praw_cur, 6) AS p_cur,
                round((praw_cur - praw_ref) * ln(praw_cur / praw_ref),
                  6) AS contrib
              FROM pb
            ), tt AS (
              SELECT round(sum(contrib), 6) AS psi_total FROM o1
            )
            SELECT bin, n_ref, n_cur, p_ref, p_cur, contrib, psi_total
            FROM o1, tt
        """,
        # identical epoch-anchored weekly periods, per-key first
        # period, offset matrix, broadcast cohort sizes.
        "q_cohort": """
            WITH a AS (
              SELECT DISTINCT user_id AS k,
                floor(epoch(ts) / 604800)::BIGINT AS p
              FROM events
            ), f AS (SELECT k, min(p) AS c FROM a GROUP BY k),
            s AS (
              SELECT c, count(*)::BIGINT AS cohort_size FROM f GROUP BY c
            ), m AS (
              SELECT f.c, (a.p - f.c) AS off,
                count(*)::BIGINT AS n_active
              FROM a JOIN f USING (k)
              WHERE a.p - f.c <= 12 GROUP BY 1, 2
            )
            SELECT strftime(to_timestamp(m.c * 604800),
                '%Y-%m-%d %H:%M:%S') AS cohort_start,
              off::INT AS "offset", n_active, cohort_size,
              round(n_active / cohort_size::DOUBLE, 6) AS retention
            FROM m JOIN s ON m.c = s.c
        """,
        # identical lead-window transition pairs + row normalization.
        "q_transitions": """
            WITH t AS (
              SELECT event_type AS state,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY event_id) AS next_state
              FROM events
            ), p AS (
              SELECT state, next_state, count(*)::BIGINT AS n
              FROM t WHERE next_state IS NOT NULL GROUP BY 1, 2
            ), o AS (SELECT state, sum(n) AS tot FROM p GROUP BY state)
            SELECT p.state, next_state, n,
              round(n / tot::DOUBLE, 6) AS prob
            FROM p JOIN o ON p.state = o.state
        """,
        # identical double-ranked extremes with id tiebreaks and the
        # zero-margin drop.
        "q_pref_pairs": """
            WITH r AS (
              SELECT event_id % 2000 AS prompt_id, event_id AS resp_id,
                value::DOUBLE AS s
              FROM events
            ), w AS (
              SELECT prompt_id, resp_id, s,
                row_number() OVER (PARTITION BY prompt_id
                  ORDER BY s DESC, resp_id ASC) AS rb,
                row_number() OVER (PARTITION BY prompt_id
                  ORDER BY s ASC, resp_id ASC) AS rw
              FROM r
            ), g AS (
              SELECT prompt_id,
                max(CASE WHEN rb = 1 THEN resp_id END) AS chosen_id,
                max(CASE WHEN rb = 1 THEN s END) AS cs,
                max(CASE WHEN rw = 1 THEN resp_id END) AS rejected_id,
                max(CASE WHEN rw = 1 THEN s END) AS rs
              FROM w WHERE rb = 1 OR rw = 1 GROUP BY prompt_id
            )
            SELECT prompt_id, chosen_id, rejected_id,
              round(cs, 6) AS chosen_score,
              round(rs, 6) AS rejected_score,
              round(cs - rs, 6) AS margin
            FROM g WHERE cs > rs
        """,
        # identical duel construction and two 6dp-quantized MM
        # iterations over the reduced pair-count frame.
        "q_bradley_terry": """
            WITH seq AS (
              SELECT event_type AS a, lead(event_type) OVER w AS b,
                value AS va, lead(value) OVER w AS vb
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            ), d AS (
              SELECT CASE WHEN va > vb THEN a ELSE b END AS winner,
                CASE WHEN va > vb THEN b ELSE a END AS loser
              FROM seq
              WHERE b IS NOT NULL AND a <> b AND va <> vb
            ), dir AS (
              SELECT winner AS item, loser AS opp,
                count(*)::BIGINT AS w
              FROM d GROUP BY 1, 2
            ), pair AS (
              SELECT item, opp, sum(wv)::BIGINT AS wins_vs,
                sum(nv)::BIGINT AS n_vs
              FROM (
                SELECT item, opp, w AS wv, w AS nv FROM dir
                UNION ALL
                SELECT opp AS item, item AS opp, 0 AS wv, w AS nv
                FROM dir
              ) GROUP BY 1, 2
            ), tot AS (
              SELECT item, sum(wins_vs)::BIGINT AS n_wins,
                sum(n_vs)::BIGINT AS n_duels
              FROM pair GROUP BY item
            ), nn AS (SELECT count(*)::BIGINT AS cnt FROM tot),
            s0 AS (SELECT item, round(1.0 / cnt, 6) AS s FROM tot, nn),
            d1 AS (
              SELECT p.item, sum(p.n_vs / (si.s + sj.s)) AS dn
              FROM pair p JOIN s0 si ON p.item = si.item
              JOIN s0 sj ON p.opp = sj.item GROUP BY 1
            ), r1 AS (
              SELECT t.item, t.n_wins / greatest(dn, 1e-12) AS raw
              FROM tot t JOIN d1 ON t.item = d1.item
            ), z1 AS (SELECT sum(raw) AS z FROM r1),
            s1 AS (
              SELECT item, round(raw / greatest(z, 1e-12), 6) AS s
              FROM r1, z1
            ), d2 AS (
              SELECT p.item, sum(p.n_vs / (si.s + sj.s)) AS dn
              FROM pair p JOIN s1 si ON p.item = si.item
              JOIN s1 sj ON p.opp = sj.item GROUP BY 1
            ), r2 AS (
              SELECT t.item, t.n_wins / greatest(dn, 1e-12) AS raw
              FROM tot t JOIN d2 ON t.item = d2.item
            ), z2 AS (SELECT sum(raw) AS z FROM r2),
            s2 AS (
              SELECT item, round(raw / greatest(z, 1e-12), 6)
                  AS strength
              FROM r2, z2
            )
            SELECT t.item, t.n_wins, t.n_duels, s2.strength
            FROM tot t JOIN s2 ON t.item = s2.item
        """,
        # same forest, walked one hop at a time by the recursive CTE
        # (the Spark side resolves it in O(log depth) doubling joins).
        "q_tree_depth": """
            WITH RECURSIVE t AS (
              SELECT event_id AS id,
                CASE WHEN event_id < 8 THEN NULL
                     ELSE event_id // 2 END AS parent
              FROM events
            ), r AS (
              SELECT id, id AS cur, 0 AS depth FROM t
              UNION ALL
              SELECT r.id, t2.parent AS cur, r.depth + 1
              FROM r JOIN t t2 ON r.cur = t2.id
              WHERE t2.parent IS NOT NULL
            )
            SELECT id, arg_max(cur, depth) AS root,
              max(depth)::BIGINT AS depth
            FROM r GROUP BY id
        """,
        # identical exact quantile_cont boundaries (rounded 6dp) and
        # strictly-below assignment.
        "q_range_bounds": """
            WITH b AS (
              SELECT list_transform(
                quantile_cont(value, [0.125, 0.25, 0.375, 0.5,
                                      0.625, 0.75, 0.875]),
                x -> round(x, 6)) AS bl
              FROM events
            ), a AS (
              SELECT len(list_filter(bl, x -> value > x)) AS pid, bl
              FROM events, b
            ), c AS (
              SELECT pid, bl, count(*)::BIGINT AS n_rows
              FROM a GROUP BY pid, bl
            ), t AS (SELECT sum(n_rows) AS tt FROM c)
            SELECT pid::INT AS pid, n_rows,
              round(n_rows / tt::DOUBLE, 6) AS frac,
              CASE WHEN pid > 0 THEN bl[pid] END AS lo_bound,
              CASE WHEN pid < 7 THEN bl[pid + 1] END AS hi_bound
            FROM c, t
        """,
        # identical anti-join vs the live manifest, listing-clock age
        # guard, and reclaim totals.
        "q_orphan_files": """
            WITH l AS (
              SELECT event_id // 40 AS file_id,
                (count(*) * 500 + sum(user_id))::BIGINT AS bytes,
                max(ts) AS mtime
              FROM events GROUP BY 1
            ), nw AS (SELECT max(epoch(mtime)) AS nwv FROM l),
            o AS (
              SELECT l.file_id, l.bytes,
                floor(nwv - epoch(mtime))::BIGINT AS age_seconds
              FROM l, nw
              WHERE l.file_id % 5 = 0
                AND floor(nwv - epoch(mtime)) >= 259200
            ), t AS (
              SELECT count(*)::BIGINT AS n_orphans,
                coalesce(sum(bytes), 0)::BIGINT AS reclaim_bytes
              FROM o
            )
            SELECT file_id, bytes, age_seconds, n_orphans,
                   reclaim_bytes
            FROM o, t
        """,
        # identical newest-5-or-7-days retention with (cts, id DESC)
        # rank ties.
        "q_snap_expiry": """
            WITH s AS (
              SELECT event_id % 40 AS snapshot_id, max(ts) AS cts
              FROM events GROUP BY 1
            ), nw AS (SELECT max(epoch(cts)) AS nwv FROM s),
            r AS (
              SELECT snapshot_id, cts,
                row_number() OVER (ORDER BY cts DESC,
                                   snapshot_id DESC) AS rk,
                epoch(cts) AS tss
              FROM s
            )
            SELECT snapshot_id,
              strftime(date_trunc('second', cts),
                '%Y-%m-%d %H:%M:%S') AS committed_ts,
              rk::INT AS recency_rank,
              floor(nwv - tss)::BIGINT AS age_seconds,
              (CASE WHEN rk <= 5 OR nwv - tss <= 604800
                THEN 0 ELSE 1 END)::INT AS expire
            FROM r, nw
        """,
        # the UNSALTED form — identical results prove the two-stage
        # salted reduction exact (integer-valued doubles, no float
        # summation-order hazard).
        "q_salted_agg": """
            WITH k AS (
              SELECT user_id, floor(value * 100) AS v FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_rows,
              round(sum(v), 6) AS sum_v,
              min(v) AS min_v, max(v) AS max_v,
              round(sum(v) / count(*), 6) AS avg_v
            FROM k GROUP BY user_id
        """,
        # UNION of the three per-granularity GROUP BYs — the Spark
        # side produces the same rows from one grouping-sets scan.
        "q_time_rollup": """
            WITH k AS (
              SELECT epoch(ts) AS e, floor(value * 100) AS v
              FROM events
            ), u AS (
              SELECT 'hour' AS level,
                floor(e / 3600)::BIGINT * 3600 AS b,
                count(*)::BIGINT AS n_events, round(sum(v), 6) AS sum_v
              FROM k GROUP BY 2
              UNION ALL
              SELECT 'day', floor(e / 86400)::BIGINT * 86400,
                count(*)::BIGINT, round(sum(v), 6)
              FROM k GROUP BY 2
              UNION ALL
              SELECT 'week', floor(e / 604800)::BIGINT * 604800,
                count(*)::BIGINT, round(sum(v), 6)
              FROM k GROUP BY 2
            )
            SELECT level,
              strftime(to_timestamp(b), '%Y-%m-%d %H:%M:%S')
                AS bucket_start,
              n_events, sum_v
            FROM u
        """,
        # the FULL RECOMPUTE over the union — identical to the merged
        # state+delta iff the merge is exact.
        "q_incr_agg": """
            WITH k AS (
              SELECT user_id, floor(value * 100) AS v FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_rows,
              round(sum(v), 6) AS sum_v,
              min(v) AS min_v, max(v) AS max_v
            FROM k GROUP BY user_id
        """,
        # identical canonical-dedup, (degree, id) orientation, and
        # two-join wedge closure.
        "q_triangles": """
            WITH raw AS (
              SELECT event_id % 61 AS x, (event_id // 61) % 61 AS y
              FROM events
            ), und AS (
              SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
              FROM raw WHERE x <> y
            ), deg AS (
              SELECT n, count(*)::BIGINT AS d FROM (
                SELECT u AS n FROM und
                UNION ALL SELECT v FROM und
              ) GROUP BY n
            ), o AS (
              SELECT
                CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS a,
                CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS b
              FROM und
              JOIN deg du ON und.u = du.n
              JOIN deg dv ON und.v = dv.n
            ), t AS (
              SELECT e1.a, e1.b, e2.b AS c
              FROM o e1
              JOIN o e2 ON e1.b = e2.a
              JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b
            ), pn AS (
              SELECT node, count(*)::BIGINT AS n_triangles FROM (
                SELECT a AS node FROM t
                UNION ALL SELECT b FROM t
                UNION ALL SELECT c FROM t
              ) GROUP BY node
            ), tot AS (
              SELECT count(*)::BIGINT AS total_triangles FROM t
            )
            SELECT deg.n AS node,
              coalesce(n_triangles, 0)::BIGINT AS n_triangles,
              total_triangles
            FROM deg LEFT JOIN pn ON deg.n = pn.node, tot
        """,
        "q_cidr_enrich": """
            WITH ips AS (
              SELECT event_id,
                CASE
                  WHEN event_id % 100 = 0 THEN
                    '10.32.7.' || ((event_id // 49) % 256)::VARCHAR
                  WHEN event_id % 101 = 0 THEN
                    '192.168.150.' || ((event_id // 49) % 256)::VARCHAR
                  ELSE
                    (['10','10','10','100','172','192','198'])[(event_id % 7)::INT + 1]
                    || '.' || (event_id % 256)::VARCHAR
                    || '.' || ((event_id // 7) % 256)::VARCHAR
                    || '.' || ((event_id // 49) % 256)::VARCHAR
                END AS ip
              FROM events
            ), dim AS (
              SELECT * FROM (VALUES
                ('10.0.0.0/8', 'corp', 'rfc1918'),
                ('10.32.0.0/12', 'corp-west', 'rfc1918'),
                ('10.32.0.0/16', 'corp-west-dc1', 'rfc1918'),
                ('10.32.7.0/24', 'corp-west-dc1-mgmt', 'rfc1918'),
                ('172.16.0.0/12', 'corp-legacy', 'rfc1918'),
                ('192.168.0.0/16', 'lab', 'rfc1918'),
                ('192.168.144.0/20', 'lab-gpu', 'rfc1918'),
                ('100.64.0.0/10', 'cgnat', 'shared'),
                ('198.51.100.0/24', 'testnet2', 'doc'),
                ('203.0.113.0/24', 'testnet3', 'doc')
              ) AS t(cidr, net_name, net_class)
            ), bounds AS (
              SELECT cidr, net_name, net_class,
                split_part(cidr, '/', 2)::INT AS prefix_len,
                (split_part(split_part(cidr,'/',1),'.',1)::BIGINT * 16777216
                 + split_part(split_part(cidr,'/',1),'.',2)::BIGINT * 65536
                 + split_part(split_part(cidr,'/',1),'.',3)::BIGINT * 256
                 + split_part(split_part(cidr,'/',1),'.',4)::BIGINT) AS base,
                (1::BIGINT << (32 - split_part(cidr,'/',2)::INT)) AS block
              FROM dim
            ), nets AS (
              SELECT cidr, net_name, net_class, prefix_len,
                base - base % block AS net_start,
                base - base % block + block - 1 AS net_end
              FROM bounds
            ), probed AS (
              SELECT event_id, ip,
                (split_part(ip,'.',1)::BIGINT * 16777216
                 + split_part(ip,'.',2)::BIGINT * 65536
                 + split_part(ip,'.',3)::BIGINT * 256
                 + split_part(ip,'.',4)::BIGINT) AS ip_long
              FROM ips
            )
            SELECT p.event_id, p.ip, n.cidr AS matched_cidr,
              n.prefix_len::BIGINT AS prefix_len, n.net_name, n.net_class
            FROM probed p LEFT JOIN nets n
              ON p.ip_long BETWEEN n.net_start AND n.net_end
            QUALIFY row_number() OVER (
              PARTITION BY p.event_id
              ORDER BY n.prefix_len DESC NULLS LAST, n.cidr ASC NULLS LAST
            ) = 1
        """,
        "q_trend": """
            WITH pts AS (
              SELECT user_id,
                epoch_us(ts) // 1000000 - 1704067200 AS x,
                floor(value * 1000)::BIGINT AS y
              FROM events
            ), s AS (
              SELECT user_id,
                count(*)::BIGINT AS n,
                sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x*y)::BIGINT AS sxy,
                sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy
              FROM pts GROUP BY user_id
            ), d AS (
              SELECT user_id, n,
                n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
              FROM s
            ), m AS (
              SELECT user_id, n,
                nd * sxyd - sxd * syd AS cov_n,
                nd * sxxd - sxd * sxd AS varx_n,
                nd * syyd - syd * syd AS vary_n,
                sxd, syd, nd
              FROM d
            )
            SELECT user_id, n AS n_points,
              round(CASE WHEN varx_n > 0 THEN cov_n / varx_n END, 6) AS slope,
              round(CASE WHEN varx_n > 0
                THEN (syd - (cov_n / varx_n) * sxd) / nd END, 6) AS intercept,
              round(CASE WHEN varx_n > 0 AND vary_n > 0
                THEN cov_n * cov_n / (varx_n * vary_n) END, 6) AS r2
            FROM m
        """,
        "q_intervals": """
            WITH iv AS (
              SELECT user_id % 20 AS grp,
                (event_id * 7919) % 50000 AS s,
                (event_id * 7919) % 50000 + event_id % 97 + 1 AS e
              FROM events
            ), tagged AS (
              SELECT grp, s, e,
                CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS opener
              FROM iv
              WINDOW w AS (PARTITION BY grp ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ), isl AS (
              SELECT grp, s, e,
                sum(opener) OVER (PARTITION BY grp ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                )::BIGINT AS island
              FROM tagged
            )
            SELECT grp, island,
              min(s) AS island_start, max(e) AS island_end,
              count(*)::BIGINT AS n_intervals,
              max(e) - min(s) AS covered
            FROM isl GROUP BY grp, island
        """,
        "q_radius_pairs": """
            WITH pts AS (
              SELECT event_id AS pid,
                (event_id * 7919) % 20000 AS x,
                ((event_id * event_id) % 104729) % 20000 AS y
              FROM events
            )
            SELECT a.pid AS id_a, b.pid AS id_b,
              (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                AS dist_sq
            FROM pts a JOIN pts b
              ON a.pid < b.pid
              AND b.x BETWEEN a.x - 25 AND a.x + 25
              AND b.y BETWEEN a.y - 25 AND a.y + 25
            WHERE (a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) <= 625
        """,
        "q_entropy": """
            WITH counts AS (
              SELECT user_id,
                coalesce(event_type, chr(0) || 'null') AS cat,
                count(*)::BIGINT AS c
              FROM events GROUP BY user_id, cat
            ), agg AS (
              SELECT user_id,
                sum(c)::BIGINT AS n_rows,
                count(*)::BIGINT AS n_cats,
                sum(c::DOUBLE * ln(c::DOUBLE)) AS clogc
              FROM counts GROUP BY user_id
            )
            SELECT user_id, n_rows, n_cats,
              round(ln(n_rows::DOUBLE) - clogc / n_rows::DOUBLE, 6)
                AS entropy,
              round(CASE WHEN n_cats > 1 THEN
                (ln(n_rows::DOUBLE) - clogc / n_rows::DOUBLE)
                  / ln(n_cats::DOUBLE) END, 6) AS norm_entropy
            FROM agg
        """,
        "q_evolve": """
            SELECT event_id,
              round(floor(value * 100)::INT::DOUBLE, 6) AS metric,
              event_type AS note, NULL::VARCHAR AS origin
            FROM events WHERE event_id % 2 = 0
            UNION ALL
            SELECT event_id, round(value * 100, 6),
              NULL::VARCHAR, 'b'
            FROM events WHERE event_id % 2 = 1
        """,
        "q_topk_group": """
            SELECT user_id,
              row_number() OVER (
                PARTITION BY user_id
                ORDER BY value DESC, event_id ASC
              )::INT AS rank,
              event_id, value
            FROM events
            QUALIFY rank <= 10
        """,
        "q_calibration": """
            WITH scored AS (
              SELECT (event_id % 1024) / 1024.0 AS score,
                CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS label
              FROM events
            ), agg AS (
              SELECT least(floor(score * 10)::INT, 9) AS bin,
                count(*)::BIGINT AS n,
                sum(score) AS ss, sum(label) AS sy
              FROM scored GROUP BY bin
            )
            SELECT bin, n,
              round(ss / n::DOUBLE, 6) AS mean_score,
              round(sy / n::DOUBLE, 6) AS pos_rate,
              round(sy / n::DOUBLE - ss / n::DOUBLE, 6) AS gap
            FROM agg
        """,
        "q_hot_ngrams": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 3 THEN
                  list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS grams
              FROM w
            ), ex AS (
              SELECT doc_id, unnest(grams) AS gram FROM g
            ), hot AS (
              SELECT gram FROM ex GROUP BY gram HAVING count(*) >= 2
            ), hits AS (
              SELECT ex.doc_id, count(*) AS n_hot
              FROM ex JOIN hot USING (gram) GROUP BY ex.doc_id
            )
            SELECT g.doc_id, len(g.grams)::BIGINT AS n_grams,
              coalesce(hits.n_hot, 0)::BIGINT AS n_hot,
              round(coalesce(hits.n_hot, 0)::DOUBLE
                    / greatest(len(g.grams), 1), 4) AS hot_frac,
              (coalesce(hits.n_hot, 0)::DOUBLE
                    / greatest(len(g.grams), 1)) >= 0.2 AS flagged
            FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
        """,
        "q_char_entropy": """
            WITH w AS (
              SELECT doc_id,
                list_sort(list_transform(
                  generate_series(1, length(text)), i -> text[i])) AS cs,
                length(text) AS n
              FROM documents
            ), r AS (
              SELECT doc_id, n,
                list_filter(generate_series(1, n),
                  i -> i = 1 OR cs[i] <> cs[i-1]) AS starts
              FROM w
            ), l AS (
              SELECT doc_id, n,
                list_transform(generate_series(1, len(starts)),
                  j -> (CASE WHEN j < len(starts) THEN starts[j+1]
                        ELSE n + 1 END) - starts[j]) AS lens
              FROM r
            )
            SELECT doc_id,
              CASE WHEN n > 0 THEN
                round(log2(n::DOUBLE) - list_sum(list_transform(lens,
                  x -> x::DOUBLE * log2(x::DOUBLE))) / n, 4)
              ELSE 0.0 END AS char_entropy_bits
            FROM l
        """,
        "q_split_leakproof": """
            SELECT doc_id, fp,
                   CASE WHEN u < 4209067950 THEN 'train'
                        WHEN u < 4252017623 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id, md5(text) AS fp,
                     ('0x' || substr(md5('split-v1|' || md5(text)),
                                     1, 8))::BIGINT AS u
              FROM documents
            )
        """,
        "q_line_dedup": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents
            ), lined AS (
              SELECT doc_id,
                list_transform(
                  generate_series(1, ceil(len(toks) / 8.0)::BIGINT),
                  i -> array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' '))
                AS lines
              FROM base
            ), ex AS (
              SELECT doc_id, i - 1 AS pos, lines[i] AS line
              FROM lined, unnest(range(1, len(lines) + 1)) AS u(i)
            ), k AS (
              SELECT doc_id, pos, line,
                row_number() OVER (
                  PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM ex
            ), kept AS (
              SELECT doc_id, count(*) AS n_kept,
                string_agg(line, chr(10) ORDER BY pos) AS text_clean
              FROM k WHERE rn = 1 GROUP BY doc_id
            )
            SELECT l.doc_id, len(l.lines)::BIGINT AS n_lines,
              coalesce(kept.n_kept, 0)::BIGINT AS n_kept,
              coalesce(kept.text_clean, '') AS text_clean
            FROM lined l LEFT JOIN kept USING (doc_id)
        """,
        "q_corpus_overlap": """
            WITH toks AS (
              SELECT lang AS c,
                unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents
            ), digs AS (
              SELECT c,
                md5('g0|' || tok) AS d0, md5('g1|' || tok) AS d1,
                md5('g2|' || tok) AS d2, md5('g3|' || tok) AS d3
              FROM toks
            ), sig AS (
              SELECT c,
                min(substr(d0, 1, 8)) AS mh_0,
                min(substr(d0, 9, 8)) AS mh_1,
                min(substr(d0, 17, 8)) AS mh_2,
                min(substr(d0, 25, 8)) AS mh_3,
                min(substr(d1, 1, 8)) AS mh_4,
                min(substr(d1, 9, 8)) AS mh_5,
                min(substr(d1, 17, 8)) AS mh_6,
                min(substr(d1, 25, 8)) AS mh_7,
                min(substr(d2, 1, 8)) AS mh_8,
                min(substr(d2, 9, 8)) AS mh_9,
                min(substr(d2, 17, 8)) AS mh_10,
                min(substr(d2, 25, 8)) AS mh_11,
                min(substr(d3, 1, 8)) AS mh_12,
                min(substr(d3, 9, 8)) AS mh_13,
                min(substr(d3, 17, 8)) AS mh_14,
                min(substr(d3, 25, 8)) AS mh_15
              FROM digs GROUP BY c
            )
            SELECT a.c AS corpus_a, b.c AS corpus_b,
              (CASE WHEN a.mh_0 = b.mh_0 THEN 1 ELSE 0 END + CASE WHEN a.mh_1 = b.mh_1 THEN 1 ELSE 0 END + CASE WHEN a.mh_2 = b.mh_2 THEN 1 ELSE 0 END + CASE WHEN a.mh_3 = b.mh_3 THEN 1 ELSE 0 END + CASE WHEN a.mh_4 = b.mh_4 THEN 1 ELSE 0 END + CASE WHEN a.mh_5 = b.mh_5 THEN 1 ELSE 0 END + CASE WHEN a.mh_6 = b.mh_6 THEN 1 ELSE 0 END + CASE WHEN a.mh_7 = b.mh_7 THEN 1 ELSE 0 END + CASE WHEN a.mh_8 = b.mh_8 THEN 1 ELSE 0 END + CASE WHEN a.mh_9 = b.mh_9 THEN 1 ELSE 0 END + CASE WHEN a.mh_10 = b.mh_10 THEN 1 ELSE 0 END + CASE WHEN a.mh_11 = b.mh_11 THEN 1 ELSE 0 END + CASE WHEN a.mh_12 = b.mh_12 THEN 1 ELSE 0 END + CASE WHEN a.mh_13 = b.mh_13 THEN 1 ELSE 0 END + CASE WHEN a.mh_14 = b.mh_14 THEN 1 ELSE 0 END + CASE WHEN a.mh_15 = b.mh_15 THEN 1 ELSE 0 END)::BIGINT AS n_match,
              round((CASE WHEN a.mh_0 = b.mh_0 THEN 1 ELSE 0 END + CASE WHEN a.mh_1 = b.mh_1 THEN 1 ELSE 0 END + CASE WHEN a.mh_2 = b.mh_2 THEN 1 ELSE 0 END + CASE WHEN a.mh_3 = b.mh_3 THEN 1 ELSE 0 END + CASE WHEN a.mh_4 = b.mh_4 THEN 1 ELSE 0 END + CASE WHEN a.mh_5 = b.mh_5 THEN 1 ELSE 0 END + CASE WHEN a.mh_6 = b.mh_6 THEN 1 ELSE 0 END + CASE WHEN a.mh_7 = b.mh_7 THEN 1 ELSE 0 END + CASE WHEN a.mh_8 = b.mh_8 THEN 1 ELSE 0 END + CASE WHEN a.mh_9 = b.mh_9 THEN 1 ELSE 0 END + CASE WHEN a.mh_10 = b.mh_10 THEN 1 ELSE 0 END + CASE WHEN a.mh_11 = b.mh_11 THEN 1 ELSE 0 END + CASE WHEN a.mh_12 = b.mh_12 THEN 1 ELSE 0 END + CASE WHEN a.mh_13 = b.mh_13 THEN 1 ELSE 0 END + CASE WHEN a.mh_14 = b.mh_14 THEN 1 ELSE 0 END + CASE WHEN a.mh_15 = b.mh_15 THEN 1 ELSE 0 END)::DOUBLE / 16, 4) AS jaccard_est
            FROM sig a JOIN sig b ON a.c < b.c
        """,
        "q_dp_counts": """
            WITH g AS (
              SELECT event_type, count(*) AS n,
                ('0x' || substr(md5('dp-v1|' ||
                    coalesce(event_type, chr(1) || '<null>')), 1, 8))::BIGINT
                  / 4294967296.0 AS u
              FROM events GROUP BY event_type
            )
            SELECT event_type,
              round(n + (-1.0 * sign(u - 0.5)
                * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-12))), 3)
                AS n_noisy
            FROM g
        """,
        "q_retrieval_eval": """
            WITH res AS (
              SELECT user_id AS q, event_id AS d,
                row_number() OVER (
                  PARTITION BY user_id
                  ORDER BY value DESC, event_id ASC) AS rank
              FROM events QUALIFY rank <= 10
            ), qr AS (
              SELECT user_id AS q, event_id AS d,
                (1 + event_id % 3)::DOUBLE AS rel
              FROM events WHERE event_id % 4 = 0
            ), hits AS (
              SELECT res.q, count(*) AS n_hit, min(rank) AS first_rank,
                sum(rel / log2(rank + 1.0)) AS dcg
              FROM res JOIN qr ON res.q = qr.q AND res.d = qr.d
              GROUP BY res.q
            ), rels AS (
              SELECT q, count(*) AS n_rel,
                list_slice(list_sort(list(rel), 'DESC'), 1, 10) AS rl
              FROM qr GROUP BY q
            ), ideal AS (
              SELECT q, n_rel,
                list_sum(list_transform(generate_series(1, len(rl)),
                  i -> rl[i] / log2(i + 1.0))) AS idcg
              FROM rels
            )
            SELECT i.q AS user_id, i.n_rel::BIGINT AS n_rel,
              coalesce(h.n_hit, 0)::BIGINT AS n_hit,
              round(coalesce(h.n_hit, 0)::DOUBLE / i.n_rel, 6)
                AS recall_at_k,
              round(coalesce(1.0 / h.first_rank, 0.0), 6) AS mrr_at_k,
              round(coalesce(h.dcg, 0.0) / i.idcg, 6) AS ndcg_at_k
            FROM ideal i LEFT JOIN hits h ON i.q = h.q
        """,
        "q_fd_check": """
            SELECT user_id,
              count(DISTINCT coalesce(event_type, chr(1) || '<null>'))::BIGINT
                AS n_rhs_values,
              count(*)::BIGINT AS n_rows,
              min(coalesce(event_type, chr(1) || '<null>')) AS rhs_min,
              max(coalesce(event_type, chr(1) || '<null>')) AS rhs_max
            FROM events GROUP BY user_id
            HAVING count(DISTINCT coalesce(event_type, chr(1) || '<null>')) > 1
        """,
    }
