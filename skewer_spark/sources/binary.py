"""Binary ingest surfaces (SURVEY.md §2.1/§2.2 hardening):

* **GELF UDP datagrams** — the Graylog source accepts chunked and
  zlib/gzip-compressed GELF (``/root/reference/services/network/
  graylog.go:33-41``: magics ``1e0f`` chunked / ``0x78`` zlib /
  ``1f8b`` gzip; chunk header = 2 magic + 8 message-id + 1 seq +
  1 total = 12 bytes).  :func:`reassemble_gelf_datagrams` rebuilds the
  byte stream Spark-first: chunk header fields are sliced with native
  binary expressions, reassembly is ONE groupBy(msg_id) with an
  array_sort + binary-concat fold, and only the final inflate runs in
  an Arrow-batched pandas UDF (zlib/gzip are pure stdlib — a real
  implementation, not a stub).  Incomplete chunk groups are dropped
  exactly like the reference's gelf reader discards them on timeout.
* **acct(5) process accounting** — the accounting service reads fixed
  64-byte ``struct acct_v3`` records (``/root/reference/services/
  accounting.go:101-147``, layout ``accounting/acct_linux.go:30-52``).
  :func:`decode_acct_records` decodes a binary column with ONE
  vectorized ``numpy.frombuffer`` per Arrow batch (records are
  fixed-size, so a batch concatenates into a single typed array — no
  per-row struct.unpack), including the ``comp_t`` 13-bit-mantissa /
  3-bit-exponent expansion (``cvt()`` in acct_linux.go:8-10).
  uid/gid stay numeric strings (no /etc/passwd on executors —
  documented deviation from the reference's user.LookupId).
"""

from __future__ import annotations

import gzip
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

GELF_CHUNK_HEADER = 12
_MAX_BIN = 1 << 30


# ---------------------------------------------------------------------------
# GELF datagrams
# ---------------------------------------------------------------------------

@pandas_udf(T.StringType())
def _inflate_gelf(blob: pd.Series) -> pd.Series:
    def inflate(b) -> str | None:
        if b is None:
            return None
        b = bytes(b)
        try:
            if b[:1] == b"\x78":
                return zlib.decompress(b).decode("utf-8", "replace")
            if b[:2] == b"\x1f\x8b":
                return gzip.decompress(b).decode("utf-8", "replace")
            return b.decode("utf-8", "replace")
        except Exception:
            return None

    return blob.map(inflate)


def reassemble_gelf_datagrams(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """UDP GELF datagrams → one ``text`` row per complete message.

    Returns (msg_id, text): ``msg_id`` is the 8-byte chunk message id
    (hex) for chunked messages, NULL for single-datagram ones.  Feed
    the result to ``decode_json.parse_gelf``.
    """
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 2))
    is_chunked = magic == "1E0F"

    chunked = (
        df.filter(is_chunked)
        .select(
            F.hex(F.substring(p, 3, 8)).alias("msg_id"),
            F.conv(F.hex(F.substring(p, 11, 1)), 16, 10).cast("int").alias("seq"),
            F.conv(F.hex(F.substring(p, 12, 1)), 16, 10).cast("int").alias("total"),
            F.substring(p, GELF_CHUNK_HEADER + 1, _MAX_BIN).alias("data"),
        )
        # UDP can duplicate chunks; the gelf reader keeps one per seq
        .dropDuplicates(["msg_id", "seq"])
    )
    complete = (
        chunked.groupBy("msg_id")
        .agg(
            F.max("total").alias("_total"),
            F.count("*").alias("_n"),
            F.array_sort(F.collect_list(F.struct("seq", "data"))).alias("_chunks"),
        )
        .filter(F.col("_n") == F.col("_total"))
        .select(
            "msg_id",
            F.aggregate(
                "_chunks",
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["data"]),
            ).alias("_blob"),
        )
    )
    single = df.filter(~is_chunked).select(
        F.lit(None).cast("string").alias("msg_id"), p.alias("_blob")
    )
    return (
        complete.unionByName(single)
        .withColumn("text", _inflate_gelf("_blob"))
        .filter(F.col("text").isNotNull())
        .drop("_blob")
    )


# ---------------------------------------------------------------------------
# acct(5)
# ---------------------------------------------------------------------------

ACCT_V3_SIZE = 64
ACCT_V3_DTYPE = np.dtype(
    [
        ("flag", "u1"), ("version", "u1"), ("tty", "<u2"),
        ("exitcode", "<u4"), ("uid", "<u4"), ("gid", "<u4"),
        ("pid", "<u4"), ("ppid", "<u4"), ("btime", "<u4"),
        ("etime", "<f4"),
        ("utime", "<u2"), ("stime", "<u2"), ("mem", "<u2"), ("io", "<u2"),
        ("rw", "<u2"), ("minflt", "<u2"), ("majflt", "<u2"), ("swaps", "<u2"),
        ("comm", "S16"),
    ]
)
assert ACCT_V3_DTYPE.itemsize == ACCT_V3_SIZE

ACCT_SCHEMA = T.StructType([
    T.StructField("comm", T.StringType()),
    T.StructField("uid", T.LongType()),
    T.StructField("gid", T.LongType()),
    T.StructField("pid", T.LongType()),
    T.StructField("ppid", T.LongType()),
    T.StructField("tty", T.IntegerType()),
    T.StructField("exitcode", T.LongType()),
    T.StructField("btime", T.TimestampType()),
    T.StructField("utime_ns", T.LongType()),
    T.StructField("stime_ns", T.LongType()),
    T.StructField("etime_ns", T.LongType()),
    T.StructField("mem", T.LongType()),
    T.StructField("io", T.LongType()),
    T.StructField("flags", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
])

# flag-name order per Status.String() (acct_linux.go:100-117)
_FLAG_NAMES = (
    (0x04, "compatmode"), (0x08, "dumpedcore"), (0x01, "forked"),
    (0x02, "superuser"), (0x10, "killedbysignal"),
)

ACCT_TICK = 100  # AHZ (sys.GetTick() on linux)


def _comp2int(c: np.ndarray) -> np.ndarray:
    """comp_t: 13-bit mantissa << (3-bit exponent * 3) — cvt() analog."""
    c = c.astype(np.int64)
    return (c & 0x1FFF) << (((c >> 13) & 0x7) * 3)


def acct_decode_batch(payload: pd.Series, tick: int = ACCT_TICK) -> pd.DataFrame:
    raw = payload.to_numpy(dtype=object)
    ok = np.array(
        [x is not None and len(x) == ACCT_V3_SIZE for x in raw], dtype=bool
    )
    out = pd.DataFrame(index=payload.index)
    for f in ACCT_SCHEMA.fieldNames():
        out[f] = None
    out["decode_ok"] = ok
    if not ok.any():
        return out
    rec = np.frombuffer(b"".join(bytes(x) for x in raw[ok]), dtype=ACCT_V3_DTYPE)
    oi = payload.index[ok]
    comm = (
        pd.Series(rec["comm"], index=oi)
        .str.decode("utf-8", errors="replace")
        .str.split("\x00").str[0]
    )
    out.loc[oi, "comm"] = comm
    for src, dst in (("uid", "uid"), ("gid", "gid"), ("pid", "pid"),
                     ("ppid", "ppid"), ("exitcode", "exitcode")):
        out.loc[oi, dst] = rec[src].astype("int64")
    out.loc[oi, "tty"] = rec["tty"].astype("int32")
    out.loc[oi, "btime"] = pd.to_datetime(rec["btime"].astype("int64"), unit="s")
    # Duration math per MakeAcct (acct_linux.go:131-150): ms resolution
    out.loc[oi, "utime_ns"] = _comp2int(rec["utime"]) * 1000 // tick * 1_000_000
    out.loc[oi, "stime_ns"] = _comp2int(rec["stime"]) * 1000 // tick * 1_000_000
    out.loc[oi, "etime_ns"] = (
        (rec["etime"].astype("float64") * 1000).astype("int64") // tick
        * 1_000_000
    )
    out.loc[oi, "mem"] = _comp2int(rec["mem"])
    out.loc[oi, "io"] = _comp2int(rec["io"])
    flags = pd.Series("", index=oi, dtype="object")
    fl = rec["flag"].astype("int64")
    for bit, name in _FLAG_NAMES:
        m = pd.Series((fl & bit) != 0, index=oi)
        flags = flags.where(~m, np.where(flags == "", name, flags + "," + name))
    out.loc[oi, "flags"] = flags
    for f in ("uid", "gid", "pid", "ppid", "exitcode", "utime_ns",
              "stime_ns", "etime_ns", "mem", "io"):
        out[f] = out[f].astype("Int64")
    out["tty"] = out["tty"].astype("Int32")
    out["btime"] = pd.to_datetime(out["btime"])
    return out[ACCT_SCHEMA.fieldNames()]


@pandas_udf(ACCT_SCHEMA)
def _acct_udf(payload: pd.Series) -> pd.DataFrame:
    return acct_decode_batch(payload)


def decode_acct_records(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary acct_v3 records → typed columns (invalid sizes → decode_ok
    false with NULL fields, like the reference skipping short reads)."""
    parsed = df.withColumn("_a", _acct_udf(F.col(payload_col)))
    return parsed.select(
        "*", *[F.col(f"_a.{f}").alias(f) for f in ACCT_SCHEMA.fieldNames()]
    ).drop("_a")


def acct_to_canonical(df: DataFrame, hostname: str = "") -> DataFrame:
    """Decoded acct frame → canonical parsed columns, mirroring
    makeMessage (services/accounting.go:73-95): appname=accounting,
    facility=user(1)/severity=info(6), procid=pid, time_reported=btime,
    full reference property set under properties['accounting'] plus
    skewer.client."""
    props = F.to_json(F.create_map(
        F.lit("accounting"), F.create_map(
            F.lit("comm"), F.coalesce(F.col("comm"), F.lit("")),
            F.lit("uid"), F.col("uid").cast("string"),
            F.lit("gid"), F.col("gid").cast("string"),
            F.lit("system_ns"), F.col("stime_ns").cast("string"),
            F.lit("elapsed_ns"), F.col("etime_ns").cast("string"),
            F.lit("user_ns"), F.col("utime_ns").cast("string"),
            F.lit("started_datetime"),
            F.date_format("btime", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit("memory_bytes"), F.col("mem").cast("string"),
            F.lit("io_bytes"), F.col("io").cast("string"),
            F.lit("flags"), F.coalesce(F.col("flags"), F.lit("")),
            F.lit("pid_pid"), F.col("pid").cast("string"),
            F.lit("ppid_pid"), F.col("ppid").cast("string"),
            F.lit("exitcode"), F.col("exitcode").cast("string"),
        ),
        F.lit("skewer"), F.create_map(F.lit("client"), F.lit(hostname)),
    ))
    return df.select(
        "*",
        F.lit(14).alias("priority"),
        F.lit(1).alias("facility"),
        F.lit(6).alias("severity"),
        F.lit(1).alias("version"),
        F.col("btime").alias("time_reported"),
        F.lit(hostname).alias("hostname"),
        F.lit("accounting").alias("appname"),
        F.col("pid").cast("string").alias("procid"),
        F.lit("").alias("msgid"),
        F.lit("").alias("structured"),
        F.coalesce(F.col("comm"), F.lit("")).alias("message"),
        props.alias("properties_json"),
        F.col("decode_ok").alias("parse_ok"),
        F.lit("accounting").alias("parser_name"),
    )
