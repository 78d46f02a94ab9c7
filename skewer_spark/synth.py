"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Input table shape per BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)``.  The ``text`` column embeds syslog lines in a
deterministic mix that exercises every parse branch of the reference
decoders (``/root/reference/decoders/rfc3164_format.go:28-166``,
``rfc5424_format.go`` + grammar).

Built entirely from ``spark.range`` + column expressions: no driver-side
data, so the identical generator synthesizes 10^12 rows on a cluster by
raising ``n_convs`` — generation parallelism is ``spark.range``'s
partitioning.

Determinism: every value is an arithmetic function of the row id with a
fixed base timestamp 2026-01-01T00:00:00Z.  The format selector is
``(conv_hash + turn_idx) % 10`` with ``conv_hash = (conv_num *
2654435761) % 2**31`` (Knuth multiplicative hash — reproducible in
plain Python for the test oracle, unlike xxhash64).

Skew: conversation 0 owns ~10% of all turns (the hot-key fixture for
the salting / AQE-skew tests); remaining turns round-robin across the
other conversations.  Output row order is scrambled by a hash sort so
stable turn ordering must come from the window rank, not file order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2026-01-01 00:00:00"
KNUTH = 2654435761
FORMAT_NAMES = [
    "rfc5424", "rfc5424", "rfc5424",          # 0,1,2  3/10 full 5424
    "rfc5424_nil",                            # 3      1/10 nil fields
    "rfc3164", "rfc3164",                     # 4,5    2/10 classic
    "rfc3164_3339",                           # 6      1/10 RFC3339 ts
    "rfc3164_nohost",                         # 7      1/10 no hostname
    "bare",                                   # 8      1/10 no PRI
    "badpri",                                 # 9      1/10 malformed PRI
]


def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def transcripts_df(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 50,
    shuffle: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript table with embedded syslog lines."""
    n = n_convs * turns_per_conv
    hot = max(n // 10, 1)                     # conv 0 owns ~10% of turns
    rest_convs = max(n_convs - 1, 1)

    df = spark.range(0, n, 1, numPartitions=partitions or max(n // 50_000, 8))
    i = F.col("id")

    conv_num = F.when(i < hot, F.lit(0)).otherwise(
        1 + F.pmod(i - hot, F.lit(rest_convs))
    )
    turn_idx = F.when(i < hot, i).otherwise(
        F.floor((i - hot) / rest_convs)
    ).cast("int")

    df = df.select(
        i.alias("seq"),
        F.format_string("conv-%08d", conv_num).alias("conv_id"),
        conv_num.alias("conv_num"),
        turn_idx.alias("turn_idx"),
    )

    conv_hash = F.pmod(F.col("conv_num") * F.lit(KNUTH), F.lit(2**31))
    fmt_idx = F.pmod(conv_hash + F.col("turn_idx"), F.lit(10))
    fmt_name = F.element_at(
        F.array(*[F.lit(x) for x in FORMAT_NAMES]), fmt_idx.cast("int") + 1
    )

    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=F.col("seq"))
    pri = F.pmod(F.col("conv_num") + F.col("turn_idx"), F.lit(192))
    host = F.format_string("host%02d", F.pmod(F.col("conv_num"), F.lit(50)))
    app = F.format_string("app%02d", F.pmod(F.col("turn_idx"), F.lit(20)))
    pid = F.col("turn_idx").cast("string")
    reject = F.pmod(F.col("seq"), F.lit(17)) == 0
    payload = F.concat(
        F.lit("event "),
        F.col("seq").cast("string"),
        F.when(reject, F.lit(" REJECTME")).otherwise(F.lit("")),
    )

    iso_ts = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    # every 23rd row with a full-5424 shape carries an invalid timestamp
    # (month 13) → decode error → parse_ok=false → filter ERROR branch
    bad5424 = F.pmod(F.col("seq"), F.lit(23)) == 0
    iso_or_bad = F.when(bad5424, F.lit("2026-13-01T00:00:00Z")).otherwise(iso_ts)
    # Go time.Stamp shape: "Jan _2 15:04:05" (space-padded day).
    day = F.dayofmonth(ts)
    stamp_ts = F.concat(
        F.date_format(ts, "MMM"),
        F.when(day < 10, F.concat(F.lit("  "), day.cast("string")))
        .otherwise(F.concat(F.lit(" "), day.cast("string"))),
        F.lit(" "),
        _pad2(F.hour(ts)), F.lit(":"), _pad2(F.minute(ts)),
        F.lit(":"), _pad2(F.second(ts)),
    )

    text = (
        F.when(
            fmt_idx <= 2,
            F.format_string(
                '<%s>1 %s %s %s %s MSG%s [meta k="v" k2="a\\]b"] %s',
                pri.cast("string"), iso_or_bad, host, app, pid,
                _pad2(F.pmod(F.col("turn_idx"), F.lit(100))), payload,
            ),
        )
        .when(fmt_idx == 3, F.format_string("<14>1 - - - - - - %s", payload))
        .when(
            (fmt_idx == 4) | (fmt_idx == 5),
            F.concat(
                F.lit("<"), pri.cast("string"), F.lit(">"), stamp_ts,
                F.lit(" "), host, F.lit(" "), app, F.lit("["), pid,
                F.lit("]: "), payload,
            ),
        )
        .when(
            fmt_idx == 6,
            F.concat(
                F.lit("<"), pri.cast("string"), F.lit(">"), iso_ts,
                F.lit(" "), host, F.lit(" "), app, F.lit(": "), payload,
            ),
        )
        .when(
            fmt_idx == 7,
            F.concat(
                F.lit("<13>"), stamp_ts, F.lit(" "), app, F.lit("["), pid,
                F.lit("]: "), payload,
            ),
        )
        .when(fmt_idx == 8, F.concat(F.lit("plain text with no priority "), payload))
        .otherwise(F.format_string("<9999999999>broken %s", payload))
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        F.pmod(F.col("turn_idx"), F.lit(4)).cast("int") + 1,
    )
    tool = F.element_at(
        F.array(F.lit("bash"), F.lit("search"), F.lit("editor"),
                F.lit("browser"), F.lit("none")),
        F.pmod(conv_hash + F.col("turn_idx") * 3, F.lit(5)).cast("int") + 1,
    )

    out = df.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.col("seq"),
    )
    if shuffle:
        out = out.orderBy(F.xxhash64("seq"))
    return out.drop("seq")


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int = 200,
    turns_per_conv: int = 50,
) -> None:
    transcripts_df(spark, n_convs, turns_per_conv).write.mode("overwrite").parquet(path)
