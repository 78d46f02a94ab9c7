"""Adapter: the driver's ``events`` table → transcript-shaped input.

Builds deterministic syslog lines from event columns (pure arithmetic,
no randomness) so the expected parse output is known *by construction*
— the DuckDB oracle recomputes the expected fields from the same source
columns without re-implementing the parser.

Line shapes rotate on ``event_id % 3``:

* 0 — RFC5424 full with one SD element; every 7th event carries an
  invalid timestamp (month 13) → decode error (the ERROR branch).
* 1 — RFC3164 classic ``Mmm dd hh:mm:ss`` (day 10 → single-space pad,
  the time.Stamp success path).
* 2 — RFC3164 with RFC3339 timestamp and ``app:`` tag.

Every 11th event appends ``REJECTME`` to the payload (the REJECTED
branch); severity is ``(event_id % 192) % 8`` so the DROPPED branch
(severity 7) occurs too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOOL_BY_EVENT = {
    "click": "browser", "view": "browser", "purchase": "bash",
    "signup": "editor", "error": "none",
}


def _lpad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def event_lines(df: DataFrame) -> DataFrame:
    """events → (conv_id, turn_idx, role, text, tool, ts) transcript rows."""
    eid = F.col("event_id")
    pri = F.pmod(eid, F.lit(192))
    host = F.format_string("host%02d", F.pmod(F.col("user_id"), F.lit(50)))
    app = F.format_string("app%02d", F.pmod(eid, F.lit(20)))
    pid = F.pmod(eid, F.lit(1000)).cast("string")
    msgid = F.format_string("MSG%02d", F.pmod(eid, F.lit(100)))
    hh = _lpad2(F.pmod(eid, F.lit(24)))
    mi = _lpad2(F.pmod(eid * 7, F.lit(60)))
    ss = _lpad2(F.pmod(eid * 13, F.lit(60)))
    iso = F.date_format(F.date_trunc("second", F.col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    badts = F.pmod(eid, F.lit(7)) == 0
    rejectme = F.pmod(eid, F.lit(11)) == 0
    payload = F.concat(
        F.col("event_type"), F.lit(" msg "), eid.cast("string"),
        F.when(rejectme, F.lit(" REJECTME")).otherwise(F.lit("")),
    )
    shape = F.pmod(eid, F.lit(3))

    text = (
        F.when(
            shape == 0,
            F.concat(
                F.lit("<"), pri.cast("string"), F.lit(">1 "),
                F.when(badts, F.lit("2024-13-01T00:00:00Z")).otherwise(iso),
                F.lit(" "), host, F.lit(" "), app, F.lit(" "), pid,
                F.lit(" "), msgid, F.lit(' [meta k="v"] '), payload,
            ),
        )
        .when(
            shape == 1,
            F.concat(
                F.lit("<"), pri.cast("string"), F.lit(">Jan 10 "),
                hh, F.lit(":"), mi, F.lit(":"), ss,
                F.lit(" "), host, F.lit(" "), app, F.lit("["), pid,
                F.lit("]: "), payload,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<"), pri.cast("string"), F.lit(">"), iso,
                F.lit(" "), host, F.lit(" "), app, F.lit(": "), payload,
            )
        )
    )

    tool = F.lit("none")
    for k, v in TOOL_BY_EVENT.items():
        tool = F.when(F.col("event_type") == k, F.lit(v)).otherwise(tool)

    return df.select(
        F.col("user_id").cast("string").alias("conv_id"),
        eid.cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("ts"),
        eid.alias("event_id"),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.session import ensure_parallelism

    return ensure_parallelism(spark.read.parquet(f"{sf_dir}/events.parquet"))


def event_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_lines(load_events(spark, sf_dir))
