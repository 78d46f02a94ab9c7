"""Stream-stream ACK correlation: matches within the delay bound come
out acked; timed-out messages emit unmatched once the watermark passes
their deadline (the NACK analog)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from skewer_spark.streaming.pipeline import correlate_acks

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _write(spark, rows, schema, path, files):
    """Write rows as `files` separate parquet files so availableNow
    processes several micro-batches (watermark advances between them)."""
    os.makedirs(path, exist_ok=True)
    per = max(1, len(rows) // files)
    for i in range(0, len(rows), per):
        spark.createDataFrame(rows[i : i + per], schema).coalesce(
            1
        ).write.mode("append").parquet(path)


def test_ack_correlation(spark, tmp_path):
    msg_dir = str(tmp_path / "msgs")
    ack_dir = str(tmp_path / "acks")
    out = str(tmp_path / "out")

    msgs = [
        ("m1", _t(0)),     # acked in 5 s
        ("m2", _t(10)),    # acked at the 600 s boundary exactly
        ("m3", _t(20)),    # ack arrives too late (601 s) → unmatched
        ("m4", _t(30)),    # never acked → unmatched
        # sentinel far in the future: pushes the watermark past every
        # earlier deadline so the unmatched rows actually emit
        ("sentinel", _t(100_000)),
    ]
    acks = [
        ("m1", _t(5)),
        ("m2", _t(610)),
        ("m3", _t(621)),
        ("ack-sentinel", _t(100_000)),
    ]
    _write(spark, msgs, "uid string, ts timestamp", msg_dir, 2)
    _write(spark, acks, "ack_uid string, ack_ts timestamp", ack_dir, 2)

    m = (
        spark.readStream.schema("uid string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(msg_dir)
    )
    a = (
        spark.readStream.schema("ack_uid string, ack_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(ack_dir)
    )
    joined = correlate_acks(m, a, watermark="0 seconds")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out, "res"))
        .option("checkpointLocation", os.path.join(out, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = {
        r.uid: r
        for r in spark.read.parquet(os.path.join(out, "res")).collect()
    }
    assert rows["m1"].acked and rows["m1"].ack_ts == _t(5)
    assert rows["m2"].acked and rows["m2"].ack_ts == _t(610)
    assert "m3" in rows and not rows["m3"].acked  # late ack == no ack
    assert "m4" in rows and not rows["m4"].acked
