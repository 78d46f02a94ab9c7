"""Byte-parity differential tests: the numpy batch wire encoders
(`sinks/wire_batch.py`) against the pure-expression encoders
(`sinks/wire.py`) they replace on the hot query paths.

The three binary wire queries oracle-hash their bytes, so the batch
path must be byte-IDENTICAL, not just semantically equal.  Parity is
pinned on (a) the full sf0.001 routed fixture — every producer shape,
every degradation branch — and (b) an adversarial hand-built frame
(nulls everywhere, unicode, empty strings, sub-second + pre-epoch
timestamps, nested/empty/invalid properties payloads).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skewer_spark.sinks.wire import (
    encode_avro,
    encode_fullavro,
    encode_protobuf,
)
from skewer_spark.sinks.wire_batch import (
    encode_avro_batch,
    encode_fullavro_batch,
    encode_protobuf_batch,
)

SF = "/root/testdata/sf0.001"


def _routed(spark):
    import __spark_entry__ as entry

    return entry._routed_events(spark, SF)


def _enveloped(spark):
    r = _routed(spark)
    return (
        r.withColumn(
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


def _assert_bytes_equal(df, expr_col, batch_col, key="turn_idx"):
    rows = (
        df.select(
            F.col(key).alias("k"),
            expr_col.alias("e"),
            batch_col.alias("b"),
        )
        .collect()
    )
    assert rows, "empty differential frame"
    for r in rows:
        e = bytes(r["e"]) if r["e"] is not None else None
        b = bytes(r["b"]) if r["b"] is not None else None
        assert e == b, (
            r["k"],
            e.hex() if e else None,
            b.hex() if b else None,
        )


def test_protobuf_batch_parity_fixture(spark):
    _assert_bytes_equal(_routed(spark), encode_protobuf(),
                        encode_protobuf_batch())


def test_avro_batch_parity_fixture(spark):
    _assert_bytes_equal(_routed(spark), encode_avro(), encode_avro_batch())


def test_fullavro_batch_parity_fixture(spark):
    _assert_bytes_equal(_enveloped(spark), encode_fullavro(),
                        encode_fullavro_batch())


@pytest.fixture()
def adversarial(spark):
    rows = [
        # (turn_idx, pri, fac, sev, ver, t_rep, t_gen, host, app, procid,
        #  msgid, structured, message, properties_json)
        (1, 0, 0, 0, 0, None, None, "", "", "", "", "", "", None),
        (2, 191, 23, 7, 1, "2024-01-10 01:02:03", "2024-01-10 01:02:03.5",
         "höst✓", "äpp", "p1", "MSG01", '[meta k="v"]', "msg é" * 10,
         '{"meta":{"k":"v"},"z":{"b":"2","a":"1"}}'),
        (3, 5, None, None, None, "1969-12-31 23:59:59.999999", None,
         None, "a", None, "m", None, "x", '{"empty":{}}'),
        (4, 2**31 - 1, 1, 1, 1, "2024-06-05 12:13:14.000001",
         "2262-04-11 23:47:16", "h", "", "p", "", "", "",
         '{"outer":null}'),
        (5, 1, 1, 1, 1, "2024-01-01 00:00:00", "2024-01-01 00:00:00",
         "h", "a", "p", "m", "s", "m", "not json at all"),
        (6, 1, 1, 1, 1, "2024-01-01 00:00:00", "2024-01-01 00:00:00",
         "h", "a", "p", "m", "s", "m", '{"k":{"ü":"ß","a":"✓"}}'),
        (7, 1, 1, 1, 1, "2024-01-01 00:00:00", "2024-01-01 00:00:00",
         "h", "a", "p", "m", "s", "m", "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "turn_idx int, priority int, facility int, severity int, "
        "version int, time_reported string, time_generated string, "
        "hostname string, appname string, procid string, msgid string, "
        "structured string, message string, properties_json string",
    )
    return (
        df.withColumn("time_reported", F.col("time_reported").cast("timestamp"))
        .withColumn("time_generated", F.col("time_generated").cast("timestamp"))
        .withColumn("facility_name", F.coalesce("hostname", F.lit("kern")))
        .withColumn("severity_name", F.lit("info"))
        .withColumn("client_addr", F.lit(None).cast("string"))
        .withColumn("source_type", F.lit("tcp"))
        .withColumn("source_path", F.lit(""))
        .withColumn("source_port", F.lit(0))
        .withColumn("uid", F.sha2(F.col("turn_idx").cast("string"), 256))
    )


def test_protobuf_batch_parity_adversarial(spark, adversarial):
    _assert_bytes_equal(adversarial, encode_protobuf(),
                        encode_protobuf_batch())


def test_avro_batch_parity_adversarial(spark, adversarial):
    _assert_bytes_equal(adversarial, encode_avro(), encode_avro_batch())


def test_fullavro_batch_parity_adversarial(spark, adversarial):
    _assert_bytes_equal(adversarial, encode_fullavro(),
                        encode_fullavro_batch())
