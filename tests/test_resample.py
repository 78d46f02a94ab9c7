"""resample_locf: grid coverage, LOCF semantics, tie determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from skewer_spark.operators.temporal import resample_locf


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_locf_fills_gaps_and_flags_them(spark):
    rows = [
        ("a", _ts(0, 10), 1.0),
        ("a", _ts(0, 50), 2.0),   # same bucket: last wins
        ("a", _ts(3, 5), 7.0),    # buckets 1,2 are gaps
        ("b", _ts(1, 0), 9.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = resample_locf(df, "key", interval_seconds=3600)
    got = {
        (r.key, r.bucket_start.hour): (r.value, r.is_observed)
        for r in out.collect()
    }
    assert got[("a", 0)] == (2.0, True)
    assert got[("a", 1)] == (2.0, False)
    assert got[("a", 2)] == (2.0, False)
    assert got[("a", 3)] == (7.0, True)
    assert got[("b", 1)] == (9.0, True)
    assert len(got) == 5  # b has a single-bucket span — no invented grid


def test_same_ts_tie_breaks_on_event_id(spark):
    rows = [
        ("a", 2, _ts(0), 5.0),
        ("a", 7, _ts(0), 3.0),  # same ts: higher event_id wins
    ]
    df = spark.createDataFrame(
        rows, "key string, event_id long, ts timestamp, value double"
    )
    out = resample_locf(df, "key", interval_seconds=3600)
    [r] = out.collect()
    assert r.value == 3.0
