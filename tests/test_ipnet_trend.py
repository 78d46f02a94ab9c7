"""Unit tests: CIDR longest-prefix enrich, exact linear trend,
interval coalescing."""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.operators.aggregate import linear_trend
from skewer_spark.operators.ipnet import (
    cidr_enrich,
    demo_cidr_table,
    expand_cidrs,
    ip_to_long,
)
from skewer_spark.operators.temporal import coalesce_intervals


def test_ip_to_long(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("255.255.255.255",), ("10.32.7.9",)], ["ip"]
    )
    got = [r[0] for r in df.select(ip_to_long(F.col("ip"))).collect()]
    assert got == [0, 4294967295, 10 * 2**24 + 32 * 2**16 + 7 * 256 + 9]


def test_expand_cidr_counts(spark):
    dim = spark.createDataFrame(
        [("10.0.0.0/8",), ("10.32.0.0/16",), ("10.32.7.0/24",)], ["cidr"]
    )
    rows = expand_cidrs(dim).groupBy("cidr").count().collect()
    by = {r["cidr"]: r["count"] for r in rows}
    # /8 covers 256 /16 blocks; /16 and /24 each land in exactly one
    assert by == {"10.0.0.0/8": 256, "10.32.0.0/16": 1, "10.32.7.0/24": 1}


def test_expand_cidr_normalizes_sloppy_base(spark):
    # a feed row whose base has host bits set must normalise
    dim = spark.createDataFrame([("10.1.1.7/16",)], ["cidr"])
    row = expand_cidrs(dim).collect()[0]
    assert row["net_start"] == 10 * 2**24 + 1 * 2**16
    assert row["net_end"] == 10 * 2**24 + 1 * 2**16 + 65535


def test_cidr_enrich_longest_prefix_wins(spark):
    probe = spark.createDataFrame(
        [
            (1, "10.32.7.200"),   # matches /8, /12, /16, /24 → /24 wins
            (2, "10.32.9.1"),     # /8, /12, /16 → /16
            (3, "10.40.0.1"),     # /8, /12 → /12
            (4, "10.200.0.1"),    # /8 only
            (5, "192.168.150.3"), # /16, /20 → /20
            (6, "8.8.8.8"),       # no match
            (7, "100.127.255.255"),  # cgnat /10 upper edge
            (8, "100.128.0.0"),   # just past the /10 → miss
        ],
        ["id", "ip"],
    )
    out = cidr_enrich(probe, demo_cidr_table(spark), ip_col="ip")
    got = {r["id"]: (r["net_name"], r["prefix_len"]) for r in out.collect()}
    assert got == {
        1: ("corp-west-dc1-mgmt", 24),
        2: ("corp-west-dc1", 16),
        3: ("corp-west", 12),
        4: ("corp", 8),
        5: ("lab-gpu", 20),
        6: (None, None),
        7: ("cgnat", 10),
        8: (None, None),
    }
    assert out.count() == 8  # row-preserving on the probe side


def test_cidr_enrich_is_broadcast_equi_join(spark):
    probe = spark.createDataFrame([(1, "10.1.2.3")], ["id", "ip"])
    plan = cidr_enrich(probe, demo_cidr_table(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_linear_trend_exact_line(spark):
    # y = 3x + 7 exactly → slope 3, intercept 7, r² 1
    rows = [("k", x, 3 * x + 7) for x in range(0, 100, 7)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    got = linear_trend(df, ["k"], "x", "y").collect()[0]
    assert (got["slope"], got["intercept"], got["r2"]) == (3.0, 7.0, 1.0)
    assert got["n_points"] == len(rows)


def test_linear_trend_degenerate(spark):
    df = spark.createDataFrame(
        [("one", 5, 9), ("flatx", 2, 1), ("flatx", 2, 8)], ["k", "x", "y"]
    )
    got = {r["k"]: r for r in linear_trend(df, ["k"], "x", "y").collect()}
    # single point and zero x-variance both yield NULL trend fields
    for k in ("one", "flatx"):
        assert got[k]["slope"] is None
        assert got[k]["intercept"] is None
        assert got[k]["r2"] is None


def test_linear_trend_flat_y(spark):
    # horizontal line: slope 0, r² NULL (zero y-variance)
    df = spark.createDataFrame([("k", x, 4) for x in range(5)], ["k", "x", "y"])
    got = linear_trend(df, ["k"], "x", "y").collect()[0]
    assert got["slope"] == 0.0 and got["intercept"] == 4.0
    assert got["r2"] is None


def test_coalesce_intervals_touch_and_gap(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 5),
            ("a", 5, 9),    # touches [1,5] → merges
            ("a", 11, 12),  # gap of 2 → new island
            ("a", 2, 3),    # nested inside [1,9]
            ("b", 1, 5),
            ("b", 6, 9),    # 6 > 5 → does NOT merge (inclusive-touch rule)
        ],
        ["k", "start", "end"],
    )
    out = coalesce_intervals(df, ["k"], "start", "end")
    rows = {
        (r["k"], r["island_start"]): (r["island_end"], r["n_intervals"], r["covered"])
        for r in out.collect()
    }
    assert rows == {
        ("a", 1): (9, 3, 8),
        ("a", 11): (12, 1, 1),
        ("b", 1): (5, 1, 4),
        ("b", 6): (9, 1, 3),
    }
