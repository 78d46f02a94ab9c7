"""Key-skew diagnostics + dedup text normalization tests."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from skewer_spark.functions.text import normalize_for_dedup
from skewer_spark.operators.skew import key_skew_report


def test_normalize_for_dedup_goldens(spark):
    cases = [
        ("Café, über-naïve!  Crème #42", "cafe uber naive creme 00"),
        ("HELLO   World", "hello world"),
        ("price: $1,234.56", "price 0 000 00"),
        ("", ""),
        ("ØRSTED år 2024", "orsted ar 0000"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"]
    )
    got = {
        r["i"]: r["norm"]
        for r in df.select("i", normalize_for_dedup("text").alias("norm")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_normalized_variants_hash_identically(spark):
    variants = [
        "The QUICK brown fox, aged 7!",
        "the quick brown fox aged 3",
        "Thé quick brown fox — aged 9?",
    ]
    df = spark.createDataFrame([(t,) for t in variants], ["text"])
    norms = df.select(
        F.md5(normalize_for_dedup("text")).alias("h")
    ).distinct().count()
    assert norms == 1


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (60 rows), one warm (30), ten cold (1 each)
    rows = (
        [("hot", i) for i in range(60)]
        + [("warm", i) for i in range(30)]
        + [(f"cold{i}", 0) for i in range(10)]
    )
    return spark.createDataFrame(rows, ["k", "v"])


def test_key_skew_report_values(spark, skewed):
    out = key_skew_report(skewed, ["k"], top_n=3).collect()
    assert len(out) == 3
    by_rank = {r["rank"]: r for r in out}
    top = by_rank[1]
    assert top["k"] == "hot" and top["cnt"] == 60
    assert top["n_rows"] == 100 and top["n_keys"] == 12
    assert top["share"] == 0.6
    # skew_ratio = max / mean = 60 / (100/12)
    assert abs(top["skew_ratio"] - 60 / (100 / 12)) < 1e-6
    # top_share covers the 3 returned keys: (60+30+1)/100
    assert abs(top["top_share"] - 0.91) < 1e-6
    assert by_rank[2]["k"] == "warm"
    assert by_rank[3]["k"] == "cold0"  # tie among colds -> smallest key
    # entropy vs independent reference
    ps = [60 / 100, 30 / 100] + [1 / 100] * 10
    h_ref = -sum(p * math.log2(p) for p in ps)
    assert abs(top["entropy"] - h_ref) < 1e-6
    assert abs(top["entropy_max"] - math.log2(12)) < 1e-6


def test_key_skew_plan_takeordered(spark, skewed):
    """Top-k must be TakeOrderedAndProject — never a global sort or a
    corpus-global single-partition window over all keys."""
    plan = (
        key_skew_report(skewed, ["k"], top_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_join_size_estimate(spark):
    from skewer_spark.operators.skew import join_size_estimate

    left = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("a", 0), ("b", 0), ("only_l", 0)],
        ["k", "x"],
    )
    right = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("a", 0), ("c", 0)], ["k", "y"]
    )
    rows = join_size_estimate(left, right, ["k"], top_n=2).collect()
    byrank = {r["rank"]: r for r in rows}
    # exact full size: hot 100*50 + a 1*1 = 5001
    assert byrank[1]["k"] == "hot" and byrank[1]["pairs"] == 5000
    assert byrank[1]["total_pairs"] == 5001
    assert byrank[1]["n_join_keys"] == 2  # only_l / b / c never join
    # verify against the actual join
    assert left.join(right, "k").count() == 5001
    assert abs(byrank[1]["top_frac"] - 1.0) < 1e-9


def test_join_size_estimate_plan(spark):
    from skewer_spark.operators.skew import join_size_estimate

    left = spark.createDataFrame([("a", 1)], ["k", "x"])
    right = spark.createDataFrame([("a", 1)], ["k", "y"])
    plan = (
        join_size_estimate(left, right, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
