"""dedup_and_rank: bucketed two-phase rank equals the plain window rank
and removes (conv_id, turn_idx) duplicates — including across bucket
boundaries and with a hot conversation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from skewer_spark.operators.enrich import dedup_and_rank


def _mk(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", f"line {c}/{t}", "none", datetime(2026, 1, 1)) for c, t in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_rank_matches_plain_window(spark):
    # conv a: gappy turn ids spanning several buckets (bucket_size=10);
    # conv b: tiny; conv hot: 95 turns (≈10 buckets)
    rows = [("a", t) for t in (0, 3, 7, 15, 23, 31, 55, 99)]
    rows += [("b", 5), ("b", 2)]
    rows += [("hot", t) for t in range(95)]
    df = _mk(spark, rows)

    got = (
        dedup_and_rank(df, bucket_size=10)
        .select("conv_id", "turn_idx", "turn_rank")
        .collect()
    )
    got_map = {(r.conv_id, r.turn_idx): r.turn_rank for r in got}

    for conv in ("a", "b", "hot"):
        turns = sorted(t for c, t in rows if c == conv)
        for rank, t in enumerate(turns, start=1):
            assert got_map[(conv, t)] == rank, (conv, t)


def test_dedup_removes_duplicate_turns(spark):
    rows = [("a", 1), ("a", 1), ("a", 2), ("a", 10), ("a", 10), ("a", 11),
            ("b", 0), ("b", 0)]
    df = _mk(spark, rows)
    out = dedup_and_rank(df, bucket_size=10).select(
        "conv_id", "turn_idx", "turn_rank"
    ).collect()
    seen = {(r.conv_id, r.turn_idx) for r in out}
    assert seen == {("a", 1), ("a", 2), ("a", 10), ("a", 11), ("b", 0)}
    ranks = {(r.conv_id, r.turn_idx): r.turn_rank for r in out}
    assert ranks[("a", 1)] == 1 and ranks[("a", 2)] == 2
    assert ranks[("a", 10)] == 3 and ranks[("a", 11)] == 4
    assert ranks[("b", 0)] == 1


def test_duplicate_across_bucket_boundary(spark):
    # turn 10 duplicated: both copies land in bucket 1 (10//10) — dedup
    # must still keep exactly one and ranks stay dense
    rows = [("c", 9), ("c", 10), ("c", 10), ("c", 19), ("c", 20)]
    out = dedup_and_rank(_mk(spark, rows), bucket_size=10)
    pdf = out.select("conv_id", "turn_idx", "turn_rank").toPandas()
    assert len(pdf) == 4
    assert sorted(pdf["turn_rank"]) == [1, 2, 3, 4]
