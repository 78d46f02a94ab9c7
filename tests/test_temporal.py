"""As-of join + batch sessionization (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from skewer_spark.operators.temporal import as_of_join, session_agg


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_as_of_join_picks_latest_at_or_before(spark):
    cfg = spark.createDataFrame(
        [("u1", _ts(10), 100), ("u1", _ts(30), 300), ("u2", _ts(5), 500)],
        "k string, ts timestamp, version int",
    )
    ev = spark.createDataFrame(
        [
            ("u1", _ts(5), "before-any"),
            ("u1", _ts(10), "exactly-at"),     # inclusive: sees version 100
            ("u1", _ts(29), "mid"),
            ("u1", _ts(45), "after-second"),
            ("u2", _ts(50), "other-key"),
            ("u3", _ts(50), "no-cfg-key"),
        ],
        "k string, ts timestamp, label string",
    )
    out = {
        r["label"]: r["version"]
        for r in as_of_join(ev, cfg, key="k").collect()
    }
    assert out == {
        "before-any": None,
        "exactly-at": 100,
        "mid": 100,
        "after-second": 300,
        "other-key": 500,
        "no-cfg-key": None,
    }


def test_as_of_join_keeps_all_left_columns(spark):
    cfg = spark.createDataFrame([("u1", _ts(0), 1)], "k string, ts timestamp, v int")
    ev = spark.createDataFrame(
        [("u1", _ts(1), "x", 42)], "k string, ts timestamp, a string, b int"
    )
    row = as_of_join(ev, cfg, key="k").collect()[0]
    assert (row["a"], row["b"], row["v"]) == ("x", 42, 1)
    # one shuffle only: a single Exchange in the plan
    plan = as_of_join(ev, cfg, key="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_as_of_join_bucketed_equals_unbucketed(spark):
    """VERDICT r02 #8: the hot-key sub-bucket path must be result-
    identical, including carry-over across bucket boundaries (an event
    whose governing config lives several buckets earlier) and the
    inclusive-at-equal-ts contract."""
    import random

    rng = random.Random(8)
    cfg_rows = [
        (f"u{u}", _ts(m), u * 1000 + m)
        for u in range(4)
        for m in sorted(rng.sample(range(0, 59), 5))
    ]
    ev_rows = [
        (f"u{u}", _ts(m), f"e{u}-{i}")
        for u in range(5)                        # u4 has no cfg at all
        for i, m in enumerate(rng.choices(range(0, 59), k=40))
    ]
    # boundary case: exactly at a bucket edge + config far in the past
    ev_rows += [("u0", _ts(58), "edge"), ("u0", _ts(1), "early")]
    cfg = spark.createDataFrame(cfg_rows, "k string, ts timestamp, version int")
    ev = spark.createDataFrame(ev_rows, "k string, ts timestamp, label string")

    base = as_of_join(ev, cfg, key="k")
    # 300 s buckets → the hour splits into 12 sub-buckets, most configs
    # land buckets away from their events
    bucketed = as_of_join(ev, cfg, key="k", bucket_seconds=300)
    key_cols = ["k", "ts", "label", "version"]
    assert sorted(map(tuple, base.select(key_cols).collect())) == sorted(
        map(tuple, bucketed.select(key_cols).collect())
    )


def test_as_of_join_bucketing_splits_hot_key(spark):
    """Skew fixture: one user holds ~10% of all rows.  The bucketed
    window partitions by (key, time-bucket), so the hot key's largest
    partition group shrinks by ~the bucket count — the property that
    keeps one task from sorting 10% of 10^12 rows."""
    hot = [("hot", _ts(0) + dt.timedelta(seconds=6 * i), f"h{i}")
           for i in range(500)]                       # 3000 s span
    cold = [(f"u{u}", _ts(0) + dt.timedelta(seconds=60 * i), f"c{u}-{i}")
            for u in range(90) for i in range(50)]
    ev = spark.createDataFrame(hot + cold, "k string, ts timestamp, label string")
    cfg = spark.createDataFrame(
        [("hot", _ts(0), 1), ("u3", _ts(0), 2)], "k string, ts timestamp, v int"
    )
    bucket_s = 300
    out = as_of_join(ev, cfg, key="k", bucket_seconds=bucket_s)
    assert out.filter(F.col("k") == "hot").filter(F.col("v") == 1).count() == 500
    # the window's partition groups = (key, floor(ts/bucket)) counts;
    # the hot key spreads over 3000/300 = 10 groups of ~50 — the same
    # order as a cold user's per-bucket group, no 10%-of-table group left
    sizes = (
        ev.groupBy("k", F.floor(F.unix_micros("ts") / (bucket_s * 1_000_000)))
        .count().select("count").collect()
    )
    assert max(r["count"] for r in sizes) <= 60   # vs 500 unbucketed


def test_session_agg_gap_boundary(spark):
    # gap = 10 min; measured Spark semantics: diff <= gap merges (an
    # event at exactly prev + gap extends the session), diff > gap
    # starts a new one — the oracle SQL mirrors this with `>`
    ev = spark.createDataFrame(
        [
            ("u1", _ts(0)), ("u1", _ts(9)),    # merges (9 < 10)
            ("u1", _ts(19)),                    # merges (19-9 == gap exactly)
            ("u1", _ts(40)),                    # 21 min gap → new session
            ("u2", _ts(0)),
        ],
        "user_id string, ts timestamp",
    )
    rows = sorted(
        session_agg(ev, "user_id", "ts", "10 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    u1 = [r for r in rows if r["user_id"] == "u1"]
    counts = [r["n_events"] for r in u1]
    assert counts == [3, 1]
    assert u1[0]["session_start"] == _ts(0) and u1[0]["session_last"] == _ts(19)
    assert len([r for r in rows if r["user_id"] == "u2"]) == 1


def test_rolling_stats(spark):
    from skewer_spark.operators.temporal import rolling_stats

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
        ("b", 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = {(r["key"], r["ts"]): r for r in
           rolling_stats(df, window_rows=3).collect()}
    # head rows: honest partial windows
    assert out[("a", 1)]["roll_n"] == 1 and out[("a", 1)]["roll_mean"] == 10.0
    assert out[("a", 2)]["roll_n"] == 2 and out[("a", 2)]["roll_mean"] == 15.0
    assert out[("a", 3)]["roll_mean"] == 20.0
    # window slides: rows 2..4
    assert out[("a", 4)]["roll_mean"] == 30.0
    assert out[("a", 4)]["roll_min"] == 20.0 and out[("a", 4)]["roll_max"] == 40.0
    # keys are independent
    assert out[("b", 1)]["roll_n"] == 1


def test_rolling_stats_bounded_frame_plan(spark):
    from skewer_spark.operators.temporal import rolling_stats

    df = spark.createDataFrame(
        [("a", 1, 1.0)], "key string, ts long, value double"
    )
    plan = (
        rolling_stats(df, window_rows=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # bounded ROWS frame, not unboundedpreceding running state
    assert "specifiedwindowframe(RowFrame, -4, currentrow" in plan
    assert "unboundedpreceding" not in plan.lower()
    assert "hashpartitioning(key" in plan
