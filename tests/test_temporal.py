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
