"""CDC merge semantics: last-write-wins upsert with deletes, tie
handling, pass-through, and SCD2 validity ranges — against hand-built
expected tables."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from skewer_spark.operators.cdc import (
    apply_cdc_log,
    latest_changes,
    scd2_history,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, status string, price double",
    )


def _changes(spark):
    rows = [
        # k=1: U then later U — latest wins
        (1, "a2", 11.0, _ts("2024-01-02T00:00:00"), "U", 1),
        (1, "a3", 12.0, _ts("2024-01-03T00:00:00"), "U", 2),
        # k=2: deleted
        (2, None, None, _ts("2024-01-02T00:00:00"), "D", 3),
        # k=3: updated then deleted then re-inserted (latest = I)
        (3, "c2", 31.0, _ts("2024-01-02T00:00:00"), "U", 4),
        (3, None, None, _ts("2024-01-03T00:00:00"), "D", 5),
        (3, "c3", 33.0, _ts("2024-01-04T00:00:00"), "I", 6),
        # k=5: brand-new key inserted
        (5, "e", 50.0, _ts("2024-01-02T00:00:00"), "I", 7),
        # k=6: delete of a key that never existed — no-op
        (6, None, None, _ts("2024-01-02T00:00:00"), "D", 8),
    ]
    return spark.createDataFrame(
        rows, "k int, status string, price double, ts timestamp, "
        "op string, seq long"
    )


def test_apply_cdc_log(spark):
    out = apply_cdc_log(
        _base(spark), _changes(spark), ["k"], "ts", "op", "seq"
    )
    got = {r.k: (r.status, r.price) for r in out.collect()}
    assert got == {
        1: ("a3", 12.0),   # latest update
        3: ("c3", 33.0),   # delete then re-insert
        4: ("d", 40.0),    # untouched pass-through
        5: ("e", 50.0),    # new key
    }
    assert set(out.columns) == {"k", "status", "price"}


def test_same_ts_ties_break_on_seq(spark):
    ch = spark.createDataFrame(
        [
            (1, "x", 1.0, _ts("2024-01-02T00:00:00"), "U", 1),
            (1, "y", 2.0, _ts("2024-01-02T00:00:00"), "U", 2),
        ],
        "k int, status string, price double, ts timestamp, op string, "
        "seq long",
    )
    [r] = latest_changes(ch, ["k"], "ts", "op", "seq").collect()
    assert r.status == "y"


def test_changes_missing_columns_raise(spark):
    bad = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), "U")], "k int, ts timestamp, op string"
    )
    with pytest.raises(ValueError):
        apply_cdc_log(_base(spark), bad, ["k"], "ts", "op")


def test_idempotent_reapply(spark):
    # applying the same log twice == applying once (MERGE idempotence)
    base, ch = _base(spark), _changes(spark)
    once = apply_cdc_log(base, ch, ["k"], "ts", "op", "seq")
    twice = apply_cdc_log(once, ch, ["k"], "ts", "op", "seq")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_scd2_history(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "bronze"),
            (1, _ts("2024-01-02T00:00:00"), "bronze"),  # no-op collapses
            (1, _ts("2024-01-03T00:00:00"), "silver"),
            (1, _ts("2024-01-05T00:00:00"), "gold"),
            (2, _ts("2024-01-01T00:00:00"), "bronze"),
        ],
        "k int, ts timestamp, tier string",
    )
    rows = sorted(
        scd2_history(ev, ["k"], "ts", ["tier"]).collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    assert [(r.k, r.tier, r.valid_to is None) for r in rows] == [
        (1, "bronze", False),
        (1, "silver", False),
        (1, "gold", True),
        (2, "bronze", True),
    ]
    # ranges chain with no gaps
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].is_current and rows[3].is_current


def test_invalid_op_fails_loud(spark):
    """A NULL/unknown op must raise, not vanish: downstream a NULL op
    means 'key has no changes', so an unvalidated NULL makes an insert
    disappear and an update silently not apply."""
    base = _base(spark)
    for bad_op in (None, "X"):
        rows = [(9, "z", 90.0, _ts("2024-01-02T00:00:00"), bad_op, 1)]
        chg = spark.createDataFrame(
            rows, "k int, status string, price double, ts timestamp, "
            "op string, seq long"
        )
        with pytest.raises(Exception, match="invalid 'op'"):
            apply_cdc_log(base, chg, ["k"], "ts", "op", "seq").collect()
