"""Multiline merge + rate limiting semantics."""

from __future__ import annotations

import datetime as dt

from skewer_spark.operators.flow import merge_multiline, rate_limit


def test_merge_multiline_stack_trace(spark):
    lines = [
        ("a.log", 1, "ERROR boom failed"),
        ("a.log", 2, "at com.example.Foo.bar(Foo.java:10)"),
        ("a.log", 3, "at com.example.Main.run(Main.java:5)"),
        ("a.log", 4, "Caused by: java.io.IOException"),
        ("a.log", 5, "INFO next message"),
        ("a.log", 6, "  wrapped detail"),
        ("b.log", 1, "INFO solo"),
    ]
    df = spark.createDataFrame(
        lines, "path string, line_no int, text string"
    )
    rows = sorted(
        merge_multiline(df).collect(),
        key=lambda r: (r.path, r.first_line_no),
    )
    assert [(r.path, r.n_lines) for r in rows] == [
        ("a.log", 4),
        ("a.log", 2),
        ("b.log", 1),
    ]
    assert rows[0].text == (
        "ERROR boom failed\n"
        "at com.example.Foo.bar(Foo.java:10)\n"
        "at com.example.Main.run(Main.java:5)\n"
        "Caused by: java.io.IOException"
    )
    assert rows[1].text == "INFO next message\n  wrapped detail"


def test_merge_multiline_leading_continuation_kept(spark):
    df = spark.createDataFrame(
        [("a", 1, "  orphan tail"), ("a", 2, "HDR msg")],
        "path string, line_no int, text string",
    )
    rows = sorted(merge_multiline(df).collect(), key=lambda r: r.record_no)
    assert [(r.record_no, r.text) for r in rows] == [
        (0, "  orphan tail"),
        (1, "HDR msg"),
    ]


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def test_rate_limit_burst_per_window(spark):
    rows = [("k1", _ts(i), i) for i in range(10)]  # all in window 0..59s
    rows += [("k1", _ts(70 + i), 100 + i) for i in range(3)]  # next win
    rows += [("k2", _ts(i), 200 + i) for i in range(2)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, seq long")
    out = rate_limit(
        df, ["key"], "ts", burst=4, interval_seconds=60,
        tiebreak_col="seq",
    ).collect()
    admitted = {(r.key, r.seq) for r in out if r.admitted}
    assert admitted == {
        ("k1", 0), ("k1", 1), ("k1", 2), ("k1", 3),  # first 4 of win 0
        ("k1", 100), ("k1", 101), ("k1", 102),       # window 1 under burst
        ("k2", 200), ("k2", 201),
    }
    # nothing dropped — only flagged
    assert len(out) == len(rows)


def test_rate_limit_deterministic_on_ties(spark):
    rows = [("k", _ts(0), i) for i in range(6)]  # identical ts
    df = spark.createDataFrame(rows, "key string, ts timestamp, seq long")
    out = rate_limit(
        df, ["key"], "ts", burst=3, interval_seconds=60,
        tiebreak_col="seq",
    )
    got = sorted(r.seq for r in out.collect() if r.admitted)
    assert got == [0, 1, 2]


def test_merge_multiline_null_text_never_lost(spark):
    """NULL text must not silently fold into the previous record (its
    content dropped while counted), nor start a record_no=NULL phantom
    group: it normalizes to '' and becomes its own empty record."""
    lines = [
        ("a.log", 1, "ERROR first"),
        ("a.log", 2, None),
        ("a.log", 3, "  continuation of what?"),
        ("b.log", 1, None),          # group-leading NULL
        ("b.log", 2, "INFO real"),
    ]
    df = spark.createDataFrame(
        lines, "path string, line_no int, text string"
    )
    rows = sorted(
        merge_multiline(df).collect(),
        key=lambda r: (r.path, r.first_line_no),
    )
    assert all(r.record_no is not None for r in rows)
    # a.log: NULL is a header ('' is not a continuation), taking the
    # following continuation line with it
    a = [r for r in rows if r.path == "a.log"]
    assert [(r.n_lines, r.text) for r in a] == [
        (1, "ERROR first"),
        (2, "\n  continuation of what?"),
    ]
    # b.log: leading NULL is its own record, INFO starts the next
    b = [r for r in rows if r.path == "b.log"]
    assert [(r.n_lines, r.text) for r in b] == [(1, ""), (1, "INFO real")]
    # nothing lost: total member lines == input lines
    assert sum(r.n_lines for r in rows) == len(lines)
