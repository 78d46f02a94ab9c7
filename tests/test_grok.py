"""Grok compiler + extraction: compiled regexes are verified against
an independent Python ``re`` reference, and field/group alignment is
pinned for nested named patterns (SYSLOGBASE carries fields two levels
deep)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from skewer_spark.operators.grok import (
    GROK_PATTERNS,
    compile_grok,
    grok_extract,
    grok_filter,
)


def test_compile_simple_fields_in_order():
    rx, fields = compile_grok(r"%{IP:ip} %{WORD:verb} %{NUMBER:code}")
    assert fields == ["ip", "verb", "code"]
    m = re.fullmatch(rx, "10.2.0.4 GET 200")
    assert m and m.group(1) == "10.2.0.4"
    assert m.group(2) == "GET" and m.group(3) == "200"


def test_nested_named_fields_group_alignment():
    # SYSLOGBASE → timestamp, logsource, then SYSLOGPROG's program/pid:
    # outer groups must precede nested ones
    rx, fields = compile_grok(r"%{SYSLOGBASE} %{GREEDYDATA:msg}")
    assert fields == ["timestamp", "logsource", "program", "pid", "msg"]
    line = "Jan  2 03:04:05 web01 sshd[4242]: accepted"
    m = re.search(rx, line)
    assert m
    assert m.group(1) == "Jan  2 03:04:05"
    assert m.group(2) == "web01"
    assert m.group(3) == "sshd"
    assert m.group(4) == "4242"
    assert m.group(5) == "accepted"
    # pid is optional
    m2 = re.search(rx, "Jan  2 03:04:05 web01 cron: tick")
    assert m2 and m2.group(3) == "cron" and m2.group(4) is None


def test_every_library_pattern_compiles_and_runs():
    for name in GROK_PATTERNS:
        rx, _ = compile_grok(f"%{{{name}:x}}")
        re.compile(rx)  # valid Python/Java-subset regex


def test_errors():
    with pytest.raises(KeyError):
        compile_grok(r"%{NOPE:x}")
    with pytest.raises(ValueError):
        compile_grok(r"%{IP:a} %{IP:a}")
    with pytest.raises(ValueError):
        compile_grok(r"%{LOOP:x}", extra_patterns={"LOOP": r"%{LOOP}a"})


def _apache_lines():
    good = [
        '10.0.0.1 - alice [01/Jan/2024:00:00:07 +0000] '
        '"GET /idx.html HTTP/1.1" 200 1543',
        '192.168.7.25 - - [13/Feb/2024:11:59:59 -0500] '
        '"POST /api/v2/upload HTTP/1.0" 503 -',
        'cache-3.example.com - bob [31/Dec/2023:23:00:00 +0100] '
        '"BREW /pot" 418 12',
    ]
    bad = ["not a log line", "10.0.0.1 missing everything 200"]
    return good, bad


def test_grok_extract_matches_python_reference(spark):
    good, bad = _apache_lines()
    rx, fields = compile_grok(r"^%{COMMONAPACHELOG}$")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(good + bad)], "id int, text string"
    )
    rows = {
        r.id: r
        for r in grok_extract(df, r"^%{COMMONAPACHELOG}$").collect()
    }
    for i, line in enumerate(good + bad):
        m = re.search(rx, line)
        r = rows[i]
        assert r.grok_match == bool(m), line
        for gi, f in enumerate(fields):
            want = (m.group(gi + 1) or "") if m else ""
            assert getattr(r, f) == want, (line, f)
    # spot-check semantics, not just parity
    assert rows[0].clientip == "10.0.0.1"
    assert rows[0].verb == "GET" and rows[0].bytes == "1543"
    assert rows[1].response == "503" and rows[1].bytes == ""
    assert rows[2].httpversion == ""  # HTTP/x.x optional


def test_grok_filter(spark):
    good, bad = _apache_lines()
    df = spark.createDataFrame(
        [(t,) for t in good + bad], "text string"
    )
    kept = grok_filter(df, r"^%{COMMONAPACHELOG}$").count()
    assert kept == len(good)


def test_extract_requires_named_fields(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        grok_extract(df, r"%{IP}")


def test_extract_cast_int(spark):
    # grok fields are strings by design; downstream cast works
    df = spark.createDataFrame([("latency=250 ms",)], "text string")
    out = grok_extract(df, r"latency=%{INT:ms}").select(
        F.col("ms").cast("int").alias("ms")
    )
    assert out.collect()[0].ms == 250


def test_raw_capturing_group_rejected(spark):
    """A bare '(' in the template would shift every named field one
    group over (field w extracting 'foo' instead of 'hello') — refuse
    at compile time; the (?:...) form works and aligns correctly."""
    import pytest

    from skewer_spark.operators.grok import compile_grok, grok_extract

    with pytest.raises(ValueError, match="capturing group"):
        compile_grok(r"(foo|bar) %{WORD:w}")
    with pytest.raises(ValueError, match="capturing group"):
        compile_grok(r"(?<who>foo|bar) %{WORD:w}")  # Java named = capturing

    rx, fields = compile_grok(r"(?:foo|bar) %{WORD:w}")
    assert fields == ["w"]
    df = spark.createDataFrame([("foo hello",)], "text string")
    row = grok_extract(df, r"(?:foo|bar) %{WORD:w}").collect()[0]
    assert row.w == "hello" and row.grok_match
