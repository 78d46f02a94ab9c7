"""HTML extraction + URL canonicalization unit tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from skewer_spark.operators.extract import (
    canonicalize_url,
    html_stats,
    html_to_text,
    url_dedup,
)


HTML_CASES = [
    # (html, expected visible text)
    (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Hello &amp; welcome</h1>"
        "<script>var x = '<p>not text</p>';</script>"
        "<p>first   para</p><!-- hidden --><a href='/x'>link</a></body></html>",
        "T Hello & welcome first para link",
    ),
    # double-escaped entity decodes exactly one level
    ("<p>&amp;lt;tag&amp;gt;</p>", "&lt;tag&gt;"),
    # nbsp + quotes + apostrophe
    ("<p>a&nbsp;b &quot;c&quot; &#39;d&#39;</p>", 'a b "c" \'d\''),
    # multiline script body, case-insensitive tags
    ("<SCRIPT type='x'>\nline1\nline2\n</ScRiPt>after", "after"),
    # comment spanning lines, tag spanning lines
    ("<!-- c1\nc2 --><div\nclass='y'>text</div>", "text"),
    # no markup at all
    ("plain text", "plain text"),
    # empty
    ("", ""),
]


URL_CASES = [
    # (raw, canonical)
    (
        "HTTP://WWW.Example.COM:80/path/?utm_source=x&b=2&a=1#frag",
        "http://www.example.com/path?a=1&b=2",
    ),
    ("https://example.com:8443/a//b/", "https://example.com:8443/a/b"),
    ("http://example.com", "http://example.com/"),
    (
        "https://user:pw@Sub.Example.com/path?a=1&a=0",
        "https://sub.example.com/path?a=0&a=1",
    ),
    ("ftp://Files.example.com:21/x", "ftp://files.example.com:21/x"),
    ("example.com/path", None),  # schemeless -> cannot canonicalize
    ("https://example.com/p?", "https://example.com/p"),
    ("https://example.com/p?gclid=z", "https://example.com/p"),
    ("https://example.com:443/", "https://example.com/"),
    ("  https://example.com/x  ", "https://example.com/x"),
]


@pytest.fixture(scope="module")
def html_df(spark):
    return spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], ["doc_id", "html"]
    )


def test_html_to_text_goldens(spark, html_df):
    got = {
        r["doc_id"]: r["text"]
        for r in html_to_text(html_df).select("doc_id", "text").collect()
    }
    for i, (_, want) in enumerate(HTML_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_html_stats(spark, html_df):
    rows = {r["id"]: r for r in html_stats(html_df).collect()}
    r0 = rows[0]
    assert r0["n_links"] == 1
    assert r0["n_scripts"] == 1
    assert r0["text_chars"] == len(HTML_CASES[0][1])
    assert 0.0 < r0["text_ratio"] < 1.0
    # plain text: no tags, ratio 1
    r5 = rows[5]
    assert r5["n_tags"] == 0 and r5["text_ratio"] == 1.0
    # empty html: no division blowup
    assert rows[6]["text_ratio"] == 0.0


def test_canonicalize_url_goldens(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], ["doc_id", "url"]
    )
    got = {
        r["doc_id"]: r["canon_url"] for r in canonicalize_url(df).collect()
    }
    for i, (_, want) in enumerate(URL_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_url_dedup_groups(spark):
    # three spellings of one resource + one distinct resource
    df = spark.createDataFrame(
        [
            (10, "https://Example.com/a?utm_source=t&x=1"),
            (11, "https://example.com:443/a/?x=1"),
            (12, "https://example.com/a?x=1#sec"),
            (13, "https://example.com/b"),
            (14, "no-scheme.com/a"),  # excluded (NULL canon)
        ],
        ["doc_id", "url"],
    )
    rows = {r["canon_url"]: r for r in url_dedup(df).collect()}
    assert rows["https://example.com/a?x=1"]["n_docs"] == 3
    assert rows["https://example.com/a?x=1"]["keeper_id"] == 10
    assert rows["https://example.com/b"]["n_docs"] == 1
    assert len(rows) == 2


def test_url_dedup_edge_inputs(spark):
    # r6: the schemeless exclusion moved to a cheap pre-canon scheme
    # regex — must keep excluding exactly the rows whose canon is NULL
    # (NULL url, empty, whitespace, no scheme) and keep every
    # scheme-bearing row, including exotic-but-valid scheme chars
    df = spark.createDataFrame(
        [
            (1, "   https://A.b/x  "),
            (2, "no-scheme.com/a"),
            (3, None),
            (4, ""),
            (5, "   "),
            (6, "a+b-c.d://Host/P?z=1&utm_x=9"),
            (7, "://missing-scheme.com"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canon_url"]: r["keeper_id"] for r in url_dedup(df).collect()}
    assert rows == {"https://a.b/x": 1, "a+b-c.d://host/P?z=1": 6}


def test_url_dedup_plan_compact(spark):
    """The only exchange is the groupBy(canon_url) — canonicalization
    rides the scan (no extra shuffle, no Python)."""
    df = spark.createDataFrame([(1, "https://e.com/a")], ["doc_id", "url"])
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
