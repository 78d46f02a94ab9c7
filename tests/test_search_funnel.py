"""BM25 search, funnel, range join, sequence n-grams, context windows.

Covers the four operator families added in round 3:

* ``operators/search.py``  — inverted index + BM25 top-k, checked
  against an independent pure-Python BM25 computed inside the test;
* ``operators/funnel.py``  — ordered-step funnel (strict-after
  milestone semantics, monotone counts, conversion rates);
* ``operators/temporal.range_join`` — bucketed interval-containment
  join (boundary inclusivity, multi-bucket intervals, no duplicate
  pairs, plan never degrades to a nested-loop join);
* ``operators/transcripts.sequence_ngrams`` / ``context_windows``.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from skewer_spark.operators.funnel import funnel_counts, funnel_milestones
from skewer_spark.operators.search import (
    bm25_search,
    bm25_topk,
    build_inverted_index,
    corpus_stats,
)
from skewer_spark.operators.temporal import range_join
from skewer_spark.operators.transcripts import context_windows, sequence_ngrams


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "Spark joins fast; spark SCANS tables"),
    (2, "hash join beats nested loop join on big tables"),
    (3, "window functions rank rows"),
    (4, "the quick brown fox"),
    (5, ""),  # empty doc: counts toward n_docs/avgdl, no postings
]


def _py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_bm25(query: list[str], k1=1.2, b=0.75) -> dict[int, float]:
    """Independent per-row BM25 (Lucene idf variant) over _CORPUS."""
    toks = {d: _py_tokens(t) for d, t in _CORPUS}
    n = len(_CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores: dict[int, float] = {}
    for term in sorted(set(query)):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                contrib = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + contrib
    return {d: round(s, 6) for d, s in scores.items()}


def _docs(spark):
    return spark.createDataFrame(_CORPUS, "doc_id int, text string")


def test_inverted_index_postings(spark):
    idx = build_inverted_index(_docs(spark))
    rows = {(r.term, r.doc_id): (r.tf, r.dl) for r in idx.collect()}
    # "spark" appears twice in doc 1 (case-folded), dl = 6 tokens
    assert rows[("spark", 1)] == (2, 6)
    # punctuation splits: "joins" and "fast" are separate terms
    assert rows[("fast", 1)] == (1, 6)
    assert rows[("join", 2)] == (2, 9)
    # empty doc contributes no postings
    assert not any(d == 5 for (_, d) in rows)


def test_corpus_stats_counts_empty_docs(spark):
    s = corpus_stats(_docs(spark)).collect()[0]
    assert s.n_docs == 5
    assert s.avgdl == (6 + 9 + 4 + 4 + 0) / 5


def test_bm25_matches_independent_reference(spark):
    query = ["spark", "join", "tables"]
    got = {
        r.doc_id: (r.n_terms_hit, r.score)
        for r in bm25_search(_docs(spark), query, k=10).collect()
    }
    want = _py_bm25(query)
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d][1] - s) < 1e-6, (d, got[d], s)
    # doc 1 hits spark+tables(? "tables" appears in 1 and 2), doc 3/4 miss
    assert got[1][0] == 2 and got[2][0] == 2
    assert 3 not in got and 4 not in got


def test_bm25_topk_cut_and_tiebreak(spark):
    # two docs with identical token bags tie exactly; doc_id breaks it
    docs = spark.createDataFrame(
        [(10, "x y"), (11, "x y"), (12, "x x x z")],
        "doc_id int, text string",
    )
    out = bm25_search(docs, ["x"], k=2).collect()
    assert [r.doc_id for r in out][1:] == [10] or len(out) == 2
    scores = {r.doc_id: r.score for r in bm25_search(docs, ["x"], k=3).collect()}
    assert scores[10] == scores[11]
    # k cut keeps the lowest doc_id of the tied pair
    top2 = [r.doc_id for r in bm25_search(docs, ["x"], k=2).collect()]
    assert 10 in top2 and 11 not in top2


def test_bm25_unknown_term_is_noop(spark):
    idx = build_inverted_index(_docs(spark))
    st = corpus_stats(_docs(spark))
    out = bm25_topk(idx, st, ["zzz-not-present"], k=5).collect()
    assert out == []


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

_FUNNEL_EVENTS = [
    # u1 completes all three steps in order
    ("u1", _ts(1), "signup"),
    ("u1", _ts(2), "view"),
    ("u1", _ts(3), "purchase"),
    # u2: view BEFORE signup doesn't count; no view after → stops at 1
    ("u2", _ts(1), "view"),
    ("u2", _ts(2), "signup"),
    # u3: view at the SAME ts as signup → strict-after excludes it,
    # but a later view counts; purchase before that view doesn't
    ("u3", _ts(5), "signup"),
    ("u3", _ts(5), "view"),
    ("u3", _ts(6), "purchase"),
    ("u3", _ts(7), "view"),
    # u4 never signs up
    ("u4", _ts(1), "view"),
    ("u4", _ts(2), "purchase"),
]


def _funnel_df(spark):
    return spark.createDataFrame(
        _FUNNEL_EVENTS, "user_id string, ts timestamp, event_type string"
    )


def test_funnel_milestones_strict_after(spark):
    m = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts)
        for r in funnel_milestones(
            _funnel_df(spark), ["signup", "view", "purchase"]
        ).collect()
    }
    assert m["u1"] == (_ts(1), _ts(2), _ts(3))
    assert m["u2"] == (_ts(2), None, None)
    # u3: earliest view strictly after ts(5) is ts(7); no purchase after
    assert m["u3"] == (_ts(5), _ts(7), None)
    assert m["u4"] == (None, None, None)


def test_funnel_counts_monotone_and_rates(spark):
    out = {
        r.step: (r.step_name, r.n_reached, r.conversion)
        for r in funnel_counts(
            _funnel_df(spark), ["signup", "view", "purchase"]
        ).collect()
    }
    assert out[1] == ("signup", 3, 1.0)
    assert out[2] == ("view", 2, round(2 / 3, 6))
    assert out[3] == ("purchase", 1, 0.5)


def test_funnel_empty_step_gives_null_rate(spark):
    out = {
        r.step: (r.n_reached, r.conversion)
        for r in funnel_counts(
            _funnel_df(spark), ["signup", "error", "purchase"]
        ).collect()
    }
    assert out[2] == (0, 0.0)
    assert out[3][0] == 0 and out[3][1] is None  # 0/0 → NULL


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def _range_fixture(spark):
    ev = spark.createDataFrame(
        [
            ("u1", _ts(0), 1),    # exactly at i1 start → included
            ("u1", _ts(9), 2),    # inside i1
            ("u1", _ts(10), 3),   # exactly at i1 end → excluded (half-open)
            ("u1", _ts(25), 4),   # inside i2 (a later bucket of i2)
            ("u2", _ts(5), 5),    # same time as u1 but other key
            ("u1", _ts(59), 6),   # matches nothing
        ],
        "k string, ts timestamp, event_id int",
    )
    iv = spark.createDataFrame(
        [
            ("u1", _ts(0), _ts(10), "i1"),
            ("u1", _ts(8), _ts(40), "i2"),   # overlaps i1; spans 32 min
            ("u2", _ts(0), _ts(10), "i3"),
            ("u1", _ts(50), _ts(50), "empty"),    # zero-length: dropped
            ("u1", _ts(50), _ts(45), "inverted"),  # inverted: dropped
        ],
        "k string, start_ts timestamp, end_ts timestamp, iv_id string",
    )
    return ev, iv


def test_range_join_boundaries_and_overlap(spark):
    ev, iv = _range_fixture(spark)
    # bucket = 5 min → intervals span multiple buckets
    out = range_join(
        ev, iv, key="k", event_ts="ts", bucket_seconds=300
    ).select("event_id", "iv_id")
    pairs = sorted((r.event_id, r.iv_id) for r in out.collect())
    assert pairs == [
        (1, "i1"),          # start boundary inclusive
        (2, "i1"),
        (2, "i2"),          # overlapping intervals → both matched
        (3, "i2"),          # i1 end-exclusive, but inside i2
        (4, "i2"),
        (5, "i3"),          # key isolation
    ]


def test_range_join_no_duplicates_across_buckets(spark):
    ev, iv = _range_fixture(spark)
    # tiny buckets (30 s): i2 explodes onto 64 buckets; each event must
    # still pair with it exactly once
    out = range_join(ev, iv, key="k", event_ts="ts", bucket_seconds=30)
    n = out.count()
    assert n == out.select("event_id", "iv_id").distinct().count() == 6


def test_range_join_plan_is_equi_join(spark):
    ev, iv = _range_fixture(spark)
    plan = (
        range_join(ev, iv, key="k", event_ts="ts", bucket_seconds=300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# sequence n-grams / context windows
# ---------------------------------------------------------------------------

_TURNS = [
    ("c1", 1, "user", "t1"),
    ("c1", 2, "assistant", "t2"),
    ("c1", 3, "tool", "t3"),
    ("c1", 4, "assistant", "t4"),
    ("c2", 1, "user", "s1"),
    ("c2", 2, "assistant", "s2"),
    ("c2", 3, "tool", "s3"),
    ("c3", 1, "user", "only"),  # shorter than n → no pattern
]


def _turns_df(spark):
    return spark.createDataFrame(
        _TURNS, "conv_id string, turn_idx int, role string, text string"
    )


def test_sequence_ngrams_counts(spark):
    out = {
        r.pattern: r.n_occurrences
        for r in sequence_ngrams(_turns_df(spark), n=3).collect()
    }
    assert out == {
        "user>assistant>tool": 2,       # c1 and c2
        "assistant>tool>assistant": 1,  # c1 only
    }


def test_sequence_ngrams_null_token_kills_pattern(spark):
    """A NULL middle token must not collapse ['user', NULL, 'tool']
    into the pattern 'user>tool' (concat_ws silently skips nulls); any
    window containing a null token is excluded, matching the SQL
    oracle's null-propagating || chain."""
    df = spark.createDataFrame(
        [("c", 0, "user"), ("c", 1, None), ("c", 2, "tool"),
         ("c", 3, "assistant")],
        "conv_id string, turn_idx int, role string",
    )
    out = {r.pattern: r.n_occurrences
           for r in sequence_ngrams(df, n=2).collect()}
    # only the one fully-non-null window survives
    assert out == {"tool>assistant": 1}


def test_sequence_ngrams_bigrams(spark):
    out = {
        r.pattern: r.n_occurrences
        for r in sequence_ngrams(_turns_df(spark), n=2).collect()
    }
    assert out["user>assistant"] == 2
    assert out["assistant>tool"] == 2
    assert out["tool>assistant"] == 1
    assert sum(out.values()) == 5


def test_context_windows_stride_one(spark):
    out = {
        (r.conv_id, r.turn_idx): r.window_text
        for r in context_windows(_turns_df(spark), k=3, sep="|").collect()
    }
    assert out == {
        ("c1", 1): "t1|t2|t3",
        ("c1", 2): "t2|t3|t4",
        ("c2", 1): "s1|s2|s3",
    }


def test_context_windows_k1_is_identity(spark):
    out = context_windows(_turns_df(spark), k=1, sep="|")
    assert out.count() == len(_TURNS)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_matches_reference(spark):
    from skewer_spark.operators.search import rrf_fuse

    lex = [("d1", 9.5), ("d2", 7.25), ("d3", 5.0), ("d4", 5.0)]
    dense = [("d3", 0.99), ("d5", 0.8), ("d1", 0.6)]
    f1 = spark.createDataFrame(lex, "doc_id string, score double")
    f2 = spark.createDataFrame(dense, "doc_id string, score double")

    # independent reference: rank by (score desc, id asc), 1/(60+rank)
    def ranks(lst):
        return {
            d: i + 1
            for i, (d, _s) in enumerate(
                sorted(lst, key=lambda t: (-t[1], t[0]))
            )
        }

    r1, r2 = ranks(lex), ranks(dense)
    want = {}
    for d in set(r1) | set(r2):
        want[d] = round(
            (1.0 / (60 + r1[d]) if d in r1 else 0.0)
            + (1.0 / (60 + r2[d]) if d in r2 else 0.0),
            6,
        )

    got = {r.doc_id: r.rrf_score for r in rrf_fuse([f1, f2]).collect()}
    assert got == want
    n_lists = {r.doc_id: r.n_lists for r in rrf_fuse([f1, f2]).collect()}
    assert n_lists == {"d1": 2, "d2": 1, "d3": 2, "d4": 1, "d5": 1}


def test_rrf_fuse_k_cut_is_deterministic(spark):
    from skewer_spark.operators.search import rrf_fuse

    # ten docs with identical single-list scores: rank ties broken by id,
    # the k-cut must keep the lexicographically smallest ids at each rank
    rows = [(f"d{i:02d}", 1.0) for i in range(10)]
    f = spark.createDataFrame(rows, "doc_id string, score double")
    got = [r.doc_id for r in rrf_fuse([f], k=3).collect()]
    assert got == ["d00", "d01", "d02"]
