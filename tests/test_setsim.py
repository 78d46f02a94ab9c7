"""Exact prefix-filtered Jaccard join vs a brute-force Python oracle."""

from __future__ import annotations

import itertools
import re

from skewer_spark.operators.setsim import prefix_jaccard_pairs

_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "pack my box with five dozen liquor jugs"),
    (3, "pack my box with five dozen liquor jugs"),       # exact dup of 2
    (4, "sphinx of black quartz judge my vow"),
    (5, "completely different words here entirely"),
    (6, "the the the the"),                               # degenerate set {the}
    (7, "the"),                                           # {the} too → J=1 w/ 6
    (8, "!!! ??? ..."),                                   # zero tokens
    (9, "quick brown fox jumps over lazy dog the extras"),  # near 0/1
]


def _tok(text, n=1):
    words = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if n <= 1:
        return set(words)
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def _brute(threshold, n=1):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(_DOCS, 2):
        sa, sb = _tok(ta, n), _tok(tb, n)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        # threshold on the unrounded quotient, round for display —
        # mirrors the operator (round-then-filter admits J just below
        # t and drops J == t at non-6dp thresholds like 1/3)
        if j >= threshold:
            out[(ia, ib)] = round(j, 6)
    return out


def _run(spark, threshold, shingle_n=1):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    rows = prefix_jaccard_pairs(
        df, threshold=threshold, shingle_n=shingle_n
    ).collect()
    return {(r.id_a, r.id_b): r.jaccard for r in rows}


def test_exact_pairs_match_bruteforce(spark):
    for th in (0.3, 0.5, 0.8, 1.0):
        got = _run(spark, th)
        want = _brute(th)
        assert got == want, (th, got, want)


def test_shingle_mode_matches_bruteforce(spark):
    got = _run(spark, 0.5, shingle_n=2)
    want = _brute(0.5, n=2)
    assert got == want


def test_exact_dup_and_identical_singletons(spark):
    got = _run(spark, 1.0)
    assert got[(2, 3)] == 1.0
    assert got[(6, 7)] == 1.0  # {the} vs {the}: sets equal though texts differ


def test_empty_token_doc_never_pairs(spark):
    got = _run(spark, 0.1)
    assert not any(8 in pair for pair in got)


def test_threshold_boundary_pair_is_found(spark):
    """A pair sitting EXACTLY on the threshold (J = t with t·|l|
    integral) must be returned — the case a fp-rounded-up prefix
    length or size filter silently drops (the eps guard's contract)."""
    docs = [
        (0, "alpha beta gamma"),            # {alpha, beta, gamma}
        (1, "alpha beta gamma delta"),      # J = 3/4 exactly
        (2, "epsilon zeta eta theta iota"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_jaccard_pairs(df, threshold=0.75).collect()
    }
    assert got == {(0, 1): 0.75}
    # and a sweep of awkward thresholds against brute force
    for th in (0.2, 0.25, 1 / 3, 0.6, 0.75, 0.9):
        assert _run(spark, th) == _brute(th), th
