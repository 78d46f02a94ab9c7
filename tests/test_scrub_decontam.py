"""PII scrub, repetition signals, benchmark decontamination.

Hand-computed expectations; driver-facing correctness is the DuckDB
oracle pairs q_pii_redact / q_repetition / q_decontam.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.functions.scrub import (
    dup_ngram_ratio,
    dup_word_ratio,
    pii_counts,
    redact_pii,
    top_word_ratio,
)
from skewer_spark.operators.decontaminate import contamination_report


def _one(spark, text: str, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0]["v"]
    )


def test_redact_all_four_classes(spark):
    t = ("mail bob.smith+x@corp.example.co from 192.168.0.1 "
         "card 4111222233334444 call +4915112345678 done")
    out = _one(spark, t, redact_pii())
    assert out == "mail <EMAIL> from <IP> card <CARD> call <PHONE> done"


def test_redact_leaves_clean_text_alone(spark):
    t = "no pii here just words and the number 42"
    assert _one(spark, t, redact_pii()) == t


def test_pii_counts_no_double_counting(spark):
    # the email's digits must not also count as card/phone; the IP's
    # octets must not count as card
    t = "a12345678901234@x.io 10.0.0.1 4111222233334444 +33123456789"
    row = (
        spark.createDataFrame([(t,)], "text string")
        .select(*pii_counts())
        .collect()[0]
    )
    assert (row["n_emails"], row["n_ips"], row["n_cards"], row["n_phones"]) == (
        1, 1, 1, 1,
    )


def test_dup_word_ratio(spark):
    assert _one(spark, "a b a b a", dup_word_ratio()) == 0.6  # 2 distinct / 5
    assert _one(spark, "x y z", dup_word_ratio()) == 0.0


def test_top_word_ratio(spark):
    assert _one(spark, "a a a b c", top_word_ratio()) == 0.6
    assert _one(spark, "q", top_word_ratio()) == 1.0


def test_top_word_ratio_long_document(spark):
    """VERDICT r02 #4: a pathological many-token document must not
    dominate a task.  60k mostly-distinct tokens under the old
    O(distinct×total) formulation was ~3.6e9 comparisons in ONE row
    (minutes); the sort + longest-equal-run pass finishes with the
    rest of the suite's noise."""
    import time

    toks = [f"w{i}" for i in range(60_000)]
    toks[::100] = ["hot"] * len(toks[::100])  # 600 copies of one word
    t0 = time.monotonic()
    got = _one(spark, " ".join(toks), top_word_ratio())
    assert got == round(600 / 60_000, 4)
    assert time.monotonic() - t0 < 30


def test_dup_ngram_ratio_bigrams(spark):
    # bigrams of "a b a b a": [a b, b a, a b, b a] → 2 distinct / 4
    assert _one(spark, "a b a b a", dup_ngram_ratio(n=2)) == 0.5
    # single-word doc: one degenerate gram, ratio 0
    assert _one(spark, "solo", dup_ngram_ratio(n=2)) == 0.0


def test_contamination_report(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),   # shares 'the quick brown', 'quick brown fox'
            (2, "nothing in common here at all"),
            (3, "too short"),                     # < 3 tokens → 0 shingles
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_report(docs, bench, n=3, threshold=0.5).collect()
    }
    assert rows[1]["n_shingles"] == 3 and rows[1]["n_matched"] == 2
    assert rows[1]["overlap_frac"] == 0.6667 and rows[1]["contaminated"]
    assert rows[2]["n_matched"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_shingles"] == 0 and rows[3]["overlap_frac"] == 0.0


def test_contamination_plan_broadcasts_benchmark(spark):
    # the corpus side must not shuffle its text bytes: the benchmark
    # join and the matched-counts re-join are both broadcast
    bench = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c e")], "doc_id long, text string")
    plan = contamination_report(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") >= 2
