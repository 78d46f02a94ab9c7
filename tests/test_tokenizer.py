"""Distributed BPE training vs an independent in-test reference."""

from __future__ import annotations

import pytest


def _merge_once(toks: list[str], l: str, r: str) -> list[str]:
    """Canonical greedy left-to-right single-pair merge pass."""
    out, i = [], 0
    while i < len(toks):
        if i < len(toks) - 1 and toks[i] == l and toks[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Independent per-word BPE trainer (never imports pipeline code)."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, num_merges + 1):
        pairs: dict[tuple, int] = {}
        for toks, c in words.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = (
                    pairs.get((toks[i], toks[i + 1]), 0) + c
                )
        if not pairs:
            break
        # deterministic tie-break: count DESC, lhs ASC, rhs ASC
        top = max(pairs.values())
        l, r = sorted([p for p, c in pairs.items() if c == top])[0]
        merges.append((step, l, r, top))
        new: dict[tuple, int] = {}
        for toks, c in words.items():
            merged = tuple(_merge_once(list(toks), l, r))
            new[merged] = new.get(merged, 0) + c
        words = new
    return merges, words


def _segment(word: str, merges) -> list[str]:
    toks = list(word)
    for _, l, r, _c in merges:
        toks = _merge_once(toks, l, r)
    return toks


def test_bpe_train_canonical_sennrich(spark):
    # the worked example from the BPE paper: es→est→lo→low→ew→ewest
    from skewer_spark.operators.tokenizer import bpe_train, word_frequency
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    wf = word_frequency(spark.createDataFrame([(text,)], "text string"))
    merges, final = bpe_train(wf, 6)
    final.unpersist()
    got = [(m["step"], m["lhs"], m["rhs"], m["pair_count"]) for m in merges]
    assert got == [
        (1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7),
        (4, "lo", "w", 7), (5, "e", "w", 6), (6, "ew", "est", 6),
    ]


def test_bpe_train_matches_reference_on_random_corpus(spark):
    from skewer_spark.operators.tokenizer import bpe_train, word_frequency
    import random

    rng = random.Random(7)
    vocab = ["spark", "shuffle", "scan", "scatter", "shard", "spill",
             "sort", "skew", "aa", "aaa", "b"]
    words = [rng.choice(vocab) for _ in range(300)]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    ref_merges, _ = _ref_bpe(counts, 8)

    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    merges, final = bpe_train(word_frequency(docs), 8)
    final.unpersist()
    got = [(m["step"], m["lhs"], m["rhs"], m["pair_count"]) for m in merges]
    assert got == ref_merges


def test_bpe_overlapping_run_semantics(spark):
    # 'aaaa' counts (a,a) positionally (3 per word) but merges
    # greedily left-to-right: aaaa -> (aa)(aa), aaa -> (aa)(a).  This is
    # exactly where a single-space string encoding diverges (it would
    # yield (aa)(a)(a) — the boundary space is consumed by the match);
    # the double-space encoding must stay canonical.
    from skewer_spark.operators.tokenizer import (
        apply_bpe, bpe_train, word_frequency,
    )
    docs = spark.createDataFrame([("aaaa aaaa aaa",)], "text string")
    merges, final = bpe_train(word_frequency(docs), 1)
    final.unpersist()
    assert merges[0]["lhs"] == "a" and merges[0]["rhs"] == "a"
    assert merges[0]["pair_count"] == 2 * 3 + 2  # positional counting
    toks = apply_bpe(docs, merges).collect()[0].tokens
    assert toks == ["aa", "aa", "aa", "aa", "aa", "a"]


def test_apply_bpe_matches_reference_segmentation(spark):
    from skewer_spark.operators.tokenizer import (
        apply_bpe, bpe_train, word_frequency,
    )
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(text,)], "text string")
    merges, final = bpe_train(word_frequency(docs), 6)
    final.unpersist()
    ref = [(m["step"], m["lhs"], m["rhs"], m["pair_count"]) for m in merges]
    got = apply_bpe(
        spark.createDataFrame([("newest lowest low",)], "text string"),
        merges,
    ).collect()[0].tokens
    want = (
        _segment("newest", ref) + _segment("lowest", ref)
        + _segment("low", ref)
    )
    assert got == want


def test_bpe_early_stop_and_guards(spark):
    from skewer_spark.operators.tokenizer import (
        apply_bpe, bpe_train, word_frequency,
    )
    # single-char words can never merge -> zero merges, no crash (this
    # also exercises the size>=2 guard against Spark's descending
    # sequence(0,-1))
    docs = spark.createDataFrame([("a b c a b",)], "text string")
    merges, final = bpe_train(word_frequency(docs), 3)
    final.unpersist()
    assert merges == []
    # min_count early stop
    docs2 = spark.createDataFrame([("ab ab cd",)], "text string")
    merges2, final2 = bpe_train(word_frequency(docs2), 5, min_count=2)
    final2.unpersist()
    assert [(m["lhs"], m["rhs"]) for m in merges2] == [("a", "b")]
    with pytest.raises(ValueError):
        bpe_train(word_frequency(docs2), 0)
    with pytest.raises(ValueError):
        apply_bpe(docs2, [{"lhs": "a", "rhs": "b"}] * 3, max_expr_merges=2)


def test_bpe_argmax_is_take_ordered(spark):
    # the per-round argmax must be a heap-1 TakeOrderedAndProject, not a
    # global sort (the pagerank/bm25 plan contract)
    from skewer_spark.operators.tokenizer import word_frequency
    from skewer_spark.operators.tokenizer import _pair_counts
    import pyspark.sql.functions as F

    docs = spark.createDataFrame([("low lower newest",)], "text string")
    wf = word_frequency(docs).select(
        F.expr("concat('  ', regexp_replace(word, '(.)', '$1  '))").alias(
            "sym"
        ),
        "cnt",
    )
    plan = (
        _pair_counts(wf)
        .orderBy(F.desc("pc"), "l", "r")
        .limit(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_apply_bpe_pandas_matches_expression_path(spark):
    # the large-vocab pandas encoder and the JVM replace-chain must
    # segment identically on TRAINED merges (training-order semantics)
    from skewer_spark.operators.tokenizer import (
        apply_bpe, apply_bpe_pandas, bpe_train, word_frequency,
    )

    docs = spark.createDataFrame(
        [
            ("low lower newest widest lowest",),
            ("the thin then than that aaaa aaab",),
            ("in an and band thane",),
            ("",),
            ("  padded   runs\tand\ntabs  ",),
        ],
        "text string",
    )
    merges, final = bpe_train(word_frequency(docs), num_merges=8)
    final.unpersist()
    assert merges  # the fixture must actually train something

    jvm = {
        r.text: list(r.tokens)
        for r in apply_bpe(docs, merges).collect()
    }
    pdu = {
        r.text: list(r.tokens)
        for r in apply_bpe_pandas(docs, merges).collect()
    }
    assert jvm == pdu


def test_apply_bpe_pandas_run_semantics(spark):
    # canonical greedy-left on runs: merge (a,a) segments aaaa -> (aa)(aa)
    # and aaa -> (aa)(a), matching the double-space expression algebra
    from skewer_spark.operators.tokenizer import apply_bpe_pandas

    docs = spark.createDataFrame([("aaaa aaa aaaaa",)], "text string")
    merges = [{"step": 1, "lhs": "a", "rhs": "a", "pair_count": 0}]
    [row] = apply_bpe_pandas(docs, merges).collect()
    assert list(row.tokens) == ["aa", "aa", "aa", "a", "aa", "aa", "a"]


def test_apply_bpe_keeps_existing_tokens_column(spark):
    """out_col must not clobber an unrelated pre-existing 'tokens'
    column (apply_bpe used to materialize as 'tokens' then rename)."""
    from pyspark.sql import functions as F

    from skewer_spark.operators.tokenizer import apply_bpe

    df = spark.createDataFrame(
        [("ab ab", ["pre"])], "text string, tokens array<string>"
    )
    merges = [{"step": 1, "lhs": "a", "rhs": "b"}]
    out = apply_bpe(df, merges, out_col="bpe").collect()[0]
    assert out.tokens == ["pre"]
    assert out.bpe == ["ab", "ab"]
