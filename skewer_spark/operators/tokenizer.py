"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL).

The rest of the training-data stack consumes tokenizers
(``functions/text.bpe_token_count``, ``operators/pack.pack_sequences``,
``operators/select.token_budget_select``); this module TRAINS one, the
way the original large-corpus subword vocabularies were built — as a
distributed word-count + iterative pair-merge job:

1. ``word_frequency``: corpus → (word, count).  For a 100 TB web corpus
   the distinct-word table is ~10^7–10^8 rows — after this ONE full
   corpus pass, training never touches the corpus again; every merge
   round runs on the compact word table.
2. ``bpe_train``: per round, ONE partial-aggregable shuffle — explode
   adjacent symbol pairs (weighted by word count), ``groupBy(pair)``
   map-side combines, and the argmax is a ``TakeOrderedAndProject``
   (heap-1 per partition, no global sort).  The winning pair is a
   driver-side literal; the merge itself is a narrow ``replace`` on the
   spaced-symbol string.  Same loop discipline as ``graph.pagerank``:
   persist per round, release the superseded frame, ``localCheckpoint``
   lineage cuts every few rounds (a k-round replace chain otherwise
   re-parses from the corpus on every argmax).

Representation: a word is a single string of DOUBLE-space-separated
symbols with double spaces at both ends (``'low'`` → ``'  l  o  w  '``).
A merge of pair (A, B) is then the literal string replace
``' A  B ' → ' AB '`` — single outer spaces in the pattern, so each
match consumes only the INNER space of its two boundaries and the
outer space stays available to the adjacent match.  That detail is
what makes a plain left-to-right non-overlapping ``replace`` (the
semantics of Spark, DuckDB, Python, and every mainstream engine)
reproduce canonical greedy-left BPE exactly on runs:
``aaaa`` → ``(aa)(aa)``, ``aaa`` → ``(aa)(a)`` — a single-space
encoding would stall after the first merge of a run because the shared
boundary space gets consumed (verified by test).  Pair COUNTS are
positional (a run ``aaa`` contributes (a,a) twice), matching the
original subword-nmt counting; ties break on (count DESC, left, right)
so training is deterministic across engines and retries.

``apply_bpe`` segments text with a trained merge list as pure JVM
expressions (one literal replace per merge inside a ``transform``
lambda — whole-stage codegen, no Python).  That is the right shape up
to a few hundred merges; a production 32k-merge vocabulary should swap
in an Arrow-batched pandas UDF running a real heap-based encoder
(the classic expression-depth vs per-row-engine tradeoff, same note as
``operators/multimodal.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_frequency", "bpe_train", "merges_frame", "apply_bpe"]

# double-space separators, double spaces at the edges: every pair
# occurrence — including at word edges — is the literal ' A  B ' with
# one spare outer space on each side for the neighboring match
_SEED_SYM = "concat('  ', regexp_replace({col}, '(.)', '$1  '))"


def word_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus → (word, cnt): the ONE full-corpus pass of BPE training."""
    word = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    return (
        df.select(word)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(sym, cnt) → (l, r, pc): positional adjacent-pair counts.

    ``sequence(0, size-2)`` needs the size >= 2 guard (Spark's sequence
    runs DESCENDING when start > stop — a 1-symbol word would index -1,
    not produce an empty list).
    """
    syms = F.split(F.trim(F.col("sym")), "  ")
    pairs = F.expr(
        "transform(sequence(0, size(syms) - 2),"
        " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
    )
    return (
        words.withColumn("syms", syms)
        .filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("bigint").alias("pc"))
    )


def bpe_train(
    words: DataFrame,
    num_merges: int,
    min_count: int = 1,
    cut_every: int = 6,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges from a (word, cnt) frame.

    Returns ``(merges, final_words)``: ``merges`` is the ordered list of
    ``{"step", "lhs", "rhs", "pair_count"}`` dicts (the tokenizer model —
    a few KB, driver-side by design: every round's argmax is one row),
    and ``final_words`` the post-merge (sym, cnt) frame (the vocabulary
    is its distinct symbols).  Stops early when no pair reaches
    ``min_count``.  Caller owns ``final_words``' lifecycle.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    cur = words.select(
        F.expr(_SEED_SYM.format(col="word")).alias("sym"), "cnt"
    ).persist()
    merges: list[dict] = []
    try:
        for step in range(1, num_merges + 1):
            best = (
                _pair_counts(cur)
                .orderBy(F.desc("pc"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best or best[0].pc < min_count:
                break
            l, r, pc = best[0].l, best[0].r, int(best[0].pc)
            merges.append(
                {"step": step, "lhs": l, "rhs": r, "pair_count": pc}
            )
            nxt = cur.withColumn(
                "sym",
                F.replace(
                    F.col("sym"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
                ),
            )
            if step % cut_every == 0:
                nxt = nxt.localCheckpoint(eager=True)  # lineage cut
            else:
                nxt = nxt.persist()
            nxt.count()  # materialize before releasing the parent
            cur.unpersist()
            cur = nxt
    except Exception:
        cur.unpersist()
        raise
    return merges, cur


def merges_frame(spark: SparkSession, merges: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(m["step"], m["lhs"], m["rhs"], m["pair_count"]) for m in merges],
        "step int, lhs string, rhs string, pair_count bigint",
    )


def apply_bpe(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "tokens",
    max_expr_merges: int = 256,
) -> DataFrame:
    """Segment ``text_col`` with a trained merge list → array<string>.

    Pure JVM: per word, the seed spaced-symbol string is rewritten by
    one literal ``replace`` per merge IN TRAINING ORDER (BPE application
    order is the merge order, not longest-match), then split back into
    symbols.  Expression depth is linear in the merge count, hence the
    ``max_expr_merges`` guard — beyond it, use a pandas-UDF encoder
    (documented above), don't silently build a 10k-deep expression tree.
    """
    if len(merges) > max_expr_merges:
        raise ValueError(
            f"{len(merges)} merges exceeds max_expr_merges="
            f"{max_expr_merges}; swap in a pandas-UDF encoder for large "
            "vocabularies"
        )

    def encode_word(w):
        sym = F.concat(F.lit("  "), F.regexp_replace(w, "(.)", "$1  "))
        for m in merges:
            sym = F.replace(
                sym,
                F.lit(f" {m['lhs']}  {m['rhs']} "),
                F.lit(f" {m['lhs']}{m['rhs']} "),
            )
        return F.split(F.trim(sym), "  ")

    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, encode_word))
    )


def apply_bpe_pandas(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Large-vocabulary BPE apply — the documented swap-in for
    :func:`apply_bpe` past ``max_expr_merges``.

    Arrow-batched pandas UDF with a per-worker word→tokens cache: word
    frequencies are Zipfian, so after the first few batches almost
    every word is a dict hit and the encoder runs at memo speed.
    Semantics are IDENTICAL to the expression path (pinned by test):
    merges apply in TRAINING ORDER, each as one greedy left-to-right
    non-overlapping pass — not the min-rank-first loop some encoders
    use, which can diverge on adversarial (non-trained) merge lists.
    A per-word adjacent-pair set skips merges whose pair cannot occur,
    so one uncached word costs O(vocab dict probes + len·applied), not
    O(vocab · len).

    Scale shape: narrow map, no shuffle; the merge list rides the
    closure (a 32k-merge vocab is ~1 MB — broadcast-by-pickle is fine;
    beyond that, ship a file via ``SparkFiles``).
    """
    ordered = [(m["lhs"], m["rhs"]) for m in sorted(merges, key=lambda m: m["step"])]

    import re

    import pandas as pd  # noqa: F401  (worker-side import)
    from pyspark.sql.functions import pandas_udf

    # Java \s (the expression path's split class), NOT Python str.split's
    # unicode whitespace — the two diverge on NBSP/vertical-tab text
    _ws = re.compile(r"[ \t\n\x0B\f\r]+")
    # SIZE-CAPPED memo: Python workers are reused across tasks
    # (spark.python.worker.reuse), so an unbounded dict grows
    # monotonically for the worker's lifetime — at the module's own
    # 10^7-10^8 distinct-word estimate that is GBs per worker.  Clear-
    # on-overflow keeps the zipfian hot head (frequent words re-enter
    # within a batch) at O(cap) memory.
    _CACHE_CAP = 200_000
    cache: dict[str, list[str]] = {}

    def _encode_word(w: str) -> list[str]:
        hit = cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        pairs = set(zip(syms, syms[1:]))
        for l, r in ordered:
            if (l, r) not in pairs:
                continue
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            pairs = set(zip(syms, syms[1:]))
        if len(cache) >= _CACHE_CAP:
            cache.clear()
        cache[w] = syms
        return syms

    @pandas_udf("array<string>")
    def _enc(s):
        return s.map(
            lambda txt: [
                tok
                for w in _ws.split(txt or "")
                if w
                for tok in _encode_word(w)
            ]
        )

    return df.withColumn(out_col, _enc(F.col(text_col)))
