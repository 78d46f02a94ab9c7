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


def word_fingerprint(c: str = "text") -> Column:
    """Bag-of-words fingerprint: md5 of the sorted distinct token set.

    The near-dup key for word-order-insensitive dedup; exact SQL
    equivalent: md5(array_to_string(list_sort(list_distinct(
    string_split(text,' '))),' ')).
    """
    toks = F.array_sort(F.array_distinct(F.split(F.col(c), " ")))
    return F.md5(F.array_join(toks, " "))
