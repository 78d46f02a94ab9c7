"""PII scrubbing + repetition signals for training-data curation.

All pure Column expressions (JVM-side, whole-stage codegen) — these run
per-row over the text column with no shuffle and no Python, so at
100 TB they ride the same scan as the rest of the quality gates.

Regexes are kept to the Java-regex ∩ RE2 common subset (character
classes, non-capturing groups, ``\\b`` word boundaries; no lookaround,
no backreferences) so the DuckDB oracle applies the *same* pattern
text and matches byte-for-byte.

PII classes mirror the scrub stage of public curation pipelines
(e.g. BigScience/BigCode PII pipelines): emails, IPv4 addresses,
long card-like digit runs, international phone numbers.  Repetition
signals follow Gopher (Rae et al. 2021, table A1): duplicate-word
fraction, most-frequent-word fraction, duplicate n-gram fraction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII patterns (Java regex ∩ RE2 — identical semantics in Spark and DuckDB)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
CARD_RE = r"\b[0-9]{13,16}\b"
PHONE_RE = r"\+[0-9]{7,15}\b"

# replacement applied in a fixed order: email first (its local part may
# contain digits that would otherwise half-match the card pattern),
# then IPv4, then PHONE before CARD — a 13-15-digit international
# number would otherwise be eaten by the card pattern, while a card's
# bare digit run can never match the '+'-anchored phone pattern.
_PII_ORDER: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
    (CARD_RE, "<CARD>"),
)


def redact_pii(c: str = "text") -> Column:
    """Replace every PII span with a typed placeholder token.

    Chained ``regexp_replace`` — each pass is a single codegen'd scan
    of the string; 4 passes ≪ one Python UDF dispatch.
    """
    out = F.col(c)
    for pat, token in _PII_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(c: str = "text") -> list[Column]:
    """Per-class PII hit counts (audit columns for the scrub report).

    Counted on the PRE-redaction text, in the same pass order, each on
    the text with earlier classes already removed — so the counts are
    exactly "what redact_pii replaced", not independent overlapping
    matches.
    """
    cols: list[Column] = []
    cur = F.col(c)
    for (pat, token), name in zip(
        _PII_ORDER, ("n_emails", "n_ips", "n_phones", "n_cards")
    ):
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(name)
        )
        cur = F.regexp_replace(cur, pat, token)
    return cols


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality gates)
# ---------------------------------------------------------------------------


def dup_word_ratio(c: str = "text") -> Column:
    """1 − distinct/total whitespace words: 0 = all unique, →1 = loops."""
    toks = F.split(F.col(c), " ")
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double"),
        4,
    )


def top_word_ratio(c: str = "text") -> Column:
    """Fraction of the text taken by its single most frequent word.

    O(n log n) per row: ``array_sort`` the tokens, then one
    ``aggregate`` pass tracks the longest run of equal adjacent tokens
    (struct accumulator: previous token, current run length, best run
    length).  All inside codegen'd higher-order-function expressions —
    no shuffle, no Python.  The earlier O(distinct × total)
    transform/filter product was a straggler generator: one pathological
    100k-token document cost 10^10 comparisons inside a single task.
    """
    toks = F.split(F.col(c), " ")
    srt = F.array_sort(toks)
    top = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.round(top.cast("double") / F.size(toks).cast("double"), 4)


def dup_ngram_ratio(c: str = "text", n: int = 2) -> Column:
    """1 − distinct/total word n-grams (Gopher's duplicate n-gram frac).

    n-grams built with sequence+transform over the split array — no
    explode, no shuffle; stays a scalar expression on the scan.  The
    split array is lambda-bound (``functions.hof.bind``): referencing
    the raw split expression inside the per-position lambda would
    re-run the split per n-gram — O(n²)/row, a straggler on a
    pathological 100k-token document (measured 84× on 2k tokens).
    """
    from skewer_spark.functions.hof import bind

    def body(tk):
        n_sh = F.greatest(F.size(tk) - (n - 1), F.lit(1))
        grams = F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        )
        return F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / F.size(grams).cast("double"),
            4,
        )

    return bind(F.split(F.col(c), " "), body)
