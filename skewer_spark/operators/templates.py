"""Log template mining — cluster raw log lines into message templates.

The reference ships fixed per-format decoders (``/root/reference/
decoders/parse.go``); what it cannot do is tell an operator what KINDS
of messages a firehose contains.  Template mining (Drain, He et al.
ICWS'17) answers that: mask variable fragments, group structurally
similar lines, and emit one ``printf``-shaped template per group with
occurrence counts — the standard first step of log analytics over a
telemetry lake.

This is a deterministic, fully declarative variant of Drain's
fixed-depth tree: the grouping key is Drain's first two tree levels
(token count, first masked token) and the per-group similarity merge is
replaced by exact per-position agreement (a position keeps its token
iff every line in the group agrees on it, else it becomes ``<*>``).
Deterministic → engine-replicable (the DuckDB oracle reruns it), and
every step is a built-in expression (no Python).

Scale shape (10^12 lines): masking is a chained ``regexp_replace``
riding the scan; the token stream shuffles ONCE as narrow
``(group, pos, tok)`` rows whose distinct/agg combine map-side; the
template frame is O(#templates) rows (thousands), broadcast back for
per-line assignment.  Nothing corpus-wide is ever collected or
quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# masking passes, applied in order (IP before generic number so octets
# collapse into ONE wildcard); the Java∩RE2 subset so the oracle can
# rerun them verbatim
MASK_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?:\d{1,3}\.){3}\d{1,3}", "<*>"),  # IPv4
    (r"\b0[xX][0-9a-fA-F]+\b", "<*>"),    # hex literals
    (r"\b\d+\b", "<*>"),                  # integers (incl. num parts)
)

WILDCARD = "<*>"


def mask_variables(c: Column) -> Column:
    out = c
    for rx, rep in MASK_PATTERNS:
        out = F.regexp_replace(out, rx, rep)
    return out


def _grouped_tokens(
    df: DataFrame, text_col: str, id_col: str, keep_empty: bool = False
):
    """Lines stamped with the (token count, first token) group key.

    ``keep_empty`` retains zero-token lines with ``_first = NULL`` —
    the assignment path needs every input line in ONE frame (a NULL
    group key simply misses the broadcast join), whereas dropping them
    here and re-attaching later costs a corpus×corpus join on the line
    id (see :func:`assign_templates`)."""
    toks = F.filter(
        F.split(mask_variables(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    if not keep_empty:
        # drop zero-token lines BEFORE tokenizing, on the raw text:
        # provably equivalent to `size(_toks) > 0` (masking substitutes
        # non-whitespace for non-whitespace and no MASK_PATTERN matches
        # pure whitespace, so token count is 0 iff the trimmed input is
        # empty/NULL) — a post-hoc filter on the derived `_n` inlines
        # the whole mask+split+filter chain into the pushed predicate
        # (15 expensive evals, run below the parallelism repartition,
        # r6)
        df = df.filter(F.trim(F.col(text_col)) != F.lit(""))
    base = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    # try_element_at: ANSI mode makes element_at THROW on the empty
    # array a zero-token line produces; the contract here is NULL
    return base.withColumn("_first", F.try_element_at("_toks", F.lit(1)))


def _mine_keyed(base: DataFrame) -> DataFrame:
    """Templates keyed by the ``(_n, _first)`` group columns."""
    pos = base.select(
        "_n", "_first", F.posexplode("_toks").alias("_pos", "_tok")
    )
    # distinct first: a position repeated 10^9 times with one token
    # value ships one row per partition map-side
    agree = (
        pos.distinct()
        .groupBy("_n", "_first", "_pos")
        .agg(
            F.count(F.lit(1)).alias("_nd"),
            F.min("_tok").alias("_mt"),
        )
        .withColumn(
            "_ttok",
            F.when(F.col("_nd") == 1, F.col("_mt")).otherwise(
                F.lit(WILDCARD)
            ),
        )
    )
    counts = base.groupBy("_n", "_first").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    tmpl = (
        agree.groupBy("_n", "_first")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_ttok"))
                    ),
                    lambda s: s["_ttok"],
                ),
            ).alias("template")
        )
        .join(counts, ["_n", "_first"])
        .select(
            "_n",
            "_first",
            F.md5("template").alias("template_id"),
            "template",
            F.col("_n").cast("int").alias("n_tokens"),
            "n_lines",
        )
    )
    return tmpl


def mine_templates(
    df: DataFrame, text_col: str = "text", id_col: str = "line_id"
) -> DataFrame:
    """``(template_id, template, n_tokens, n_lines)`` — one row per
    mined template.

    Group = (token count, first masked token); template token at
    position p = the group's token iff all lines agree there, else
    ``<*>``.  Templates from different groups can never collide (they
    differ in length, or at the first position, which always agrees
    within a group and so is never wildcarded away), hence
    ``template_id = md5(template)`` is stable across runs and engines.
    """
    base = _grouped_tokens(df, text_col, id_col)
    return _mine_keyed(base).select(
        "template_id", "template", "n_tokens", "n_lines"
    )


def assign_templates(
    df: DataFrame, text_col: str = "text", id_col: str = "line_id"
) -> DataFrame:
    """Per-line template assignment ``(id_col, template_id, template)``.

    The template frame is mined from ``df`` itself and broadcast back
    onto the (group key)-stamped lines on the exact ``(_n, _first)``
    group key — the corpus is scanned twice but never shuffled wide.
    Lines with zero tokens after masking get a NULL template: they stay
    in the one stamped frame with a NULL group key and simply miss the
    broadcast join (restoring them via a separate frame would cost a
    corpus×corpus shuffle join on the line id — the exact wide shuffle
    this module exists to avoid).  Zero-token groups contribute no
    mined templates (they emit no positions, so the agree⋈counts inner
    join drops them).
    """
    base = _grouped_tokens(df, text_col, id_col, keep_empty=True)
    keyed = _mine_keyed(base).select(
        "_n", "_first", "template_id", "template"
    )
    return base.join(
        F.broadcast(keyed), ["_n", "_first"], "left"
    ).select(id_col, "template_id", "template")
