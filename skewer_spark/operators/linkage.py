"""Entity resolution / record linkage: token blocking + weighted field
agreement (Fellegi–Sunter shaped, deterministic).

Training corpora are assembled from many feeds that describe the SAME
underlying entities (authors, sites, users, papers) with cosmetically
different records; linking them is its own operator family — unlike
the dedup stack (:mod:`.dedup`, :mod:`.setsim`) it joins TWO tables,
tolerates field-level noise, and scores MULTIPLE fields, not one text
column.  Classic pipeline (Fellegi & Sunter 1969; Christen's survey,
TKDE'12): block → compare → classify.

* **block** — candidate pairs share at least one normalized name
  token (token blocking).  Hot tokens ("inc", "the") are excluded by
  a document-frequency cap: a token appearing in more than
  ``max_token_df`` records on either side never blocks — the standard
  stop-token rule, and the thing that keeps the block join from going
  quadratic when a feed's names share boilerplate.  (The excluded
  token still participates in SCORING — only blocking skips it.)
* **compare** — per candidate: name-token Jaccard plus exact-equality
  flags on the given field list.
* **classify** — ``score = (w_name·jaccard + Σ w_f·[field equal]) /
  Σw``; verdicts ``match`` / ``possible`` / ``non_match`` at the two
  thresholds.

Scale shape (the 100 TB contract): the block join is an equi-join on
single tokens with BOTH sides repartitioned to a fixed width (the AQE
quadratic-output-coalesce guard shared with ``dedup._band_pairs``);
the token-df frames are compact groupBys; scoring joins the candidate
id-pair frame back to the two record frames by id (payload never
rides the token shuffle).  Everything is engine-replicable expressions
— no Python, no RNG.

Reference parity: no analog in the reference (syslog router); part of
the training-data toolbox the task brief adds (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import _tokens


def _name_tokens(df: DataFrame, id_col: str, name_col: str, side: str) -> DataFrame:
    """``(id, toks)`` with normalized distinct name tokens."""
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.array_distinct(_tokens(name_col)).alias(f"{side}_toks"),
    )


def _blocked_from_tokens(
    lt: DataFrame, rt: DataFrame, max_token_df: int
) -> DataFrame:
    """Block join over prebuilt ``(left_id, left_toks)`` /
    ``(right_id, right_toks)`` frames — the shared core, so
    :func:`link_records` tokenizes each side exactly ONCE (Catalyst
    does not CSE independent subtrees; a second `_name_tokens` build
    would re-scan and re-tokenize both tables)."""
    # explode_OUTER + attribute null-filter: a plain explode makes the
    # optimizer infer `size(toks) > 0` with the whole tokenize chain
    # inlined, pushed below the parallelism repartition (r6 — see
    # search.build_inverted_index); NULL rows from empty names die in
    # the cheap filter, frames identical
    lx = (
        lt.select("left_id", F.explode_outer("left_toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    rx = (
        rt.select("right_id", F.explode_outer("right_toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    # stop-token rule: df computed per side on the compact (tok) frame
    l_ok = (
        lx.groupBy("tok").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_token_df).select("tok")
    )
    r_ok = (
        rx.groupBy("tok").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_token_df).select("tok")
    )
    ok = l_ok.join(r_ok, "tok")
    # fixed-width exchange FIRST so the stop-token semi-join and the
    # candidate join both reuse it and AQE cannot coalesce the
    # quadratic-OUTPUT block join by its small INPUT bytes (the
    # _band_pairs guard; a repartition placed after the ok-join is
    # optimized away as redundant and loses the guard)
    n = lt.sparkSession.sparkContext.defaultParallelism
    lxb = lx.repartition(n, "tok").join(ok, "tok")
    rxb = rx.repartition(n, "tok").join(ok, "tok")
    return lxb.join(rxb, "tok").select("left_id", "right_id").distinct()


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    max_token_df: int = 100,
) -> DataFrame:
    """Distinct ``(left_id, right_id)`` pairs sharing >= 1 blocking
    token (name tokens below the df cap on both sides)."""
    lt = _name_tokens(left, id_col, name_col, "left")
    rt = _name_tokens(right, id_col, name_col, "right")
    return _blocked_from_tokens(lt, rt, max_token_df)


def link_records(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    exact_cols: list[str] | None = None,
    name_weight: float = 2.0,
    exact_weight: float = 1.0,
    match_threshold: float = 0.75,
    possible_threshold: float = 0.5,
    max_token_df: int = 100,
) -> DataFrame:
    """Scored candidate links: ``(left_id, right_id, name_jaccard,
    n_exact, score, verdict)``.

    ``score`` ∈ [0, 1] = (name_weight·jaccard + exact_weight·Σ[field
    equal]) / (name_weight + exact_weight·|exact_cols|), rounded 6dp
    (the cross-engine canonicalization contract).  Field equality is
    null-safe-false (a missing field neither agrees nor disagrees
    harder — it simply contributes 0, the Fellegi–Sunter "missing at
    random" default).  Verdict thresholds compare on the ROUNDED
    score so both engines cut identically."""
    exact_cols = exact_cols or []
    lt = _name_tokens(left, id_col, name_col, "left")
    rt = _name_tokens(right, id_col, name_col, "right")
    cands = _blocked_from_tokens(lt, rt, max_token_df)
    lf = left.select(
        F.col(id_col).alias("left_id"),
        *[F.col(c).alias(f"l_{c}") for c in exact_cols],
    ).join(lt, "left_id")
    rf = right.select(
        F.col(id_col).alias("right_id"),
        *[F.col(c).alias(f"r_{c}") for c in exact_cols],
    ).join(rt, "right_id")
    j = cands.join(lf, "left_id").join(rf, "right_id")
    inter = F.size(F.array_intersect("left_toks", "right_toks"))
    union = F.size("left_toks") + F.size("right_toks") - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    agree = [
        F.when(F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))
               & F.col(f"l_{c}").isNotNull(), 1).otherwise(0)
        for c in exact_cols
    ]
    n_exact = sum(agree) if agree else F.lit(0)
    denom = name_weight + exact_weight * len(exact_cols)
    score = F.round(
        (F.lit(name_weight) * jac
         + F.lit(exact_weight) * n_exact.cast("double")) / F.lit(denom),
        6,
    )
    return j.select(
        "left_id",
        "right_id",
        F.round(jac, 6).alias("name_jaccard"),
        n_exact.cast("int").alias("n_exact"),
        score.alias("score"),
        F.when(score >= match_threshold, F.lit("match"))
        .when(score >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("verdict"),
    )
