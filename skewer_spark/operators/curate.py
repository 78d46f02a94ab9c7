"""Composite curation decision: the keep/drop verdict a training-data
pipeline actually ships.

Combines the individual hygiene signals this repo already provides —
exact-dedup keeper, language ID, quality score, benchmark
decontamination — into one per-document decision with the FIRST failing
rule as the reason, in fixed priority order::

    duplicate > language > low_quality > contaminated > kept

Every rule is a deterministic pure expression or an already-oracled
operator, so the whole decision has an exact ANSI-SQL twin (DuckDB
oracle ``q_curation`` in ``__spark_entry__.py``).

Scale shape: language + quality are narrow codegen expressions
(Catalyst pushes them below the exchanges, so text bytes never ride a
shuffle); the dedup keeper is one exchange partitioned on
``md5(text)``; the contamination leg reuses
:func:`~skewer_spark.operators.decontaminate.contamination_report`
(broadcast benchmark shingles) and joins back on id, which costs one
id-keyed exchange per join side.  Total: three corpus-sized exchanges
(md5 window + the two sides of the id join), all of narrow
score/flag rows on compact keys — verified on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skewer_spark.functions.text import lang_id, quality_score
from skewer_spark.operators.decontaminate import contamination_report


def curation_decisions(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_allow: tuple[str, ...] = ("en",),
    min_quality: float = 0.75,
    n: int = 3,
    decontam_threshold: float = 0.1,
) -> DataFrame:
    """Per-document curation verdict.

    Returns ``(id, keeper_id, lang, quality, overlap_frac, reason,
    keep)``; ``keep`` is true iff every gate passes, ``reason`` names
    the first failing gate (or ``'kept'``).  The exact-dedup gate keeps
    the LOWEST id of each identical-text group (``keeper_id``), so
    exactly one member of every duplicate class can survive.
    """
    w = Window.partitionBy(F.md5(F.col(text_col)))
    scored = df.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("keeper_id"),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("quality"),
    )
    contam = contamination_report(
        df, bench_df, text_col, id_col, n, decontam_threshold
    ).select(id_col, "overlap_frac", "contaminated")

    j = scored.join(contam, id_col, "left")
    reason = (
        F.when(F.col(id_col) != F.col("keeper_id"), F.lit("duplicate"))
        .when(~F.col("lang").isin(*lang_allow), F.lit("language"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.coalesce(F.col("contaminated"), F.lit(False)),
              F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        id_col,
        "keeper_id",
        "lang",
        "quality",
        F.coalesce(F.col("overlap_frac"), F.lit(0.0)).alias("overlap_frac"),
        reason.alias("reason"),
        (reason == F.lit("kept")).alias("keep"),
    )
