"""Benchmark decontamination: n-gram overlap against an eval set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM /
Llama papers): a document is *contaminated* when too many of its word
n-gram shingles also appear in a benchmark (eval) corpus; contaminated
docs are dropped or flagged before training.

Scale shape (the part that matters at 100 TB):

* The benchmark side is SMALL (eval suites are a few MB) — its distinct
  shingle set is built once and **broadcast**, so the corpus side joins
  with zero shuffle of document bytes.
* The corpus side explodes only ``(doc_id, shingle)`` pairs — the text
  column is pruned before the explode — and aggregates matched counts
  map-side-first on ``doc_id``.
* The matched-counts frame is bounded by the number of docs sharing at
  least one shingle with the benchmark — normally ≪ corpus — and is
  broadcast back onto the doc frame, so the full corpus is never
  shuffled.  (If contamination were pervasive, Spark's AQE would
  demote that broadcast to a shuffle join; both are correct.)

Shingling reuses :func:`skewer_spark.operators.dedup.word_shingles`
(distinct word n-grams as a scalar array expression — no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skewer_spark.operators.dedup import word_shingles


def benchmark_shingle_set(
    bench_df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct shingle set of the benchmark corpus (one ``shingle`` col)."""
    return (
        bench_df.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def contamination_report(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns ``(id, n_shingles, n_matched, overlap_frac, contaminated)``
    where ``overlap_frac = n_matched / n_shingles`` over the document's
    DISTINCT n-gram shingles and ``contaminated = frac >= threshold``.
    """
    docs = df.select(
        F.col(id_col), word_shingles(text_col, n).alias("_sh")
    ).withColumn("n_shingles", F.size("_sh"))

    bench = benchmark_shingle_set(bench_df, text_col, n)

    # explode_OUTER: a plain explode makes the optimizer infer a
    # `size(_sh) > 0` filter with the whole shingle chain inlined and
    # push it below the parallelism repartition (single-partition
    # evaluation, r6); the outer variant infers nothing, and the extra
    # NULL-shingle row an empty doc emits dies in the inner bench join
    # — identical output, chain evaluated once, in parallel
    matched = (
        docs.select(id_col, F.explode_outer("_sh").alias("shingle"))
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )

    frac = F.coalesce(F.col("n_matched"), F.lit(0)).cast("double") / F.greatest(
        F.col("n_shingles"), F.lit(1)
    ).cast("double")
    return (
        docs.join(F.broadcast(matched), id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles"),
            F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
            F.round(frac, 4).alias("overlap_frac"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
    )
