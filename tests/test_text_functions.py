"""Text-analysis scalar functions + IVF ANN.

Unit-level checks with hand-computed expectations; the driver-facing
correctness lives in __spark_entry__.py's DuckDB oracle pairs
(q_text_stats / q_bpe_tokens / q_winnow_fp / q_ivf_topk).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.functions.text import (
    bpe_token_count,
    token_count,
    winnow_fingerprint,
)
from skewer_spark.operators.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


def _one(spark, text: str, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0]["v"]
    )


def test_bpe_token_count_splits_runs_and_marks(spark):
    # letters | digits | single marks: "foo,bar!" -> foo , bar !  = 4
    assert _one(spark, "foo,bar!", bpe_token_count()) == 4
    # whitespace is a separator, never a token
    assert _one(spark, "a b", bpe_token_count()) == 2
    # digit runs count once; mixed alnum splits at the class boundary
    assert _one(spark, "gpt2 has 124M params", bpe_token_count()) == 6
    # whitespace tokenizer sees 1 token where BPE-ish sees 4
    assert _one(spark, "foo,bar!", token_count()) == 1


def test_winnow_fingerprint_detects_partial_overlap(spark):
    """Docs sharing a long character run share window minima — the
    winnowing property word_fingerprint lacks."""
    shared = "the quick brown fox jumps over the lazy dog " * 3
    a = "PREFIX-A " + shared
    b = "DIFFERENT-PREFIX-B " + shared + " AND A SUFFIX"
    c = "completely unrelated content with no shared runs at all"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    # fingerprints are deterministic
    fp1 = {r.doc_id: r.wfp for r in df.select("doc_id", winnow_fingerprint().alias("wfp")).collect()}
    fp2 = {r.doc_id: r.wfp for r in df.select("doc_id", winnow_fingerprint().alias("wfp")).collect()}
    assert fp1 == fp2
    # full fingerprints differ (docs are not identical) ...
    assert len(set(fp1.values())) == 3
    # ... but the underlying minima sets overlap heavily for a/b and
    # not for a/c: recompute the minima arrays to check the property
    def minima(text: str) -> set:
        t = F.lit(text)
        k, w = 8, 4
        n_h = F.greatest(F.length(t) - (k - 1), F.lit(1))
        n_w = F.greatest(n_h - (w - 1), F.lit(1))
        arr = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_w),
                lambda j: F.array_min(
                    F.transform(
                        F.sequence(j, j + (w - 1)),
                        lambda i: F.substring(F.md5(F.substr(t, i, F.lit(k))), 1, 8),
                    )
                ),
            )
        )
        return set(spark.range(1).select(arr.alias("m")).collect()[0]["m"])

    ma, mb, mc = minima(a), minima(b), minima(c)
    assert len(ma & mb) / len(ma | mb) > 0.5
    assert len(ma & mc) / len(ma | mc) < 0.05


def test_ivf_topk_matches_brute_force_on_probed_cells(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    q = cents[3]
    exact = brute_force_topk(emb, q, k=10).collect()
    ivf = ivf_topk(emb, q, cents, k=10, nprobe=16).collect()
    # probing ALL cells == exact search
    assert [(r.vec_id, r.cos_sim) for r in ivf] == [
        (r.vec_id, r.cos_sim) for r in exact
    ]
    # narrow probe still recalls the query itself and ranks by cosine
    narrow = ivf_topk(emb, q, cents, k=10, nprobe=2).collect()
    assert narrow[0].vec_id == 3
    sims = [r.cos_sim for r in narrow]
    assert sims == sorted(sims, reverse=True)
