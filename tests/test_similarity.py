"""Similarity-search operators: exact top-k vs LSH-bucketed ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs_above,
    lsh_bucketed_topk,
)

SF = "/root/testdata/sf0.001"


def test_brute_force_topk_self_is_first(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    top = brute_force_topk(emb, list(q), k=5).collect()
    assert top[0].vec_id == 3
    assert abs(top[0].cos_sim - 1.0) < 1e-6
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_ann_contains_query_and_overlaps_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    exact = {r.vec_id for r in brute_force_topk(emb, list(q), k=10).collect()}
    ann_rows = lsh_bucketed_topk(emb, list(q), k=10, n_planes=4).collect()
    ann = {r.vec_id for r in ann_rows}
    # the query vector shares its own bucket → always recalled
    assert 3 in ann
    # candidates are ranked by true cosine within the bucket
    sims = [r.cos_sim for r in ann_rows]
    assert sims == sorted(sims, reverse=True)
    # sane recall on random data with 4 planes (1/16 of space per bucket)
    assert len(ann & exact) >= 1


def test_cosine_pairs_symmetric_dedup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(60)
    pairs = cosine_pairs_above(emb, threshold=0.0, n_planes=2).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    keys = {(p.id_a, p.id_b) for p in pairs}
    assert len(keys) == len(pairs)  # no duplicate pairs across bands
