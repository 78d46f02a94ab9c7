"""Similarity-search operators: exact top-k vs LSH-bucketed ANN."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from skewer_spark.operators.similarity import (
    band_buckets,
    brute_force_topk,
    cosine_pairs_above,
    lsh_bucketed_topk,
    query_bucket,
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
    # candidates are ranked by true cosine within the probed buckets
    sims = [r.cos_sim for r in ann_rows]
    assert sims == sorted(sims, reverse=True)
    assert len(ann & exact) >= 1


def _planted_fixture(spark, n_noise=200, n_dups=20, dim=64):
    """Deterministic fixture: noise vectors + near-dups of a query.

    Near-dups are the query vector with one coordinate nudged —
    cos >= ~0.99 — the shape real embedding dedup hunts for."""
    import numpy as np

    rng = np.random.RandomState(7)
    qv = rng.randn(dim)
    qv /= np.linalg.norm(qv)
    rows = [(0, [float(x) for x in qv])]
    for i in range(1, n_dups + 1):
        v = qv.copy()
        v[i % dim] += 0.05
        rows.append((i, [float(x) for x in v]))
    for i in range(n_dups + 1, n_dups + 1 + n_noise):
        v = rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    return df, [float(x) for x in qv], n_dups


def test_multiprobe_recall_and_candidate_reduction(spark):
    """VERDICT r01 #8: recall >= 0.9 vs brute force at >= 4x reduction."""
    emb, qv, n_dups = _planted_fixture(spark)
    n_total = emb.count()
    k = 10
    exact = {r.vec_id for r in brute_force_topk(emb, qv, k=k).collect()}
    ann = lsh_bucketed_topk(emb, qv, k=k, n_planes=8, probe_hamming=2)
    got = {r.vec_id for r in ann.collect()}
    recall = len(got & exact) / k
    assert recall >= 0.9, f"recall {recall}"
    # candidate reduction: count rows inside the probed buckets
    from skewer_spark.operators.similarity import hyperplane_bucket
    qb = query_bucket(qv, 8)
    cand = (
        emb.withColumn("_b", hyperplane_bucket("embedding", 8))
        .filter(F.bit_count(F.col("_b").bitwiseXOR(F.lit(qb))) <= 2)
        .count()
    )
    assert cand * 4 <= n_total, f"candidates {cand} of {n_total}"


def test_cosine_pairs_finds_planted_dups_sublinearly(spark):
    emb, qv, n_dups = _planted_fixture(spark)
    pairs = cosine_pairs_above(
        emb, threshold=0.95, bands=4, rows_per_band=8
    ).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    keys = {(p.id_a, p.id_b) for p in pairs}
    assert len(keys) == len(pairs)  # deduped across bands
    # the planted cluster (ids 0..n_dups) must be substantially recovered
    cluster = {k for k in keys if k[0] <= n_dups and k[1] <= n_dups}
    possible = n_dups * (n_dups + 1) // 2
    assert len(cluster) >= 0.8 * possible, f"{len(cluster)}/{possible}"


def test_cosine_pairs_recall_vs_exact_all_pairs(spark):
    """VERDICT r02 #9: quantified pair-level recall of the banded
    multi-signature LSH vs EXACT all-pairs cosine (numpy, independent
    of the operator) on the planted fixture — >= 0.9 at the default
    q_embed_neardup band config."""
    import numpy as np

    emb, _, _ = _planted_fixture(spark)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    thr = 0.8
    exact = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(*iu)
        if sims[a, b] >= thr
    }
    assert exact, "fixture must contain above-threshold pairs"
    got = {
        (p.id_a, p.id_b)
        for p in cosine_pairs_above(
            emb, threshold=thr, bands=4, rows_per_band=8, bucket_cap=200
        ).collect()
    }
    # no false positives: every emitted pair is exactly verified
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall} ({len(got)}/{len(exact)})"


def test_bucket_cap_bounds_bucket_width(spark):
    emb, _, _ = _planted_fixture(spark)
    capped = band_buckets(emb, bands=2, rows_per_band=4, bucket_cap=5)
    widths = (
        capped.groupBy("band_id", "bucket").count().agg(F.max("count"))
    ).collect()[0][0]
    assert widths <= 5


def test_cosine_pairs_symmetric_dedup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(60)
    pairs = cosine_pairs_above(
        emb, threshold=0.0, bands=2, rows_per_band=1
    ).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    keys = {(p.id_a, p.id_b) for p in pairs}
    assert len(keys) == len(pairs)  # no duplicate pairs across bands


# --- SQ8 scalar quantization -------------------------------------------------


def test_sq8_codes_bounds_and_roundtrip(spark):
    from skewer_spark.operators.similarity import sq8_encode, sq8_scale

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    s = sq8_scale(emb)
    assert s > 0
    rows = sq8_encode(emb, s).select("embedding", "codes").collect()
    for r in rows:
        for x, c in zip(r.embedding, r.codes):
            assert -127 <= c <= 127
            # round-half-up to the nearest code: error <= s/2
            assert abs(s * c - x) <= s / 2.0 + 1e-9


def test_sq8_extreme_values_hit_full_range(spark):
    from skewer_spark.operators.similarity import sq8_encode, sq8_scale

    df = spark.createDataFrame(
        [(0, [2.0, -2.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    s = sq8_scale(df)
    assert s == 2.0 / 127.0
    codes = sq8_encode(df, s).collect()[0].codes
    assert codes == [127, -127, 0, 64]  # 1.0/s = 63.5 rounds half-up


def test_sq8_topk_ranks_like_exact_inner_product(spark):
    """Integer code-dot ranking is exactly the dequantized-IP ranking;
    vs the TRUE inner product it must substantially agree on the
    planted fixture (recall@10 >= 0.8)."""
    from skewer_spark.operators.similarity import dot, sq8_topk

    emb, qv, _ = _planted_fixture(spark)
    q = F.array(*[F.lit(float(x)) for x in qv])
    exact = {
        r.vec_id
        for r in emb.select(
            "vec_id", dot(F.col("embedding"), q).alias("ip")
        )
        .orderBy(F.desc("ip"), "vec_id")
        .limit(10)
        .collect()
    }
    got = {r.vec_id for r in sq8_topk(emb, qv, k=10).collect()}
    assert len(got) == 10
    overlap = len(got & exact) / 10.0
    assert overlap >= 0.8, f"sq8 recall@10 {overlap}"


def test_sq8_rerank_matches_exact_topk(spark):
    """With a 4x prefilter on the planted fixture the reranked result
    must equal the exact inner-product top-k (same metric in both
    stages — and on L2-normalized data IP top-k IS cosine top-k)."""
    from skewer_spark.operators.similarity import dot, sq8_rerank_topk

    emb, qv, _ = _planted_fixture(spark)
    q = F.array(*[F.lit(float(x)) for x in qv])
    exact = [
        (r.vec_id, r.ip)
        for r in emb.select(
            "vec_id", F.round(dot(F.col("embedding"), q), 6).alias("ip")
        )
        .orderBy(F.desc("ip"), "vec_id")
        .limit(10)
        .collect()
    ]
    got = [
        (r.vec_id, r.ip)
        for r in sq8_rerank_topk(emb, qv, k=10, prefilter=4).collect()
    ]
    assert got == exact


def test_random_projection_preserves_distances(spark):
    """JL contract, tested on what JL actually guarantees: projected
    squared distances are UNBIASED estimates of original squared
    distances with per-pair relative error ~sqrt(2/out_dim).  (Plain
    correlation is the wrong metric here: pairwise distances between
    random high-dim vectors concentrate — the fixture's distance CV is
    0.12, which caps correlation near 0.35 even for a perfect unbiased
    estimator.)  Also pins the operational claim — planted near-dup
    pairs stay far below noise pairs after projection, so LSH/IVF over
    the 16-d projection still separates them."""
    import itertools

    import numpy as np

    from skewer_spark.operators.similarity import random_projection

    emb, _, n_dups = _planted_fixture(spark)
    out = random_projection(emb, "embedding", out_dim=16, dim=64)
    rows = out.select("vec_id", "embedding", "proj").collect()
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    proj = {r["vec_id"]: np.array(r["proj"], dtype=np.float64) for r in rows}
    assert all(len(p) == 16 for p in proj.values())
    ids = sorted(orig)
    d_orig, d_proj = {}, {}
    for a, b in itertools.combinations(ids, 2):
        d_orig[(a, b)] = float(np.sum((orig[a] - orig[b]) ** 2))
        d_proj[(a, b)] = float(np.sum((proj[a] - proj[b]) ** 2))
    do = np.array(list(d_orig.values()))
    dp = np.array(list(d_proj.values()))
    nz = do > 1e-12
    # unbiased: mean ratio within 10%
    ratio = float(np.mean(dp[nz] / do[nz]))
    assert 0.9 <= ratio <= 1.1, f"mean distance ratio {ratio:.3f} off 1"
    # per-pair relative error near the sqrt(2/16)=0.35 theory line
    rel = float(np.mean(np.abs(dp[nz] - do[nz]) / do[nz]))
    assert rel <= 0.45, f"mean relative distance error {rel:.3f} > 0.45"
    # separation: near-dup pairs (vs vec 0) stay far below noise pairs
    dup_ids = [i for i in ids if 0 < i <= n_dups]
    noise_ids = [i for i in ids if i > n_dups]
    dup_d = np.array([d_proj[(0, i)] for i in dup_ids])
    noise_d = np.array([d_proj[(0, i)] for i in noise_ids])
    assert float(np.mean(noise_d)) > 5 * float(np.mean(dup_d))


def test_random_projection_plan_narrow(spark):
    """Planes are plan literals: no shuffle, no join, no Python."""
    from skewer_spark.operators.similarity import random_projection

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = (
        random_projection(emb, "embedding", out_dim=8, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_hard_negative_pairs(spark):
    """Planted fixture: near-dups of vec 0 sit ABOVE hi (excluded as
    negatives); informative mid-band neighbors are returned per anchor
    in deterministic (cos DESC, id ASC) order, capped at per_anchor."""
    from skewer_spark.operators.similarity import hard_negative_pairs

    emb, _, n_dups = _planted_fixture(spark)
    out = hard_negative_pairs(
        emb, lo=0.1, hi=0.95, per_anchor=3
    ).collect()
    assert out, "fixture must yield hard negatives"
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rows in by_anchor.items():
        assert len(rows) <= 3
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: (-r["cos_sim"], r["negative_id"]))
        assert [r["rank"] for r in ordered] == ranks
        for r in rows:
            assert 0.1 <= r["cos_sim"] < 0.95
    # anchor 0's true near-dups (cos ~0.999) must NOT appear as its
    # negatives at hi=0.95
    negs_of_0 = {r["negative_id"] for r in by_anchor.get(0, [])}
    assert not (negs_of_0 & set(range(1, n_dups + 1)))
