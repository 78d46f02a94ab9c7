"""Differential pin: the numpy lockstep band-signature UDF
(`similarity._band_sig_udf`, used by `band_buckets`) against the
pure-expression twin (`band_buckets_expr`) — every (id, band_id,
bucket) row must be identical, because the buckets determine candidate
sets and therefore every LSH query's oracle-hashed output.

The lockstep accumulation replays the Catalyst fold's IEEE operation
order exactly (one add per dimension, float32→float64 exact casts), so
parity is by construction — these tests guard the construction:
fixture embeddings (fractional float32s where summation order
matters), sign-boundary vectors, NaN (Spark: NaN >= 0 is TRUE),
NULL vectors and wrong-length vectors (both fold to NULL buckets).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skewer_spark.operators.similarity import band_buckets, band_buckets_expr

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(
        (r["vec_id"], r["band_id"], r["bucket"])
        for r in df.select("vec_id", "band_id", "bucket").collect()
    )


def test_band_sig_batch_matches_expr_on_fixture(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = _rows(band_buckets(emb, bucket_cap=None))
    b = _rows(band_buckets_expr(emb, bucket_cap=None))
    assert len(a) > 0
    assert a == b


def test_band_sig_batch_matches_expr_adversarial(spark):
    rows = [
        (1, [0.0] * 64),                    # all-zero: every dot == 0 → bit 1
        (2, [1e-30] * 64),                  # near the sign boundary
        (3, [-1e-30] * 64),
        (4, None),                          # NULL vector → NULL buckets
        (5, [1.0] * 63),                    # wrong length → NULL buckets
        (6, [1.0] * 65),                    # wrong length → NULL buckets
        (7, [float("nan")] * 64),           # NaN: Spark NaN >= 0 → TRUE
        (8, [0.1, -0.2] * 32),
        (9, [float("inf")] * 64),
        (10, [-float("inf")] * 64),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    a = _rows(band_buckets(emb, bucket_cap=None))
    b = _rows(band_buckets_expr(emb, bucket_cap=None))
    assert a == b
    # NULL-vector and wrong-length rows must yield NULL buckets on BOTH
    nulls = [r for r in a if r[0] in (4, 5, 6)]
    assert all(r[2] is None for r in nulls)


def test_ivf_assign_batch_matches_expr(spark):
    from skewer_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_expr,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id") < 16).select(
        "vec_id", "embedding"
    ).collect()
    cents = {int(r[0]): [float(x) for x in r[1]] for r in rows}
    a = sorted(
        (r["vec_id"], r["_cell"])
        for r in ivf_assign(emb, cents).select("vec_id", "_cell").collect()
    )
    b = sorted(
        (r["vec_id"], r["_cell"])
        for r in ivf_assign_expr(emb, cents).select("vec_id", "_cell").collect()
    )
    assert len(a) > 0
    assert a == b


def test_cosine_pair_batch_matches_expr(spark):
    from skewer_spark.operators.similarity import cosine, with_pair_cosine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(80)
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("_vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    rows = (
        with_pair_cosine(pairs, "_va", "_vb", "u")
        .select(
            "id_a", "id_b", "u",
            cosine(F.col("_va"), F.col("_vb")).alias("e"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["e"] == r["u"], (r["id_a"], r["id_b"], r["e"], r["u"])


def test_cosine_pair_batch_null_and_shape_corners(spark):
    from skewer_spark.operators.similarity import cosine, with_pair_cosine

    rows = [
        (1, [1.0, 2.0], [1.0, 2.0]),
        (2, [0.0, 0.0], [1.0, 2.0]),          # zero norm → NULL
        (3, None, [1.0, 2.0]),                # NULL vec → NULL
        (4, [1.0], [1.0, 2.0]),               # length mismatch → NULL
        (5, [], []),                          # empty → NULL
        (6, [float("nan"), 1.0], [1.0, 1.0]),  # NaN propagates as NaN
        (7, [None, 1.0], [1.0, 1.0]),          # null ELEMENT → NULL
    ]
    df = spark.createDataFrame(
        rows, "k long, a array<float>, b array<float>"
    )
    got = (
        with_pair_cosine(df, "a", "b", "u")
        .select("k", "u", cosine(F.col("a"), F.col("b")).alias("e"))
        .collect()
    )
    assert len(got) == len(rows)
    for r in got:
        e, u = r["e"], r["u"]
        if e is None or u is None:
            assert e is None and u is None, (r["k"], e, u)
        else:
            assert (e != e and u != u) or e == u, (r["k"], e, u)


@pytest.mark.parametrize("bands,rpb", [(4, 8), (2, 4), (8, 2)])
def test_band_sig_batch_matches_expr_shapes(spark, bands, rpb):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .limit(200)
    )
    a = _rows(band_buckets(emb, bands=bands, rows_per_band=rpb,
                           bucket_cap=None))
    b = _rows(band_buckets_expr(emb, bands=bands, rows_per_band=rpb,
                                bucket_cap=None))
    assert a == b
