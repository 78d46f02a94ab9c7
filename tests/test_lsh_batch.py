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
