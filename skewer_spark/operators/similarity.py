"""Similarity search over embedding columns (array<float>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k.  The dot product is a
  sequential ``aggregate`` fold over ``zip_with`` in double precision
  (JVM expressions, no UDF); top-k is a single ``ORDER BY … LIMIT k``
  which Spark executes as per-partition top-k + driver merge
  (TakeOrderedAndProject) — no global sort, scales linearly.
* ``lsh_bucketed_topk`` — random-hyperplane LSH: ``n_planes``
  deterministic pseudo-random hyperplanes (derived from xxhash64 of
  (plane, dim), so no data shipping and reproducible across runs);
  sign pattern = bucket key.  Query probes only its own bucket —
  the 100 TB path: candidate set shrinks by ~2^n_planes.

Embedding near-duplicate detection = ``cosine_pairs_above`` on
LSH-bucket candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold — deterministic summation order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(f"plane-{plane}-dim-{dim}"))
    return (F.pmod(h, F.lit(2_000_000)).cast("double") / 1_000_000.0) - 1.0


def hyperplane_bucket(
    vec_col: str, n_planes: int = 8, dim: int = 64
) -> Column:
    """Sign-pattern bucket id (0 .. 2^n_planes-1) for an embedding."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[_plane_component(p, d) for d in range(dim)])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("long"), p)
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """ANN: probe only the query's hyperplane bucket, then exact rank."""
    bucketed = df.withColumn("_bucket", hyperplane_bucket(vec_col, n_planes, dim))
    qdf = df.sparkSession.range(1).select(
        hyperplane_bucket_for_literal(query_vec, n_planes).alias("_qb")
    )
    qb = qdf.collect()[0][0]
    cand = bucketed.filter(F.col("_bucket") == F.lit(qb))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def hyperplane_bucket_for_literal(vec: list[float], n_planes: int = 6) -> Column:
    lit_vec = F.array(*[F.lit(float(x)) for x in vec])
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[_plane_component(p, d) for d in range(len(vec))])
        bit = F.when(dot(lit_vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("long"), p)
    return bucket


def cosine_pairs_above(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs: LSH bucket join + exact cosine filter."""
    b = df.withColumn("_bucket", hyperplane_bucket(vec_col, n_planes, dim))
    a_side = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_bucket"
    )
    b_side = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_bucket"
    )
    return (
        a_side.join(b_side, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
