"""Distributed k-means and cluster-scoped semantic dedup (SemDeDup).

Closes the one "out of band" note on the ANN stack: ``ivf_topk``
(operators/similarity.py) takes a caller-supplied centroid dict;
``kmeans_fit`` here trains that dict in-repo with distributed Lloyd
iterations.  ``semdedup`` then reuses the same cell assignment for
SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): near-duplicate *meaning* — not near-duplicate bytes
— found only WITHIN a cluster cell, which is what makes embedding
dedup tractable at corpus scale (pairs are |cell|-local, never global).

The reference repo has no analog (it is a syslog gateway); these are
part of the training-data-pipeline surface this engine adds on top of
the reference semantics.

Scale shape:

* ``kmeans_fit`` — per iteration: assignment is a NARROW map over
  broadcast-literal centroids (k·dim doubles live in the plan — fine to
  k ≈ 4096; beyond that switch the assignment to a broadcast-join +
  ``min_by`` over a centroid frame); the update is ONE
  posexplode → groupBy(cell, pos) two-phase aggregate, so the n·dim
  component stream combines map-side to ≤ k·dim rows per partition
  before its only shuffle, and the driver collects exactly k·dim
  (cell, pos, sum, count) rows.  No corpus bytes ever sit on the
  driver.  Train on a deterministic sample at 100 TB (centroid quality
  needs ~1000·k points, not the corpus).
* ``kmeans_update`` — the same single Lloyd step with component sums
  QUANTIZED to integers (round(x·1e6) as BIGINT) so the per-cell mean
  is independent of partition summation order: the correctness-harness
  path, bit-reproducible in DuckDB.
* ``semdedup`` — assignment as above; the within-cell candidate
  self-join runs on an EXPLICIT fixed-width exchange on the cell id
  (AQE sizes post-shuffle partitions by the join's *input* bytes and
  would coalesce the quadratic-*output* pair stage to one task — the
  same trap every LSH self-join in operators/dedup.py guards), with the
  one-sided deterministic ``row_number() <= cell_cap`` width cap from
  ``dedup._band_pairs``: a degenerate cell bounds join output at
  |cell|·cap instead of |cell|², and because the OTHER side stays
  uncapped every member still pairs with the cell's lowest-id
  survivors, so the greedy keep-lowest-id decision is unchanged for
  every document similar to a surviving keeper.  Embeddings never ride
  the cell shuffle — the exact-cosine verify joins them back by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skewer_spark.operators.dedup import cap_per_group
from skewer_spark.operators.similarity import cosine, ivf_assign


def _maximin_seeds(
    df: DataFrame, k: int, vec_col: str, id_col: str
) -> dict[int, list[float]]:
    """Deterministic farthest-point (maximin) seeding.

    First seed = lowest-id vector; each next seed is the vector whose
    MAX cosine to the chosen seeds is smallest (rounded to 6, ties by
    lowest id) — the classic k-means++ hardening without its RNG, so
    reruns/resumes reproduce the same model.  Lowest-id-k seeding
    collapses when the id order correlates with content (all k seeds
    land in one blob and Lloyd cannot split the rest); maximin spreads
    seeds across directions by construction.  Each pick is one
    TakeOrdered pass (k passes total — train on a sample at 100 TB).
    """
    first = df.orderBy(id_col).limit(1).select(id_col, vec_col).collect()[0]
    seeds = [[float(x) for x in first[1]]]
    chosen = [first[0]]
    for _ in range(1, k):
        sims = [
            cosine(F.col(vec_col), F.array(*[F.lit(x) for x in s]))
            for s in seeds
        ]
        maxsim = F.greatest(*sims) if len(sims) > 1 else sims[0]
        row = (
            df.filter(~F.col(id_col).isin(*chosen))
            .select(id_col, vec_col, F.round(maxsim, 6).alias("_ms"))
            .orderBy(F.asc("_ms"), F.asc(id_col))
            .limit(1)
            .collect()
        )
        if not row:
            break
        seeds.append([float(x) for x in row[0][vec_col]])
        chosen.append(row[0][id_col])
    return {i: s for i, s in enumerate(seeds)}


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict[int, list[float]]:
    """Train k-means centroids with distributed Lloyd iterations.

    Seeding is deterministic farthest-point (:func:`_maximin_seeds`),
    so reruns and resumes reproduce the same model without RNG state.
    Empty cells keep their previous centroid.  Returns
    ``{cell_id: centroid}`` ready for
    :func:`~skewer_spark.operators.similarity.ivf_topk` /
    :func:`~skewer_spark.operators.similarity.ivf_assign`.
    """
    cents = _maximin_seeds(df, k, vec_col, id_col)
    for _ in range(iters):
        comp = (
            ivf_assign(df, cents, vec_col)
            .select("_cell", F.posexplode(F.col(vec_col)).alias("_p", "_v"))
            .groupBy("_cell", "_p")
            .agg(
                F.sum(F.col("_v").cast("double")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in comp:
            vec = new.setdefault(int(r["_cell"]), [0.0] * len(cents[0]))
            vec[int(r["_p"])] = float(r["_s"]) / float(r["_n"])
        for cid, old in cents.items():
            new.setdefault(cid, old)
        cents = new
    return cents


def kmeans_update(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """One exactly-reproducible Lloyd step: ``(cell, pos, n, c_mean)``.

    Components are quantized (``round(x·quant)`` as BIGINT) before the
    per-cell sum, so the mean does not depend on float summation order
    across partitions — the property that lets the DuckDB oracle match
    the result hash bit-for-bit.  ``kmeans_fit`` uses the plain double
    sum (order differences are ~1 ULP and irrelevant to convergence);
    this is the audited single step.
    """
    q = F.lit(float(quant))
    return (
        ivf_assign(df, centroids, vec_col)
        .select("_cell", F.posexplode(F.col(vec_col)).alias("_p", "_v"))
        .select(
            F.col("_cell").alias("cell"),
            F.col("_p").alias("pos"),
            F.round(F.col("_v").cast("double") * q, 0).cast("long").alias("_qv"),
        )
        .groupBy("cell", "pos")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum("_qv").cast("double") / F.count("*") / q, 6
            ).alias("c_mean"),
        )
    )


def semdedup(
    df: DataFrame,
    centroids: dict[int, list[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_cap: int | None = None,
) -> DataFrame:
    """SemDeDup: drop embedding near-duplicates WITHIN k-means cells.

    Returns one row per input document: ``(id, cell, keep)`` with
    ``keep = false`` iff some lower-id document in the same cell has
    cosine ≥ ``threshold`` (greedy keep-lowest-id, the same keeper rule
    as ``dedup.exact_dedup`` — deterministic, resume-safe).  Candidate
    pairs are cell-local; with ``cell_cap`` the proposing side is
    width-capped one-sidedly (see module docstring) so a degenerate
    cell cannot go quadratic.
    """
    assigned = ivf_assign(df, centroids, vec_col).select(
        F.col(id_col), F.col("_cell").alias("cell")
    )
    n = df.sparkSession.sparkContext.defaultParallelism
    narrow = assigned.repartition(n, "cell")
    a_side = narrow.select(F.col(id_col).alias("id_a"), "cell")
    a_side = cap_per_group(a_side, ["cell"], "id_a", cell_cap)
    b_side = narrow.select(
        F.col(id_col).alias("id_b"), F.col("cell").alias("_cell_b")
    )
    # NO .distinct() here — unlike the multi-band LSH joins this copies
    # the shape of (dedup._band_pairs), each doc sits in exactly ONE
    # cell, so the (cell, id_a < id_b) join cannot emit duplicate
    # pairs; a distinct would re-shuffle the quadratic-output pair
    # stream (the job's largest intermediate) for zero effect
    pairs = (
        a_side.join(
            b_side,
            (F.col("cell") == F.col("_cell_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .repartition(n, "id_a")  # keep the exact-cosine stage wide
    )
    emb_a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    emb_b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    # exact cosine from the numpy lockstep pair twin (r6, bit-identical
    # to the interpreted expression fold — similarity.with_pair_cosine);
    # F.round stays an expression so Spark HALF_UP is untouched
    from skewer_spark.operators.similarity import with_pair_cosine

    drops = (
        with_pair_cosine(
            pairs.join(emb_a, "id_a").join(emb_b, "id_b"),
            "_va", "_vb", "_cos_raw",
        )
        .filter(
            F.round(F.col("_cos_raw"), 6) >= F.lit(float(threshold))
        )
        .select(F.col("id_b").alias("_drop_id"))
        .distinct()
    )
    return (
        assigned.join(
            drops, assigned[id_col] == drops["_drop_id"], "left"
        )
        .select(
            id_col,
            "cell",
            F.col("_drop_id").isNull().alias("keep"),
        )
    )
