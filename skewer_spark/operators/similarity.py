"""Similarity search over embedding columns (array<float>).

Three paths:

* ``brute_force_topk`` — exact cosine top-k.  The dot product is a
  sequential ``aggregate`` fold over ``zip_with`` in double precision
  (JVM expressions, no UDF); top-k is a single ``ORDER BY … LIMIT k``
  which Spark executes as per-partition top-k + driver merge
  (TakeOrderedAndProject) — no global sort, scales linearly.
* ``lsh_bucketed_topk`` — random-hyperplane LSH ANN with multi-probe:
  the query's bucket is computed DRIVER-SIDE (plain numpy — no 1-row
  Spark job), and all buckets within ``probe_hamming`` bit flips are
  probed (``bit_count(bucket XOR qbucket) <= h``), then exact-ranked.
* ``cosine_pairs_above`` — embedding near-duplicate pairs via BANDED
  multi-signature hyperplane LSH (the MinHash-LSH shape from
  operators/dedup.py): ``bands`` independent signatures of
  ``rows_per_band`` planes each; docs sharing any band bucket are
  candidates; candidates are exact-cosine filtered.  Buckets are
  width-capped (deterministic ``row_number <= cap``) so one degenerate
  bucket can never go quadratic — the property that matters at 10^10
  docs.  Candidate volume ≈ bands · Σ_bucket min(|bucket|, cap)² ≪ n².

Hyperplane components are INTEGER-VALUED (an LCG over the (plane, dim)
index, range [-1000, 1000]) rather than hashed floats: exact in IEEE
double on any engine, so the DuckDB oracle reproduces buckets — and
therefore candidate sets and result hashes — bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold — deterministic summation order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not NaN) for zero-norm inputs: Spark orders NaN ABOVE every
    double, so an unguarded 0/0 would rank an all-zero embedding (empty
    text, padding row) first in every top-k and pass every ``>= t``
    pair filter; NULL sorts last under DESC and fails the filter."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


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


# ---------------------------------------------------------------------------
# deterministic integer hyperplanes (oracle-reproducible)
# ---------------------------------------------------------------------------

def lcg_plane(plane: int, dim: int) -> list[int]:
    """Integer pseudo-random hyperplane components in [-1000, 1000].

    Plain LCG over the flat (plane, dim) index — expressible verbatim in
    ANSI SQL, so DuckDB derives the identical plane and the sign of the
    double-precision dot product matches bit-for-bit (integer
    coefficients make the products exact; only the sum rounds, and both
    engines fold left-to-right)."""
    return [
        ((plane * dim + d) * 1103515245 + 12345) % 2001 - 1000
        for d in range(dim)
    ]


def _plane_col(plane: int, dim: int) -> Column:
    return F.array(*[F.lit(float(c)) for c in lcg_plane(plane, dim)])


def hyperplane_bucket(
    vec_col: str, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Sign-pattern bucket id (0 .. 2^n_planes-1) for an embedding."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _plane_col(plane_offset + p, dim)
        bit = (dot(F.col(vec_col), plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def query_bucket(vec: list[float], n_planes: int, plane_offset: int = 0) -> int:
    """Driver-side bucket for a literal query vector (no Spark job)."""
    bucket = 0
    for p in range(n_planes):
        plane = lcg_plane(plane_offset + p, len(vec))
        acc = 0.0
        for x, c in zip(vec, plane):
            acc += float(x) * float(c)
        if acc >= 0:
            bucket |= 1 << p
    return bucket


def md5_plane(plane: int, dim: int) -> list[int]:
    """Integer plane components in [-1000, 1000] drawn per (plane, d)
    from md5 — mutually UNCORRELATED across planes, which JL projection
    requires (``lcg_plane`` is affine in the flat index, so its
    consecutive planes are strided arithmetic sequences: fine for sign
    buckets, structurally correlated for distance estimation — measured
    pairwise-distance correlation 0.22 vs 0.98 on the fixture).
    Engine-replicable: DuckDB derives the identical component as
    ``('0x' || substr(md5('jl:' || p || ':' || d), 1, 15))::BIGINT
    % 2001 - 1000`` (60-bit positive prefix, so the mod is unbiased to
    ~2^-49 and sign-safe on both engines)."""
    import hashlib

    return [
        int(hashlib.md5(f"jl:{plane}:{d}".encode()).hexdigest()[:15], 16)
        % 2001
        - 1000
        for d in range(dim)
    ]


def _md5_plane_col(plane: int, dim: int) -> Column:
    return F.array(*[F.lit(float(c)) for c in md5_plane(plane, dim)])


def jl_scale(out_dim: int) -> float:
    """Johnson–Lindenstrauss normalization for the md5-drawn projection
    planes (:func:`md5_plane` — NOT :func:`lcg_plane`, whose correlated
    strides are exactly what projection must avoid):
    ``1 / (sqrt(out_dim) * plane_component_std)`` where components are
    uniform on the 2001 integers [-1000, 1000] (variance (2001²-1)/12).
    With it, E[‖proj(x) − proj(y)‖²] = ‖x − y‖² — projected distances
    estimate original distances, not just rank them.  Both engines
    evaluate the identical double-precision formula (sqrt is correctly
    rounded IEEE on both)."""
    import math

    return 1.0 / (math.sqrt(float(out_dim)) * math.sqrt((2001.0 * 2001.0 - 1.0) / 12.0))


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    dim: int = 64,
    plane_offset: int = 5000,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: reduce ``dim``-d
    embeddings to ``out_dim`` dimensions with deterministic md5-drawn
    integer planes (Achlioptas 2003 shows database-friendly ±1-style
    projections suffice; the dense uniform-integer variant here keeps
    the oracle-exact arithmetic the rest of this module is built on).

    This is the documented scale path INTO the LSH/IVF operators: at
    10^10+ vectors, banding/bucketing on 64→16-d projections costs 4×
    less memory bandwidth per signature while preserving pairwise
    distances in expectation (test-pinned correlation on the fixture).

    Scale shape (the 100 TB contract): the planes are PLAN LITERALS —
    no join, no broadcast, no Python; each output component is one
    sequential-fold dot product in codegen, O(dim·out_dim) flops per
    row riding the scan, zero shuffles.  ``plane_offset`` namespaces
    these planes away from the LSH planes so composing the two never
    reuses a hyperplane."""
    s = jl_scale(out_dim)
    comps = [
        F.round(
            dot(F.col(vec_col), _md5_plane_col(plane_offset + j, dim)) * F.lit(s), 6
        )
        for j in range(out_dim)
    ]
    return df.withColumn(out_col, F.array(*comps))


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: multi-probe the query's LSH bucket, then exact rank.

    ``probe_hamming=h`` admits every bucket within h sign flips of the
    query's (``C(n_planes, <=h)`` of ``2^n_planes`` buckets) — the
    standard multi-probe recall fix for points near a hyperplane.  With
    the defaults that is 37/256 buckets ≈ 7× candidate reduction while
    planted near-dups (cos ≥ 0.95) are recalled w.p. ≥ 0.9."""
    if len(query_vec) != dim:
        # a mismatch is silent otherwise: data-side planes are built
        # for `dim` while the query bucket derives planes from
        # len(query_vec) — different hyperplanes, recall collapses to
        # noise (or zip_with NULL-pads and every row is filtered out)
        raise ValueError(
            f"query_vec has {len(query_vec)} dims, expected dim={dim}"
        )
    qb = query_bucket(query_vec, n_planes)
    # data-side bucket via the numpy lockstep twin (one band of
    # n_planes rows ≡ hyperplane_bucket at plane_offset 0, bit-for-bit
    # — same LCG planes, same IEEE fold order, same NULL/length/NaN
    # semantics; pinned by tests).  Beyond the usual §4.2 win, the UDF
    # boundary keeps the optimizer from pushing the bucket predicate —
    # with the whole interpreted fold inlined — below the parallelism
    # repartition, where it ran single-partition (r6).
    bucketed = df.withColumn(
        "_bucket",
        _band_sig_udf(1, n_planes, dim)(F.col(vec_col)).getItem(0),
    )
    cand = bucketed.filter(
        F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qb))) <= probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-flat ANN (inverted-file index: coarse quantize, probe nearest cells)
# ---------------------------------------------------------------------------

def _cos_const_udf(centroids_sorted: list[list[float]]):
    """Numpy lockstep twin of ``[cosine(vec, c) for c in centroids]``
    (r6, guide §4.2 — same rationale and bit-parity construction as
    ``_band_sig_udf``): returns the UNROUNDED cosines as array<double>
    in the given centroid order; callers keep ``F.round`` in
    expressions so Spark's HALF_UP rounding semantics are byte-
    untouched.  Per-element ops replay the expression path exactly:
    ``float64(x_d) * c_d`` accumulated dimension-by-dimension (the
    fold's IEEE order), ``sqrt(na) * sqrt(nc)`` denominators with the
    constant norms pre-folded in the same order Catalyst constant-folds
    them, NULL (not NaN) where the denominator is exactly zero, NULL
    for NULL or length≠dim vectors (pinned by tests/test_lsh_batch.py).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids_sorted, np.float64)       # (k, dim)
    k, dim = C.shape
    cn = np.empty(k, np.float64)
    for j in range(k):
        acc = 0.0
        for d in range(dim):
            acc += C[j, d] * C[j, d]
        cn[j] = math.sqrt(acc)

    @pandas_udf("array<double>")
    def cos_arr(v: pd.Series) -> pd.Series:
        n = len(v)
        lens = np.fromiter(
            (len(x) if x is not None else -1 for x in v), np.int64, count=n
        )
        ok = lens == dim
        out = np.empty(n, object)
        m = int(ok.sum())
        if m:
            X = np.stack(v[ok].to_list()).astype(np.float64)
            dots = np.zeros((m, k), np.float64)
            na = np.zeros(m, np.float64)
            for d in range(dim):
                xd = X[:, d]
                dots += xd[:, None] * C.T[None, d, :]
                na += xd * xd
            denom = np.sqrt(na)[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / denom
            zero = denom == 0.0
            rows = []
            for i in range(m):
                if zero[i].any():
                    rows.append([
                        None if zero[i, j] else cos[i, j] for j in range(k)
                    ])
                else:
                    rows.append(cos[i])
            oki = np.flatnonzero(ok)
            for j, i in enumerate(oki):
                out[i] = rows[j]
        null_row = [None] * k
        for i in np.flatnonzero(~ok):
            out[i] = null_row
        return pd.Series(out)

    return cos_arr


def with_pair_cosine(
    df: DataFrame, a_col: str, b_col: str, out_col: str
) -> DataFrame:
    """Append unrounded ``cosine(a_col, b_col)`` via a mapInArrow
    lockstep batch (r6, guide §4.2): the expression twin ran three
    interpreted ``aggregate(zip_with(...))`` folds per candidate pair.
    Bit parity is by construction — per-length groups accumulate one
    dimension per step in the fold's IEEE order — and mapInArrow builds
    the Arrow result array directly, so FULL NaN/null parity holds (a
    pandas UDF would lose NaN to null at the Arrow boundary):

    * NULL where a vector is NULL, lengths differ, any ELEMENT is null
      (the zip_with null-pad / null-product poisons the fold), or the
      denominator is exactly zero;
    * genuine NaN components propagate to a NaN cosine (which Spark
      ranks above every double — same hazard as the expression, kept);
    * callers apply ``F.round`` in expressions (Spark HALF_UP
      untouched).  Pinned by tests/test_lsh_batch.py."""
    import pyarrow as pa

    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType — StructType.add would MUTATE the frame's cached
    # schema object and corrupt downstream resolution
    names = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _decompose(arr):
        offs = np.asarray(arr.offsets, np.int64)
        vals = arr.values
        flat = np.asarray(vals.cast(pa.float64(), safe=False))
        null_row = (
            np.asarray(arr.is_null()) if arr.null_count
            else np.zeros(len(arr), bool)
        )
        elem_null = (
            np.asarray(vals.is_null()) if vals.null_count else None
        )
        return offs, flat, null_row, elem_null

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            cols = {name: batch.column(i) for i, name in enumerate(names)}
            ao, av, anull, aen = _decompose(cols[a_col])
            bo, bv, bnull, ben = _decompose(cols[b_col])
            la = ao[1:] - ao[:-1]
            lb = bo[1:] - bo[:-1]
            ok = (~anull) & (~bnull) & (la == lb) & (la > 0)
            for en, offs in ((aen, ao), (ben, bo)):
                if en is not None:
                    c = np.concatenate(([0], np.cumsum(en)))
                    ok &= (c[offs[1:]] - c[offs[:-1]]) == 0
            out = np.full(n, np.nan, np.float64)
            valid = np.zeros(n, bool)
            lens = np.unique(la[ok]) if ok.any() else []
            for L in lens:
                grp = np.flatnonzero(ok & (la == L))
                m = grp.size
                idx_a = ao[:-1][grp]
                idx_b = bo[:-1][grp]
                dp = np.zeros(m, np.float64)
                na = np.zeros(m, np.float64)
                nb = np.zeros(m, np.float64)
                for d in range(int(L)):
                    xd = av[idx_a + d]
                    yd = bv[idx_b + d]
                    dp += xd * yd
                    na += xd * xd
                    nb += yd * yd
                denom = np.sqrt(na) * np.sqrt(nb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cs = dp / denom
                nz = denom != 0.0
                out[grp[nz]] = cs[nz]
                valid[grp[nz]] = True
            cos_arr = pa.array(out, type=pa.float64(), mask=~valid)
            yield pa.RecordBatch.from_arrays(
                [cols[name] for name in names] + [cos_arr],
                names=names + [out_col],
            )

    return df.mapInArrow(fn, out_schema)


def ivf_assign(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag each vector with its nearest-centroid cell id (``_cell``).

    The coarse-quantization half of an IVF index: |C| cosines per row
    from the numpy lockstep batch twin (`_cos_const_udf`; the
    expression path ran |C| interpreted ``aggregate(zip_with(...))``
    folds per row), argmax via ``array_max`` over (cos, cid) structs —
    lexicographic struct ordering gives max-cos with max-cid tiebreak,
    which the DuckDB oracle reproduces with ``row_number() OVER (ORDER
    BY cos DESC, cid DESC)``.  Cosines are rounded to 6 places (in
    EXPRESSIONS — Spark HALF_UP untouched) BEFORE the argmax so both
    engines pick the same cell even when their float summation orders
    differ.  At 100 TB the centroid list is a broadcast-sized constant
    (k ≤ ~2^16) and the assignment is a narrow map — no shuffle."""
    cids = sorted(centroids)
    dim = len(next(iter(centroids.values()))) if centroids else 0
    arr = _cos_const_udf([[float(x) for x in centroids[c]] for c in cids])(
        F.col(vec_col)
    )
    scored = []
    for i, cid in enumerate(cids):
        scored.append(
            F.struct(
                F.round(F.element_at(arr, i + 1), 6).alias("cos"),
                F.lit(cid).alias("cid"),
            )
        )
    return df.withColumn("_cell", F.array_max(F.array(*scored))["cid"])


def ivf_assign_expr(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-expression twin of :func:`ivf_assign` — the differential
    reference (tests/test_lsh_batch.py) and no-Python fallback."""
    scored = []
    for cid, vec in sorted(centroids.items()):
        c = F.array(*[F.lit(float(x)) for x in vec])
        scored.append(
            F.struct(
                F.round(cosine(F.col(vec_col), c), 6).alias("cos"),
                F.lit(cid).alias("cid"),
            )
        )
    return df.withColumn("_cell", F.array_max(F.array(*scored))["cid"])


def _driver_cosine(a: list[float], b: list[float]) -> float:
    dp = an = bn = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        dp += x * y
        an += x * x
        bn += y * y
    if an == 0.0 or bn == 0.0:
        # zero-norm: undefined direction → rank last (mirrors the
        # Column-side cosine() returning NULL)
        return float("-inf")
    return dp / ((an ** 0.5) * (bn ** 0.5))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: dict[int, list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat ANN top-k: probe the ``nprobe`` cells nearest the query,
    exact-rank inside them.

    The scale path next to LSH (``lsh_bucketed_topk``): centroids
    partition the corpus into |C| cells; the query scans only
    nprobe/|C| of the data.  Probe cells are chosen DRIVER-SIDE (plain
    floats, no Spark job), with the same round-to-6 + max-cid tiebreak
    as :func:`ivf_assign` so the oracle's SQL probe list matches.
    Centroid *training* lives in
    :func:`skewer_spark.operators.cluster.kmeans_fit` (distributed
    Lloyd with deterministic maximin seeding — train on a sample,
    persist the dict); tests and the oracle-paired query use the
    lowest-id vectors (zero-iteration seeding) so DuckDB stays exact."""
    ranked = sorted(
        ((round(_driver_cosine(query_vec, v), 6), cid) for cid, v in centroids.items()),
        key=lambda t: (-t[0], -t[1]),
    )
    probe = [cid for _, cid in ranked[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ivf_assign(df, centroids, vec_col)
        .filter(F.col("_cell").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# banded near-duplicate pairs
# ---------------------------------------------------------------------------

def band_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    rows_per_band: int = 8,
    dim: int = 64,
    bucket_cap: int | None = 200,
) -> DataFrame:
    """(id, band_id, bucket) — ``bands`` independent sign signatures.

    One narrow pass computes every plane dot (bands · rows_per_band
    array folds, all inside one codegen span), then explodes to the
    per-band rows.  ``bucket_cap`` deterministically truncates each
    (band, bucket) group to its ``cap`` lowest ids (``row_number``) so
    a degenerate bucket — all-zero vectors, adversarial dumps — bounds
    join work at cap² instead of |bucket|²; at 100 TB pair the cap with
    a salted re-join of the truncated tail if full recall inside jumbo
    buckets matters."""
    out = (
        df.select(
            F.col(id_col),
            F.posexplode(
                _band_sig_udf(bands, rows_per_band, dim)(F.col(vec_col))
            ).alias("band_id", "bucket"),
        )
    )
    from .dedup import cap_per_group

    return cap_per_group(out, ["band_id", "bucket"], id_col, bucket_cap)


def band_buckets_expr(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    rows_per_band: int = 8,
    dim: int = 64,
    bucket_cap: int | None = 200,
) -> DataFrame:
    """Pure-expression twin of :func:`band_buckets` — the reference the
    batch UDF is differentially pinned against (tests/test_lsh_batch.py)
    and the no-Python fallback."""
    sig_cols = []
    for b in range(bands):
        bucket = F.lit(0).cast("long")
        for r in range(rows_per_band):
            plane = _plane_col(b * rows_per_band + r, dim)
            bit = (dot(F.col(vec_col), plane) >= 0).cast("long")
            bucket = bucket + F.shiftleft(bit, r)
        sig_cols.append(
            F.struct(F.lit(b).alias("band_id"), bucket.alias("bucket"))
        )
    out = (
        df.select(F.col(id_col), F.explode(F.array(*sig_cols)).alias("e"))
        .select(id_col, "e.band_id", "e.bucket")
    )
    from .dedup import cap_per_group

    return cap_per_group(out, ["band_id", "bucket"], id_col, bucket_cap)


def _band_sig_udf(bands: int, rows_per_band: int, dim: int):
    """Numpy lockstep twin of the banded sign-signature expressions
    (r6, guide §4.2): the expression path runs bands·rows_per_band
    interpreted ``aggregate(zip_with(...))`` folds per row (Catalyst
    does not codegen higher-order functions — ~2048 interpreted lambda
    steps per 64-dim row), which made the signature projection the
    single hottest span of every LSH query.  The UDF reproduces the
    fold BIT-FOR-BIT by construction: one python-loop pass over the
    dimensions (lockstep, bounded by ``dim``, never by row count)
    accumulating ``acc += float64(x_d) * h_d`` in exactly the fold's
    IEEE operation order, so the sign — and therefore every bucket,
    candidate set and result hash — is identical on any input, not
    just the fixtures (pinned by tests/test_lsh_batch.py).

    Parity corners: float32→float64 casts are exact; Spark compares
    ``NaN >= 0`` as TRUE (NaN sorts above every double), replicated
    via ``| isnan``; a NULL or length≠dim vector folds to NULL in the
    expression path (zip_with pads with nulls) → the UDF emits an
    all-NULL bucket array for those rows.  Documented deviation: a
    null ELEMENT inside a length-dim vector arrives as NaN through
    Arrow (indistinguishable from a genuine NaN), so such a vector
    buckets like a NaN vector instead of folding to NULL — no producer
    in this repo emits element-null embeddings."""
    from pyspark.sql.functions import pandas_udf

    n_planes = bands * rows_per_band
    H = np.array(
        [lcg_plane(p, dim) for p in range(n_planes)], np.float64
    ).T  # (dim, planes)
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    @pandas_udf("array<long>")
    def sig(v: pd.Series) -> pd.Series:
        n = len(v)
        null_row = [None] * bands
        lens = np.fromiter(
            (len(x) if x is not None else -1 for x in v), np.int64, count=n
        )
        ok = lens == dim
        out = np.empty(n, object)
        m = int(ok.sum())
        if m:
            X = np.stack(v[ok].to_list()).astype(np.float64)
            acc = np.zeros((m, n_planes), np.float64)
            for d in range(dim):
                acc += X[:, d, None] * H[None, d, :]
            bits = (acc >= 0.0) | np.isnan(acc)
            buck = np.zeros((m, bands), np.int64)
            for b in range(bands):
                buck[:, b] = (
                    bits[:, b * rows_per_band:(b + 1) * rows_per_band]
                    * weights
                ).sum(axis=1)
            oki = np.flatnonzero(ok)
            rows = list(buck)
            for j, i in enumerate(oki):
                out[i] = rows[j]
        for i in np.flatnonzero(~ok):
            out[i] = null_row
        return pd.Series(out)

    return sig


def cosine_pairs_above(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    rows_per_band: int = 8,
    dim: int = 64,
    bucket_cap: int | None = 200,
) -> DataFrame:
    """Embedding near-dup pairs: banded LSH candidates + exact cosine.

    Candidates come from a per-band bucket self-join (union across
    bands via the exploded band column, one shuffle on tiny
    (band, bucket) keys), deduped, then the exact cosine is computed by
    joining the embeddings back on id — the big vectors never ride
    through the bucket shuffle."""
    b = band_buckets(df, vec_col, id_col, bands, rows_per_band, dim, bucket_cap)
    # fixed-width co-partitioned self-join: AQE sizes partitions by the
    # tiny bucket-row input and would run the (quadratic-output) join
    # as one task — same trap as dedup._band_pairs; the explicit
    # repartition is one reused exchange
    n = b.sparkSession.sparkContext.defaultParallelism
    b = b.repartition(n, "band_id", "bucket")
    a_side = b.select(
        F.col(id_col).alias("id_a"), "band_id", "bucket"
    )
    b_side = b.select(
        F.col(id_col).alias("id_b"), "band_id", "bucket"
    )
    pairs = (
        a_side.join(b_side, on=["band_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    ).repartition(n, "id_a")  # keep the per-pair exact-cosine stage wide
    emb_a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    emb_b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        with_pair_cosine(
            pairs.join(emb_a, "id_a").join(emb_b, "id_b"),
            "_va", "_vb", "_cos_raw",
        )
        .withColumn("cos_sim", F.round(F.col("_cos_raw"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def hard_negative_pairs(
    df: DataFrame,
    lo: float = 0.3,
    hi: float = 0.85,
    per_anchor: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    rows_per_band: int = 8,
    dim: int = 64,
    bucket_cap: int | None = 200,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    anchor, the ``per_anchor`` most-similar neighbors whose cosine
    falls in ``[lo, hi)`` — close enough to be informative negatives,
    below the near-duplicate line where they would be false negatives
    (the batch-mining step of every retrieval/embedding fine-tune:
    DPR, SimCSE-style pipelines).

    Returns ``(anchor_id, negative_id, cos_sim, rank)`` with the
    deterministic (cos DESC, id ASC) per-anchor order.  Band cuts use
    the ROUNDED cosine, so both engines cut identically.

    Scale shape: candidates and exact cosines come from
    :func:`cosine_pairs_above` (banded LSH, capped buckets, fixed-width
    exchanges, embeddings never ride the bucket shuffle); everything
    after — orientation union, the ``[lo, hi)`` band filter, the
    per-anchor top-k window — runs on the candidate PAIR frame, which
    the LSH stage already bounded.  One window exchange on anchor_id.
    Anchors whose collisions are all above ``hi`` (pure duplicates) or
    below ``lo`` yield no rows — by design: a training pipeline treats
    no-negative anchors separately (in-batch negatives), it never
    wants a junk pad row."""
    p = cosine_pairs_above(
        df, lo, vec_col, id_col, bands, rows_per_band, dim, bucket_cap
    ).filter(F.col("cos_sim") < hi)
    # both orientations via ONE explode instead of a union of two
    # projections: a union's branches are separate subtrees, so the
    # LSH + exact-cosine pipeline above plans twice (r6; the explicit
    # repartition exchanges are reused across the branches, so the
    # measured win at sf0.1 is within noise — the explode keeps the
    # plan single-subtree so nothing downstream depends on
    # ReusedExchange kicking in, and halves planning surface).
    both = p.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("anchor_id"),
                    F.col("id_b").alias("negative_id"),
                ),
                F.struct(
                    F.col("id_b").alias("anchor_id"),
                    F.col("id_a").alias("negative_id"),
                ),
            )
        ).alias("_e"),
        "cos_sim",
    ).select("_e.anchor_id", "_e.negative_id", "cos_sim")
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_anchor)
    )


# ---------------------------------------------------------------------------
# SQ8: symmetric int8 scalar quantization (the memory-footprint scale path)
# ---------------------------------------------------------------------------
#
# At 10^10 embeddings × 64 float32 dims the vector column alone is
# ~2.5 TB; int8 codes cut that 4× and quadruple the vectors resident
# per executor during scan/rerank stages (FAISS ScalarQuantizer
# trade-off).  This is SYMMETRIC quantization with ONE global scale
# (the int8-GEMM convention from inference engines, not FAISS's
# per-dim affine SQ8): s = absmax / 127, code(x) = clamp(round(x/s)).
# The single scale is deliberate — it buys an exactness property that
# per-dimension scales destroy:
#
#     dequantized_dot(x, y) = s² · Σ c_x·c_y
#
# so ranking by the INTEGER code dot product IS the dequantized
# inner-product ranking (s² > 0 is rank-invariant), all arithmetic
# after encoding is exact int64 (no float summation-order hazard — the
# DuckDB oracle matches bit-for-bit regardless of aggregation order),
# and the only approximation vs the true inner product is the bounded
# per-component quantization error |x - s·c| ≤ s/2.  Per-dim affine
# codes (the first cut of this module) rank by Σ(x-mn_d)(y-mn_d)-ish
# cross terms instead and do NOT agree with value-dot ranking.
#
# Scale shape: the stats pass is one narrow max(|x|) aggregate (a
# scalar to the driver); encode + score are narrow maps; top-k is
# TakeOrderedAndProject.  In production the codes are written once and
# reused per query — steady-state cost is the int8 scored scan only.


def sq8_scale(df: DataFrame, vec_col: str = "embedding") -> float:
    """Global scale s = max|x| / 127 — one scalar off a narrow agg."""
    absmax = df.agg(
        F.max(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
            )
        )
    ).collect()[0][0]
    return float(absmax) / 127.0 if absmax else 1.0


def _sq8_code(x: Column, s: float) -> Column:
    """round-half-up code in [-127, 127]; mirrored by oracle + driver."""
    lvl = F.floor(x.cast("double") / F.lit(s) + F.lit(0.5)).cast("int")
    return F.greatest(F.lit(-127), F.least(F.lit(127), lvl))


def sq8_encode(
    df: DataFrame,
    scale: float,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Add the int8-level code array (narrow map, no shuffle)."""
    return df.withColumn(
        out_col, F.transform(F.col(vec_col), lambda x: _sq8_code(x, scale))
    )


def sq8_query_codes(vec: list[float], scale: float) -> list[int]:
    """Driver-side encode of the query vector (same formula)."""
    return [
        max(-127, min(127, int(math.floor(float(x) / scale + 0.5))))
        for x in vec
    ]


def sq8_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float | None = None,
    codes_col: str | None = None,
) -> DataFrame:
    """Top-k by integer code dot product under symmetric SQ8.

    Returns ``(id, qdot)`` ordered by (qdot DESC, id).  qdot is the
    exact int64 code dot — identically s²-proportional to the
    dequantized inner product, and within Σ|q|·s/2 + Σ|x|·s/2 of the
    true one (rank agreement vs exact IP is fixture-pinned, not a
    theorem).

    The production path passes ``scale`` + ``codes_col`` (codes
    written ONCE by ``sq8_encode``, scale stored beside them): then a
    query is a single int8 scan — no stats pass, no re-encode.  The
    defaults self-compute both (2 scans), the demo/oracle shape."""
    if codes_col is not None and scale is None:
        raise ValueError(
            "codes_col requires the scale the codes were encoded with"
        )
    s = scale if scale is not None else sq8_scale(df, vec_col)
    qcodes = sq8_query_codes(query_vec, s)
    if codes_col is None:
        coded = sq8_encode(df, s, vec_col)
    else:
        coded = df.withColumnRenamed(codes_col, "codes")
    q_arr = F.array(*[F.lit(int(c)) for c in qcodes])
    qdot = F.aggregate(
        F.zip_with(
            F.col("codes"),
            q_arr,
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        coded.select(F.col(id_col), qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), id_col)
        .limit(k)
    )


def sq8_rerank_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefilter: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float | None = None,
    codes_col: str | None = None,
) -> DataFrame:
    """Two-stage ANN: int8 code-dot prefilter, exact inner-product rerank.

    The production SQ8 pattern: the cheap integer scan keeps the top
    ``prefilter * k`` candidates, then only those ids touch the float
    vectors for the exact score — at 10^10 vectors the float column is
    read for ~40 rows instead of the whole corpus.  Both stages use the
    SAME metric (inner product): mixing an IP prefilter with a cosine
    rerank silently drops large-norm/low-angle candidates.  For cosine
    semantics, L2-normalize the embedding column first — then IP IS
    cosine and this operator is a cosine ANN.  The candidate ids are
    collected into an ``IN`` filter driver-side (k-sized by
    construction): a narrow pruned scan + TakeOrderedAndProject, no
    join shuffle."""
    cand = sq8_topk(df, query_vec, k=prefilter * k, vec_col=vec_col,
                    id_col=id_col, scale=scale, codes_col=codes_col)
    ids = [r[0] for r in cand.select(id_col).collect()]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.filter(F.col(id_col).isin(ids))
        .select(
            F.col(id_col),
            F.round(dot(F.col(vec_col), q), 6).alias("ip"),
        )
        .orderBy(F.desc("ip"), id_col)
        .limit(k)
    )
