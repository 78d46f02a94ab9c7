"""PageRank over an edge list (domain-authority scoring).

Web-scale curation pipelines weight documents by the authority of
their source domain (e.g. the Common-Crawl-derived host graphs used
for crawl prioritization and quality priors); the reference's closest
analog is its static per-client weighting of destinations
(`/root/reference/conf/*.go` route tables) — this operator computes
the weight from the link structure itself.

Semantics (classic damped PageRank with uniform dangling
redistribution, fixed iteration count for determinism):

* nodes = distinct endpoints of the (deduplicated) edge list;
* ``rank_0 = 1/N``;
* ``rank_{i+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_i(u)/outdeg(u)
  + dangling_i/N)`` where ``dangling_i`` is the total rank mass on
  zero-outdegree nodes — ranks sum to 1 every iteration.

Scale shape (the Pregel shape, expressed declaratively):

* the edge frame joins its outdegree ONCE up front and is persisted —
  loop-invariant, never recomputed;
* each iteration is ONE rank⋈edges hash equi-join + ONE
  partial-aggregable ``groupBy(dst)`` — the canonical message-passing
  shuffle pair; the dangling mass is a 1-row aggregate joined back as
  a broadcast (no driver-side collect in the loop), and a graph with
  ZERO sink nodes (known from the setup stats action) skips that
  machinery outright — ``s_in + 0.0 == s_in`` bit-for-bit;
* each iteration's rank frame is persisted (eagerly materialized) and
  the superseded one released immediately; every 4 rounds an eager
  ``localCheckpoint`` cuts the accumulated lineage (each round
  references the rank frame three times, so the logical plan triples
  per round — the analyzer OOMs near round 8 without the cut; same
  discipline as ``dedup.dedup_clusters``); the result detaches via
  one final ``localCheckpoint`` so every loop cache is released on
  return;
* (N, sink count) — two scalar metadata counts fetched in one
  action — are the only driver-side values.

At 10^10 edges the per-iteration cost is the two exchanges on compact
(id, double) rows — vertex data never carries payloads; skewed
in-degree (every web graph) is a partial-aggregable SUM, so hot
destinations combine map-side instead of flooding one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks after ``iters`` damped iterations: ``(node, rank)``,
    ``rank`` rounded to 6 dp.  ``edges`` is deduplicated; multi-edges
    count once."""
    # r6 setup restructure (guide §2.4 + §7.2 duplicated subtrees): the
    # old shape computed `e = edges.distinct()` as an UNPERSISTED frame
    # consumed by four subtrees (both nodes-union branches, outdeg, and
    # the ed join), re-running the full dedup shuffle per consumer, and
    # attached the outdegree with a JOIN (two more exchanges).  Now the
    # dedup happens once, the outdegree rides the SAME frame as a
    # count-over-window (one exchange on s, no join), the combined
    # frame is the single persisted loop-invariant, and nodes/sinks are
    # derived from the cache (sf0.1: setup 2.25 s → ~0.9 s).
    from pyspark.sql.window import Window

    ed = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .filter(F.col("s").isNotNull() & F.col("t").isNotNull())
        .distinct()
        .withColumn("od", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .persist()
    )
    # node list + has-out-edges flag from ONE explode-aggregate over
    # the cached edge frame (r6b: replaces the union+distinct node
    # build PLUS the left-anti sinks join — one pass, and the sink set
    # becomes a filter of this cache instead of its own joined frame)
    nodes = (
        ed.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("id"), F.lit(True).alias("ho")),
                    F.struct(F.col("t").alias("id"), F.lit(False).alias("ho")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.id").alias("id"), F.col("_e.ho").alias("ho"))
        .groupBy("id")
        .agg(F.max("ho").alias("has_out"))
        .persist()
    )
    # node count and sink count in ONE driver action (the only
    # driver-side values); a sink-free graph — the common shape for
    # event-derived link graphs, incl. the bench fixture — then skips
    # the dangling-mass machinery below entirely
    stats = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("has_out"), 0).otherwise(1)).alias("ns"),
    ).first()
    n, n_sinks = stats["n"], stats["ns"] or 0
    if n == 0:
        out = nodes.select(
            F.col("id").alias("node"), F.lit(0.0).alias("rank")
        ).localCheckpoint(eager=True)
        nodes.unpersist()
        ed.unpersist()
        return out
    teleport = (1.0 - damping) / n

    # no persist: the seed ranks are a constant projection of the
    # cached nodes frame (and the loop variable is reassigned, so a
    # persist here would leak its cache entry — test_graph pins this)
    ranks = nodes.select("id", (F.lit(1.0) / n).alias("rank"))
    try:
        for i in range(int(iters)):
            contrib = (
                ed.join(ranks, ed["s"] == ranks["id"])
                .select("t", (F.col("rank") / F.col("od")).alias("c"))
                .groupBy("t")
                .agg(F.sum("c").alias("s_in"))
            )
            base = nodes.join(contrib, nodes["id"] == contrib["t"], "left")
            if n_sinks:
                # nodes with no out-edges: their mass redistributes
                # uniformly — a 1-row aggregate broadcast (scale-safe;
                # an unpartitioned window here would single-partition
                # the node frame)
                dang = (
                    nodes.filter(~F.col("has_out"))
                    .select("id")
                    .join(ranks, "id")
                    .agg(
                        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
                    )
                )
                rank_expr = F.lit(teleport) + F.lit(damping) * (
                    F.coalesce(F.col("s_in"), F.lit(0.0))
                    + F.col("dm") / n
                )
                base = base.crossJoin(F.broadcast(dang))
            else:
                # dm is identically +0.0: `s_in + 0.0 == s_in` for the
                # non-negative s_in, so dropping the term is
                # bit-identical — and saves a broadcast-build job per
                # iteration
                rank_expr = F.lit(teleport) + F.lit(damping) * F.coalesce(
                    F.col("s_in"), F.lit(0.0)
                )
            new_ranks = base.select("id", rank_expr.alias("rank"))
            # bounded plan: each round references the rank frame THREE
            # times (contrib, dangling mass, node join), so the logical
            # plan TRIPLES per round — 3^8 subtrees OOMs the analyzer;
            # cut the lineage with an EAGER checkpoint every 3 rounds.
            # Between cuts the copies stay lazy: the duplicated
            # subtrees collapse to one execution via ReusedExchange
            # (identical exchange plans), so the per-iteration
            # persist+count() actions the loop used to pay (~0.3 s of
            # scheduler latency each on tiny rank frames, r6) buy
            # nothing at ≤3 rounds and only the cadence action remains.
            if (i + 1) % 3 == 0 and i + 1 < iters:
                new_ranks = new_ranks.localCheckpoint(eager=True)
            ranks = new_ranks
        # detach the result from the loop caches so they can all release
        out = ranks.select(
            F.col("id").alias("node"), F.round("rank", 6).alias("rank")
        ).localCheckpoint(eager=True)
    finally:
        ranks.unpersist()
        ed.unpersist()
        nodes.unpersist()
    return out


def tree_root_depth(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_rounds: int = 20,
) -> DataFrame:
    """Resolve every node of a parent-pointer forest to its root and
    depth via pointer doubling (path doubling): ``(id, root, depth)``.

    The arbitrary-depth generalization of
    :func:`skewer_spark.operators.transcripts.thread_turns` (whose
    reply trees are bounded at depth 2 by the role hierarchy): agent
    traces with nested tool invocations, quote/reply chains, and URL
    redirect graphs all form forests whose depth nobody bounds up
    front.  Roots are rows with NULL ``parent_col``.

    Algorithm — each node keeps a pointer ``ptr`` (initially its
    parent; roots point at themselves) and the hop distance ``d``
    already covered.  Each round self-joins the frame on
    ``a.ptr = b.id`` and composes: ``ptr ← b.ptr``, ``d ← d + b.d``
    once ``b`` is resolved-to-root, doubling the resolved-path length
    every round.  A forest of depth D resolves in ⌈log2 D⌉ + 1
    rounds — ``max_rounds=20`` covers depth 2^20; the loop exits early
    via a scalar convergence probe (count of unresolved nodes, the
    only driver-side value).

    This is the whole point vs the naive one-hop walk: 10^12 turns
    with chain depth 10^4 would need 10^4 sequential joins one hop at
    a time; doubling needs 15.  Per round: ONE hash self-join on the
    pointer plus a projection, compact (id, ptr, long, bool) rows.
    Loop discipline per :func:`pagerank`: persist each round's frame,
    release the superseded one, eager ``localCheckpoint`` every 4
    rounds to cut lineage (the frame is referenced twice per round —
    plan doubles per round otherwise), final result detached via one
    eager checkpoint so every loop cache releases on return.

    Cycles (corrupt parent pointers) never resolve and are emitted
    with ``root = NULL, depth = NULL`` after ``max_rounds`` rather
    than looping forever — fail-visible, mirroring
    ``validate.validate_frame``'s quarantine stance.
    """
    cur = nodes.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
        F.col(parent_col).isNull().alias("done"),
    ).persist()
    try:
        # fused probe+materialize (r6): ONE action per round — the
        # unresolved count both populates the round's cache (a cached
        # plan materializes fully under any action) and is the
        # convergence probe, where the loop previously paid a separate
        # count() per round just to materialize
        pending = cur.filter(~F.col("done")).count()
        for i in range(int(max_rounds)):
            if pending == 0:
                break
            nxt = (
                cur.alias("a")
                .join(
                    cur.select(
                        F.col("id").alias("_bid"),
                        F.col("ptr").alias("_bptr"),
                        F.col("d").alias("_bd"),
                        F.col("done").alias("_bdone"),
                    ).alias("b"),
                    F.col("a.ptr") == F.col("_bid"),
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.when(F.col("a.done"), F.col("a.ptr"))
                    .otherwise(F.coalesce(F.col("_bptr"), F.col("a.ptr")))
                    .alias("ptr"),
                    F.when(F.col("a.done"), F.col("a.d"))
                    .otherwise(F.col("a.d") + F.coalesce(F.col("_bd"), F.lit(0)))
                    .alias("d"),
                    (
                        F.col("a.done")
                        | F.coalesce(F.col("_bdone"), F.lit(False))
                    ).alias("done"),
                )
                .persist()
            )
            # materializes nxt's cache AND advances the probe
            pending = nxt.filter(~F.col("done")).count()
            if (i + 1) % 4 == 0:
                cp = nxt.localCheckpoint(eager=True)
                nxt.unpersist()
                nxt = cp
            cur.unpersist()
            cur = nxt
        out = cur.select(
            "id",
            F.when(F.col("done"), F.col("ptr")).alias("root"),
            F.when(F.col("done"), F.col("d")).alias("depth"),
        ).localCheckpoint(eager=True)
    finally:
        cur.unpersist()
    return out


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts plus the global total —
    the local-clustering signal link-graph curation uses to separate
    organic communities from link farms (spam rings are near-cliques;
    scraped link lists are stars with zero closure).

    Algorithm (degree-ordered edge orientation, the standard
    distributed formulation): deduplicate to undirected canonical
    edges, orient every edge from its lower-(degree, id) endpoint to
    the higher one, then close wedges with two hash joins:
    ``e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)``.  Orientation is the whole scale
    story — every triangle materializes exactly ONCE (no 6x
    duplication, no per-triangle dedup), and each wedge pivot fans out
    only over its HIGHER-degree neighbors, bounding intermediate
    wedges at O(m^1.5) regardless of skew; a celebrity node of degree
    10^6 generates no wedges at all from its low side.  Per-node
    counts come from exploding each triangle's three members into a
    partial-aggregable groupBy.

    Output: ``(node, n_triangles)`` for every node on ≥1 edge (zero
    rows included), with ``total_triangles`` riding each row via a
    1-row broadcast.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    # deg feeds both orientation joins AND the zero-fill node list —
    # persist it or the dedup+degree subtree recomputes per use
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("_du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("_dv"))
    # orient low-(degree, id) → high-(degree, id)
    lo_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    # oriented feeds THREE differently-keyed exchanges (e1 on b, e2 on
    # its a, e3 on the closure pair) — persist it or the dedup+degree
    # subtree recomputes per use; same for tris (per-node + total).
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .persist()
    )
    tris = None
    try:
        e1 = oriented.select(F.col("a"), F.col("b"))
        e2 = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
        e3 = oriented.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
        tris = (
            e1.join(e2, "b")
            .join(
                e3,
                (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
                "inner",
            )
            .select("a", "b", "c")
            .persist()
        )
        per_node = (
            tris.select(
                F.explode(
                    F.array(F.col("a"), F.col("b"), F.col("c"))
                ).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
        nodes = deg.select(F.col("n").alias("node"))
        filled = nodes.join(per_node, "node", "left").na.fill(
            {"n_triangles": 0}
        )
        total = tris.agg(F.count(F.lit(1)).alias("total_triangles"))
        out = filled.crossJoin(F.broadcast(total)).localCheckpoint(
            eager=True
        )
    finally:
        # release even when the wedge join throws (dense-graph OOM):
        # a leaked cache pins heap for the whole single-JVM session
        if tris is not None:
            tris.unpersist()
        oriented.unpersist()
        deg.unpersist()
    return out
