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
  a broadcast (no driver-side collect in the loop);
* each iteration's rank frame is persisted (eagerly materialized) and
  the superseded one released immediately; every 4 rounds an eager
  ``localCheckpoint`` cuts the accumulated lineage (each round
  references the rank frame three times, so the logical plan triples
  per round — the analyzer OOMs near round 8 without the cut; same
  discipline as ``dedup.dedup_clusters``); the result detaches via
  one final ``localCheckpoint`` so every loop cache is released on
  return;
* N (a scalar metadata count) is the only driver-side value.

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
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .filter(F.col("s").isNotNull() & F.col("t").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.select(
            F.col("id").alias("node"), F.lit(0.0).alias("rank")
        ).localCheckpoint(eager=True)
        nodes.unpersist()
        return out
    outdeg = e.groupBy("s").agg(F.count("*").alias("od"))
    # loop-invariant: every edge with its source's outdegree
    ed = e.join(outdeg, "s").persist()
    # nodes with no out-edges: their mass redistributes uniformly
    sinks = nodes.join(
        outdeg.select(F.col("s").alias("id")), "id", "left_anti"
    ).persist()
    teleport = (1.0 - damping) / n

    ranks = nodes.select("id", (F.lit(1.0) / n).alias("rank")).persist()
    try:
        for i in range(int(iters)):
            contrib = (
                ed.join(ranks, ed["s"] == ranks["id"])
                .select("t", (F.col("rank") / F.col("od")).alias("c"))
                .groupBy("t")
                .agg(F.sum("c").alias("s_in"))
            )
            dang = sinks.join(ranks, "id").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
            new_ranks = (
                nodes.join(contrib, nodes["id"] == contrib["t"], "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "id",
                    (
                        F.lit(teleport)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("s_in"), F.lit(0.0))
                            + F.col("dm") / n
                        )
                    ).alias("rank"),
                )
                .persist()
            )
            new_ranks.count()  # materialize before releasing the old frame
            if (i + 1) % 4 == 0 and i + 1 < iters:
                # bounded plan: each round references the rank frame
                # THREE times (contrib, dangling mass, node join), so
                # the logical plan TRIPLES per round — 3^8 subtrees
                # OOMs the analyzer; cut the lineage every 4 rounds
                cp = new_ranks.localCheckpoint(eager=True)
                new_ranks.unpersist()
                new_ranks = cp
            ranks.unpersist()
            ranks = new_ranks
        # detach the result from the loop caches so they can all release
        out = ranks.select(
            F.col("id").alias("node"), F.round("rank", 6).alias("rank")
        ).localCheckpoint(eager=True)
    finally:
        ranks.unpersist()
        ed.unpersist()
        nodes.unpersist()
        sinks.unpersist()
    return out
