"""PageRank (operators/graph.py) vs an independent Python reference."""

from __future__ import annotations

from skewer_spark.operators.graph import pagerank


def _py_pagerank(edges, iters, d=0.85):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in nodes}
    tp = (1.0 - d) / n
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        s_in = {v: 0.0 for v in nodes}
        for s, ts in out.items():
            for t in ts:
                s_in[t] += r[s] / len(ts)
        r = {v: tp + d * (s_in[v] + dm / n) for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),   # cycle
    ("a", "e"),                            # e is a sink (dangling)
    ("d", "a"), ("d", "b"),                # d fans out
    ("a", "b"),                            # duplicate edge: counts once
]


def _edges_df(spark):
    return spark.createDataFrame(_EDGES, "src string, dst string")


def test_pagerank_matches_reference(spark):
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), iters=5).collect()}
    want = _py_pagerank(_EDGES, iters=5)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 2e-6, (v, got[v], want[v])


def test_pagerank_mass_conserved(spark):
    for iters in (1, 4):
        ranks = [r.rank for r in pagerank(_edges_df(spark), iters=iters).collect()]
        assert abs(sum(ranks) - 1.0) < 1e-4  # 6-dp rounding noise only


def test_pagerank_sink_free_graph(spark):
    # r6: a graph with NO dangling nodes takes the fast path that drops
    # the dangling-mass aggregate entirely — must still match the
    # reference (which computes dm = 0 naturally) and conserve mass
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=4).collect()}
    want = _py_pagerank(edges, iters=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 2e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_ordering_sensible(spark):
    # the cycle members + fan-in target outrank the dangling sink
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), iters=8).collect()}
    assert got["a"] > got["e"]
    assert got["b"] > got["e"]


def test_pagerank_releases_caches(spark):
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    df = pagerank(_edges_df(spark), iters=3)
    df.collect()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    # at most the result's own checkpoint RDD is new; the edge/node/
    # sink frames and every iteration's rank frame are released
    assert len(after - before) <= 1


def test_triangle_counts_known_graph(spark):
    from skewer_spark.operators.graph import triangle_counts

    # triangle 1-2-3, pendant 3-4, isolated edge 5-6; duplicate and
    # reversed edges must not inflate counts
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (5, 6), (6, 5)],
        "src long, dst long",
    )
    out = {r.node: r for r in triangle_counts(edges).collect()}
    assert out[1].n_triangles == 1
    assert out[2].n_triangles == 1
    assert out[3].n_triangles == 1
    assert out[4].n_triangles == 0
    assert out[5].n_triangles == 0
    assert out[1].total_triangles == 1
    assert set(out) == {1, 2, 3, 4, 5, 6}


def test_triangle_counts_k4(spark):
    from itertools import combinations

    from skewer_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a, b in combinations(range(4), 2)],
        "src long, dst long",
    )
    out = {r.node: r for r in triangle_counts(edges).collect()}
    assert all(out[n].n_triangles == 3 for n in range(4))
    assert out[0].total_triangles == 4


def test_triangle_counts_self_loops_ignored(spark):
    from skewer_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    out = {r.node: r for r in triangle_counts(edges).collect()}
    assert out[1].total_triangles == 1
