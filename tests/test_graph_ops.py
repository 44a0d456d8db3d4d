"""PageRank and co-occurrence lift (ops/graph.py).

The operators are exact-integer formulations, so the tests check them
against a pure-Python reference implementing the identical floor-
division arithmetic — any partitioning- or order-dependence in the
Spark plan would show up as a bit-level mismatch.
"""

import pytest


def _py_pagerank(edges, iterations=5, num=85, den=100, scale=10**9):
    """Reference fixed-point PageRank: edges = [(src, dst, w), ...]."""
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0) + w
    out_w = {}
    for (s, _d), w in agg.items():
        out_w[s] = out_w.get(s, 0) + w
    nodes = {s for s, _ in agg} | {d for _, d in agg}
    base = ((den - num) * scale) // den
    score = {n: scale for n in nodes}
    for _ in range(iterations):
        inbound = {}
        for (s, d), w in agg.items():
            inbound[d] = inbound.get(d, 0) + (score[s] * w) // out_w[s]
        score = {n: base + (num * inbound.get(n, 0)) // den for n in nodes}
    return score


def test_pagerank_matches_integer_reference(spark):
    from ramp_shapes_spark.ops.graph import pagerank
    # weighted digraph with a dangling node (4), a self-loop (2->2),
    # duplicate raw edges (aggregated by the op) and an in-only node
    edges = [
        (0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 2, 1), (2, 3, 5),
        (3, 0, 1), (3, 4, 2), (0, 1, 4),  # duplicate (0,1) edge
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r["node"]: r["score_fp"] for r in pagerank(df).collect()}
    want = _py_pagerank(edges)
    assert got == want
    # sanity: dangling node 4 has no out-edges but keeps receiving mass
    assert got[4] > ((100 - 85) * 10**9) // 100


def test_pagerank_independent_of_partitioning(spark):
    from ramp_shapes_spark.ops.graph import pagerank
    edges = [(i % 7, (i * 3) % 7, 1 + i % 4) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    a = {r["node"]: r["score_fp"] for r in pagerank(df).collect()}
    b = {
        r["node"]: r["score_fp"]
        for r in pagerank(df.repartition(13)).collect()
    }
    assert a == b == _py_pagerank(edges)


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {n: 0 for n in adj}
    for u, v in und:
        for w in adj[u] & adj[v]:
            if u < v < w:
                out[u] += 1
                out[v] += 1
                out[w] += 1
    return out


def test_triangle_count_matches_reference(spark):
    from ramp_shapes_spark.ops.graph import triangle_count
    # K4 on {0..3} (4 triangles, 3 per node), a pendant (4), an
    # isolated edge (5,6), duplicate + reversed + self-loop inputs
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (1, 0), (2, 2), (3, 4), (5, 6), (0, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == _py_triangles(edges)
    assert got[0] == 3 and got[4] == 0 and got[5] == 0


def test_triangle_count_degree_cap_drops_hub(spark):
    from ramp_shapes_spark.ops.graph import triangle_count
    # star hub 0 + one triangle among leaves (1,2,3)
    edges = [(0, i) for i in range(1, 8)] + [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"]
           for r in triangle_count(df, max_degree=5).collect()}
    # hub removed entirely: its triangles with leaves vanish,
    # the leaf-only triangle remains
    assert 0 not in got
    assert got[1] == got[2] == got[3] == 1


def test_neighbor_jaccard_exact(spark):
    from ramp_shapes_spark.ops.graph import neighbor_jaccard
    # path 1-2-3 plus triangle 1-3-5: N(1)={2,3,5}, N(3)={1,2,5}...
    edges = [(1, 2), (2, 3), (1, 3), (3, 5), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["jaccard_ppm"])
        for r in neighbor_jaccard(df).collect()
    }
    # pair (1,3): common={2,5} -> 2; deg1=3 deg3=3 -> union=4
    assert out[(1, 3)] == (2, (2 * 10**6) // 4)
    # pair (2,5): common={1,3} -> 2; deg2=2 deg5=2 -> union=2
    assert out[(2, 5)] == (2, 10**6)
    # pair (1,2): common={3} -> 1; deg1=3 deg2=2 -> union=4
    assert out[(1, 2)] == (1, (1 * 10**6) // 4)


def test_cooccur_lift_exact_and_guarded(spark):
    from ramp_shapes_spark.ops.graph import cooccur_lift
    rows = (
        # container 1: items {10, 20}; container 2: {10, 20, 30};
        # container 3: {10};  container 4 exceeds the cap -> dropped
        [(1, 10), (1, 20), (1, 20), (2, 10), (2, 20), (2, 30), (3, 10)]
        + [(4, i) for i in range(100, 104)]
    )
    df = spark.createDataFrame(rows, "c long, i long")
    out = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift_ppm"])
        for r in cooccur_lift(
            df, "c", "i", max_items_per_container=3
        ).collect()
    }
    # kept containers: 1, 2, 3 (n=3); counts: n_10=3, n_20=2, n_30=1
    assert out[(10, 20)] == (2, (2 * 3 * 10**6) // (3 * 2))
    assert out[(10, 30)] == (1, (1 * 3 * 10**6) // (3 * 1))
    assert out[(20, 30)] == (1, (1 * 3 * 10**6) // (2 * 1))
    # no pair from the dropped mega-container
    assert all(a < 100 and b < 100 for a, b in out)
    assert len(out) == 3


def test_cooccur_lift_no_int64_overflow(spark):
    """lift_ppm arithmetic must survive n_ab * n_containers * scale
    beyond int64 (round-5 review: decimal(38,0) product, floor-div)."""
    from ramp_shapes_spark.ops.graph import cooccur_lift

    # two items always together in 40 containers; inflate the scale so
    # the naive int64 product n_ab*n_containers*scale would wrap
    rows = [(c, i) for c in range(40) for i in ("x", "y")]
    obs = spark.createDataFrame(rows, ["container", "item"])
    out = cooccur_lift(obs, "container", "item",
                       lift_scale=10_000_000_000_000_000).collect()
    assert len(out) == 1
    r = out[0]
    # perfect co-occurrence: lift = scale * C / C = scale... with
    # n_ab=40, C=40, n_a=n_b=40: lift = 40*40*S/(40*40) = S exactly
    assert r["lift_ppm"] == 10_000_000_000_000_000
