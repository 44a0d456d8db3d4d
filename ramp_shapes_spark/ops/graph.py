"""Graph analytics over entity graphs: PageRank and co-occurrence lift.

KG-construction pipelines need lightweight graph analytics over the
entity graph they build — centrality to rank entities, association
strength to propose new edges.  Both operators here are exact-integer
formulations so the same computation is reproducible bit-for-bit on
any engine and any partitioning (floating-point sums depend on
reduction order; 64-bit integer sums do not).

Scale design (100 TB):

* ``pagerank`` aggregates the raw edge list ONCE (one shuffle on
  (src, dst)), then re-partitions the aggregated edges by ``src`` and
  checkpoints them; every iteration after that joins the STATIONARY
  edge relation against a score table with one row per node, so per
  iteration only the score table moves (shuffled, or broadcast by AQE
  when the node set is small — no forced broadcast, an entity graph
  can have 1e9 nodes).  Per-edge contributions use floor division
  ``(score * w) div out_w`` so every engine computes the identical
  integer, and the damping update is ``base + (d_num * inbound) div
  d_den`` in exact longs.  Dangling-node mass is dropped (the
  standard simplification); the oracle applies the same rule, so
  results stay exact.
* ``cooccur_lift`` computes association lift between entities that
  co-occur in a container (order, document, conversation):
  ``lift = P(a,b) / (P(a) P(b))`` scaled to parts-per-million with
  floor division — exact integers end to end.  The pair expansion is
  bounded by ``max_items_per_container``: a container with more
  distinct entities than the cap is dropped (pair listing is
  quadratic per container by definition, and at web scale one
  mega-container would flood the output with noise pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
) -> DataFrame:
    """Weighted PageRank with exact fixed-point integer arithmetic.

    ``edges`` must carry integral src/dst ids and a positive integral
    weight.  Returns ``(node: long, score_fp: long)`` where ``score_fp``
    is the PageRank score scaled by ``scale`` (initial score = scale
    for every node; teleport base = ((den - num) * scale) div den).

    Every arithmetic step is 64-bit integer (floor division), so the
    result is independent of partitioning, reduction order, and engine
    — the DuckDB oracle (:func:`pagerank_oracle_sql`) unrolls the same
    iterations and matches bit-for-bit.  Intermediate products stay
    below 2^63 as long as ``max_score * max(out-weight sum)`` does;
    with scale=1e9 that allows ~9e9 total weighted degree per node.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # stationary edge relation, partitioned by the per-iteration join
    # key; only the (one-row-per-node) score table moves each round
    e = e.join(out_w, "src").repartition("src").localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    base = ((damping_den - damping_num) * scale) // damping_den
    scores = nodes.select("node", F.lit(int(scale)).cast("long").alias("score_fp"))

    for _ in range(iterations):
        contrib = (
            e.join(scores.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(score_fp * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        scores = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(int(base)).cast("long")
                + F.expr(
                    f"({damping_num} * coalesce(inbound, 0L)) div {damping_den}"
                )
            ).alias("score_fp"),
        )

    return scores


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
) -> str:
    """DuckDB SQL computing the identical fixed-point PageRank.

    ``edges_sql`` must select columns (src, dst, w) with raw (possibly
    duplicate) edges; the oracle aggregates and unrolls ``iterations``
    damping steps with the same integer floor divisions.
    """
    base = ((damping_den - damping_num) * scale) // damping_den
    parts = [
        f"WITH raw AS ({edges_sql})",
        "e0 AS (SELECT src, dst, SUM(w) AS w FROM raw GROUP BY src, dst)",
        "ow AS (SELECT src, SUM(w) AS out_w FROM e0 GROUP BY src)",
        "e AS (SELECT e0.src, e0.dst, e0.w, ow.out_w FROM e0 JOIN ow USING (src))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"s0 AS (SELECT node, CAST({scale} AS BIGINT) AS score_fp FROM nodes)",
    ]
    prev = "s0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"SUM((s.score_fp * e.w) // e.out_w) AS inbound "
            f"FROM e JOIN {prev} s ON s.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS (SELECT n.node, CAST({base} AS BIGINT) + "
            f"({damping_num} * COALESCE(c.inbound, 0)) // {damping_den} AS score_fp "
            f"FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"
        )
        prev = f"s{i}"
    return ",\n".join(parts) + f"\nSELECT node, score_fp FROM {prev}"


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts on the undirected simple graph.

    Edges are canonicalized (undirected, self-loops and duplicates
    dropped).  Uses the degree-ordered node-iterator scheme: each
    undirected edge is directed from its lower-rank endpoint to its
    higher-rank endpoint (rank = (degree, node) — a total order), so
    every triangle is enumerated EXACTLY once as a wedge a->b, a->c
    joined against edge b->c.  Directing by degree bounds the fan-out
    of the wedge self-join by the max out-degree, which for the
    degree-ordered orientation is O(sqrt(|E|)) on any graph — the
    standard defense against Zipf hubs (a hub's edges point INTO it,
    so the hub contributes no wedges).

    ``max_degree`` optionally drops nodes above a degree cap before
    counting (loud, like the dedup guards) for corpora where even
    sqrt(|E|) wedges per node is too much.

    Returns ``(node: long, triangles: long)`` for every node of the
    canonicalized graph (0 for triangle-free nodes).
    """
    und = (
        edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    if max_degree is not None:
        deg0 = (
            und.select(F.col("u").alias("n"))
            .union(und.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count("*").alias("d"))
        )
        hot = deg0.filter(F.col("d") > max_degree).select("n")
        und = (
            und.join(hot.withColumnRenamed("n", "u"), "u", "left_anti")
               .join(hot.withColumnRenamed("n", "v"), "v", "left_anti")
        )
    und = und.localCheckpoint(eager=True)

    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count("*").alias("d"))
    )
    # orient each edge toward the higher (degree, node) rank
    ranked = (
        und.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
           .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("e")
    ).select("e.s", "e.t").localCheckpoint(eager=True)

    wedges = (
        fwd.alias("x")
        .join(fwd.alias("y"), F.col("x.s") == F.col("y.s"))
        .filter(F.col("x.t") < F.col("y.t"))
        .select(
            F.col("x.s").alias("a"),
            F.col("x.t").alias("b"),
            F.col("y.t").alias("c"),
        )
    )
    # close the wedge with the (canonically ordered) third edge
    tri = wedges.join(
        und.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node").agg(F.count("*").alias("triangles"))
    )
    nodes = deg.select(F.col("n").alias("node"))
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def neighbor_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    jaccard_scale: int = 10**6,
    max_degree: int = 10**4,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the undirected graph.

    For every pair of nodes sharing at least one neighbor, returns
    ``(node_a, node_b, n_common, jaccard_ppm)`` with
    ``jaccard_ppm = (n_common * jaccard_scale) div (deg_a + deg_b -
    n_common)`` — exact integers, the classic common-neighbors score
    for proposing missing KG edges.

    Pair generation goes through each shared neighbor's adjacency
    list, so a hub of degree d yields d^2 wedge pairs; nodes with
    degree above ``max_degree`` are excluded as wedge CENTERS (their
    edges still count toward endpoint degrees and common-neighbor
    counts are computed on the hub-filtered wedge set — document this
    to callers: scores are exact on the capped graph).
    """
    und = (
        edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = und.select(F.col("u").alias("n"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("n"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("d"))
    centers = adj.join(
        deg.filter(F.col("d") <= max_degree).select("n"), "n"
    )
    # wedges through each kept center: (nbr_a, nbr_b) with nbr_a < nbr_b
    x = centers.select(F.col("n").alias("c"), F.col("nbr").alias("node_a"))
    y = centers.select(F.col("n").alias("c"), F.col("nbr").alias("node_b"))
    common = (
        x.join(y, "c")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            deg.withColumnRenamed("n", "node_a").withColumnRenamed("d", "deg_a"),
            "node_a",
        )
        .join(
            deg.withColumnRenamed("n", "node_b").withColumnRenamed("d", "deg_b"),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "n_common",
            F.expr(
                f"(n_common * {int(jaccard_scale)}L) "
                "div (deg_a + deg_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )


def cooccur_lift(
    items: DataFrame,
    container_col: str,
    item_col: str,
    lift_scale: int = 10**6,
    max_items_per_container: int = 1000,
) -> DataFrame:
    """Association lift between items co-occurring in a container.

    ``items`` holds (container, item) observations (duplicates fine).
    Returns ``(item_a, item_b, n_ab, lift_ppm)`` for every unordered
    pair with item_a < item_b, where
    ``lift_ppm = (n_ab * n_containers * lift_scale) div (n_a * n_b)``
    — lift above ``lift_scale`` means the pair co-occurs more often
    than independence predicts (a candidate KG edge).

    Pair listing is quadratic per container, so containers with more
    than ``max_items_per_container`` distinct items are EXCLUDED (the
    same guard policy as the dedup ops).  ``n_containers`` counts only
    the kept containers, so the lift stays an exact statement about
    the data the pairs were drawn from.  Joins against the item-count
    table are left to AQE: it broadcasts when the kept item vocabulary
    is small and shuffles when it is not.
    """
    obs = items.select(
        F.col(container_col).alias("__c"), F.col(item_col).alias("__i")
    ).distinct()

    sizes = obs.groupBy("__c").agg(F.count("*").alias("__n"))
    kept = (
        obs.join(sizes, "__c")
        .filter(F.col("__n") <= max_items_per_container)
        .drop("__n")
        .localCheckpoint(eager=True)
    )

    n_containers = kept.select("__c").distinct().count()
    item_counts = kept.groupBy("__i").agg(F.count("*").alias("__ni"))

    a = kept.withColumnRenamed("__i", "item_a")
    b = kept.withColumnRenamed("__i", "item_b")
    pairs = (
        a.join(b, "__c")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        pairs.join(
            item_counts.withColumnRenamed("__i", "item_a").withColumnRenamed(
                "__ni", "n_a"
            ),
            "item_a",
        )
        .join(
            item_counts.withColumnRenamed("__i", "item_b").withColumnRenamed(
                "__ni", "n_b"
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_ab",
            # decimal(38,0) arithmetic: n_ab * n_containers * lift_scale
            # overflows int64 once n_ab * n_containers exceeds ~9.2e12
            # (e.g. 1e9 kept containers and n_ab >= ~9e3) and non-ANSI
            # Spark would wrap silently; the decimal product is exact to
            # 1e38 and floor(/) equals integer div for non-negatives
            F.expr(
                f"CAST(floor((CAST(n_ab AS DECIMAL(19,0)) * "
                f"{int(n_containers)}BD * {int(lift_scale)}BD) / "
                f"(CAST(n_a AS DECIMAL(19,0)) * "
                f"CAST(n_b AS DECIMAL(19,0)))) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
