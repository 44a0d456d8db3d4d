"""Entity canonicalization: connected components over candidate-link
edges, with explicit skew defenses.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds of groupBy/join, each expressible as DataFrame ops, far
fewer rounds than naive label propagation on high-diameter graphs.  On
the mention↔entity bipartite graphs this pipeline produces, components
are star-shaped and it converges in 2-3 rounds.

Skew defenses (the Zipf head entity can carry a double-digit share of
all edges):

* min-neighbor aggregation is a ``groupBy().min()`` — Spark's partial
  (map-side) aggregation already collapses hot keys before shuffle;
* the per-round neighbor join broadcasts a **hot-node dictionary**: the
  top-K highest-degree nodes' current minima ship as a broadcast map,
  so hot-key rows resolve map-side and never shuffle.  The hot *set*
  (which node ids are hot) is derived ONCE from the input edge degrees
  before the loop — star rounds only shrink a node's neighborhood, so
  the initial top-K covers every later round's skew — and only the
  per-round minima lookup for that fixed set runs inside the loop;
* AQE skew-join splitting stays on for the residual joins (the engine
  never touches session confs).

Driver loop cost: exactly ONE action per round — the convergence
signature aggregate, which also materializes that round's lazy
``localCheckpoint`` (lineage cut and convergence probe share a job).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def _nbrs(edges: DataFrame) -> DataFrame:
    """Undirected adjacency (n, x), self-loops removed.

    NOT deduplicated: every consumer (min aggregation, degree ranking,
    star connection followed by a final ``distinct``) is duplicate-
    tolerant, and skipping the dedup saves one full shuffle per use."""
    fwd = edges.select(F.col("src").alias("n"), F.col("dst").alias("x"))
    rev = edges.select(F.col("dst").alias("n"), F.col("src").alias("x"))
    return fwd.unionAll(rev).filter(F.col("n") != F.col("x"))


def _min_nbr(nbrs: DataFrame) -> DataFrame:
    """m(n) = min over neighbors and self (map-side combine collapses
    hot keys)."""
    return (
        nbrs.groupBy("n")
        .agg(F.min("x").alias("mn"))
        .select("n", F.least(F.col("n"), F.col("mn")).alias("m"))
    )


def _apply_star(nbrs: DataFrame, minn: DataFrame, large: bool,
                hot_nodes: DataFrame | None) -> DataFrame:
    """One star round: connect (a subset of) neighbors to the group
    minimum.  Hot nodes' minima resolve via a broadcast map-join (no
    shuffle on the hot keys); the residual join shuffles on ``n`` with
    the hot rows removed, so the Zipf head never lands on one reducer."""
    cond = (F.col("x") > F.col("n")) if large else (F.col("x") < F.col("n"))
    part = nbrs.filter(cond)

    if hot_nodes is not None:
        hot_minn = F.broadcast(minn.join(hot_nodes, "n").select("n", "m"))
        resolved = part.join(
            hot_minn.withColumnRenamed("n", "__hn").withColumnRenamed("m", "__hm"),
            F.col("n") == F.col("__hn"),
        ).select(F.col("x").alias("src"), F.col("__hm").alias("dst"))
        rest = part.join(F.broadcast(hot_nodes), "n", "left_anti")
    else:
        resolved = None
        rest = part

    joined = rest.join(
        minn.withColumnRenamed("n", "__jn"), F.col("n") == F.col("__jn")
    ).select(F.col("x").alias("src"), F.col("m").alias("dst"))
    out = joined if resolved is None else joined.unionAll(resolved)
    if not large:
        out = out.unionAll(
            minn.select(F.col("n").alias("src"), F.col("m").alias("dst"))
        )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(edges: DataFrame, hot_k: int = 64,
                         stats: dict | None = None) -> DataFrame:
    """(node, component) for every node in ``edges`` (src/dst string
    columns); component = lexicographic minimum of the component.

    Pass a dict as ``stats`` to receive ``{"rounds": n}`` (each round =
    one large-star + one small-star pass)."""
    cur = edges.select("src", "dst").filter(F.col("src") != F.col("dst")) \
        .distinct().localCheckpoint(eager=False)

    # hot set: top-K degrees of the INPUT graph, computed once — the
    # first action also materializes the deduped edge checkpoint
    hot_nodes = None
    if hot_k > 0:
        hot_rows = (
            _nbrs(cur).groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
            .orderBy(F.desc("deg"), "n").limit(hot_k).select("n").collect()
        )
        if hot_rows:
            hot_nodes = edges.sparkSession.createDataFrame(
                [(r["n"],) for r in hot_rows], "n string")

    # rounds must not let partition counts drift: the star unions double
    # the partition count each use and broadcast-join plans skip AQE
    # coalescing, so an unbounded loop snowballs into hundreds of
    # micro-tasks per stage — re-bucket every round to a fixed width
    # (NOT edges.rdd.getNumPartitions(): .rdd on an AQE plan executes it)
    n_parts = max(2, edges.sparkSession.sparkContext.defaultParallelism)

    prev_sig = None
    rounds = 0
    for _ in range(MAX_ROUNDS):
        rounds += 1
        nbrs = _nbrs(cur)
        minn = _min_nbr(nbrs)
        cur = _apply_star(nbrs, minn, large=True, hot_nodes=hot_nodes)
        nbrs = _nbrs(cur)
        minn = _min_nbr(nbrs)
        # lazy checkpoint: the signature aggregate below materializes it,
        # so each round costs exactly one job
        cur = _apply_star(nbrs, minn, large=False, hot_nodes=hot_nodes) \
            .repartition(n_parts, "src") \
            .localCheckpoint(eager=False)
        sig = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError("connected components did not converge")
    if stats is not None:
        stats["rounds"] = rounds

    # after convergence every edge points to the component minimum
    members = cur.select(F.col("src").alias("node"),
                         F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node"),
                       F.col("dst").alias("component"))
    return members.unionAll(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def canonical_entity_map(link_edges: DataFrame, hot_k: int = 64) -> DataFrame:
    """(node, canonical) where canonical is the component's entity id
    (prefer ``entity:`` nodes as representatives over mention nodes)."""
    cc = connected_components(link_edges, hot_k=hot_k)
    reps = (
        cc.withColumn(
            "__pref",
            F.when(F.col("node").startswith("entity:"), 0).otherwise(1),
        )
        .groupBy("component")
        .agg(F.min(F.struct("__pref", "node")).alias("rep"))
        .select("component", F.col("rep")["node"].alias("canonical"))
    )
    return cc.join(reps, "component").select("node", "canonical")
