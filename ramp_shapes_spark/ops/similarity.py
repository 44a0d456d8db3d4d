"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline: a (filtered) cross
join whose inner product runs in JVM higher-order functions
(``zip_with`` + ``aggregate``) — no Python, no UDF.  The scale path is
the label-partitioned (IVF-style) variant: queries probe only their
cluster's bucket, turning the O(N·Q) cross join into a per-bucket join
that partitions cleanly and broadcasts the (small) query side.

All similarity values are emitted as ``*_x10k`` integers (rounded
scaled longs) so ranking and cross-engine comparison are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def with_cosine(pairs: DataFrame, a: str = "emb_a", b: str = "emb_b") -> DataFrame:
    sim = _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    return pairs.withColumn("cosine", sim)


def brute_force_topk(
    embeddings: DataFrame, k: int = 3, n_queries: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vectors.
    Returns (query_id, neighbor_id, rank, cosine_x10k)."""
    from ramp_shapes_spark.ops.dedup import spread

    base = spread(embeddings).select(F.col(id_col).alias("nid"),
                                     F.col(vec_col).alias("nvec"))
    queries = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    pairs = F.broadcast(queries).crossJoin(base) \
        .filter(F.col("qid") != F.col("nid"))
    sim = _dot(F.col("qvec"), F.col("nvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("nvec"))
    )
    scored = pairs.select(
        "qid", "nid",
        F.floor(sim * 10000 + F.lit(0.5)).cast("long").alias("cosine_x10k"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine_x10k"), F.asc("nid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"),
                "rank", "cosine_x10k")
    )


def ivf_topk(
    embeddings: DataFrame, k: int = 3, n_queries: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's bucket
    (here the precomputed cluster label; a full IVF would assign
    buckets by nearest centroid the same way).  Same output schema as
    :func:`brute_force_topk`."""
    from ramp_shapes_spark.ops.dedup import spread

    base = spread(embeddings).select(F.col(id_col).alias("nid"),
                                     F.col(vec_col).alias("nvec"),
                                     F.col(bucket_col).alias("nb"))
    queries = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
        F.col(bucket_col).alias("qb"),
    )
    pairs = F.broadcast(queries).join(
        base, F.col("qb") == F.col("nb")
    ).filter(F.col("qid") != F.col("nid"))
    sim = _dot(F.col("qvec"), F.col("nvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("nvec"))
    )
    scored = pairs.select(
        "qid", "nid",
        F.floor(sim * 10000 + F.lit(0.5)).cast("long").alias("cosine_x10k"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine_x10k"), F.asc("nid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"),
                "rank", "cosine_x10k")
    )


def _int_vecs(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(nid, v): embeddings scaled to exact integers (×10⁴, rounded).

    All k-means state (sums, means, squared distances, dot products)
    stays in exact BIGINT/`double-of-exact-int` arithmetic, so cluster
    assignment is bit-for-bit deterministic across engines and
    partitionings — floating-point summation order can never flip an
    argmin.  The 1e-4 quantization is far below any embedding noise
    floor.  Spread across cores first: a single-file embedding table
    scans as one partition and serializes every distance fold onto one
    task."""
    from ramp_shapes_spark.ops.dedup import spread

    return spread(embeddings).select(
        F.col(id_col).alias("nid"),
        F.expr(f"transform({vec_col}, "
               f"x -> CAST(round(x * 10000) AS BIGINT))").alias("v"),
    )


_SQDIST = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
           "CAST(0 AS BIGINT), (acc, d) -> acc + d)")
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, d) -> acc + d)")


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(nid, cid): nearest centroid per vector (ties → lowest cid)."""
    d = _SQDIST.format(a="v", b="cv")
    return (
        vecs.crossJoin(F.broadcast(cents))
        .selectExpr("nid", f"struct(({d}) AS d, cid) AS dc")
        .groupBy("nid").agg(F.expr("min(dc).cid").alias("cid"))
    )


def kmeans_assign(embeddings: DataFrame, n_clusters: int = 8,
                  iters: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Exact-integer Lloyd k-means over the embedding column.

    Init: the ``n_clusters`` lowest-id vectors (deterministic; a
    production fit would sample k-means++ style — the *assignment and
    probing machinery* is what IVF needs, and it is identical).
    Centroid update: per-dimension ``floor(sum/count)`` over exact
    integers — associativity-safe under any aggregation order.
    Returns (assignment (nid, cid), centroids (cid, cv))."""
    e = _int_vecs(embeddings, id_col, vec_col)
    cents = e.filter(F.col("nid") < n_clusters).selectExpr(
        "nid AS cid", "v AS cv")
    for _ in range(iters):
        assign = _assign(e, cents)
        # centroid update in ONE groupBy: elementwise exact-integer
        # vector sums via a fold over the cluster's member list (64-bit
        # sums are associativity-safe under any aggregation order), then
        # the same floor(sum * 1.0 / count) per dimension — replaces the
        # posexplode + (cid, dim) + (cid) double-shuffle pipeline
        cents = (
            assign.join(e, "nid")
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.expr(
                     "aggregate(collect_list(v), "
                     "CAST(NULL AS ARRAY<BIGINT>), "
                     "(acc, x) -> CASE WHEN acc IS NULL THEN x "
                     "ELSE zip_with(acc, x, (a, b) -> a + b) END)")
                 .alias("__sum"))
            .selectExpr(
                "cid",
                "transform(__sum, s -> "
                "CAST(floor(s * 1.0 / __n) AS BIGINT)) AS cv")
        )
    return _assign(e, cents), cents


def ivf_kmeans_topk(embeddings: DataFrame, k: int = 3, n_queries: int = 10,
                    n_clusters: int = 8, nprobe: int = 2, iters: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Real IVF top-k: k-means centroid fit + assignment + multi-probe.

    Queries probe their ``nprobe`` nearest centroids' inverted lists
    only — the 100 TB shape: the centroid table broadcasts (KBs), the
    vector table shuffles once on cluster id, and each query scans
    ``nprobe/n_clusters`` of the corpus.  Same output schema as
    :func:`brute_force_topk`; all arithmetic exact-integer-derived, so
    a SQL oracle reproduces it bit-for-bit."""
    e = _int_vecs(embeddings, id_col, vec_col)
    assign, cents = kmeans_assign(embeddings, n_clusters, iters,
                                  id_col, vec_col)
    base = e.join(assign, "nid")

    q = e.filter(F.col("nid") < n_queries).selectExpr(
        "nid AS qid", "v AS qv")
    d = _SQDIST.format(a="qv", b="cv")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .selectExpr("qid", "qv", "cid", f"({d}) AS pd")
        .withColumn("prn", F.expr(
            "row_number() OVER (PARTITION BY qid ORDER BY pd, cid)"))
        .where(F.col("prn") <= nprobe)
        .select("qid", "qv", "cid")
    )
    dot = _DOT.format(a="qv", b="nv")
    na = _DOT.format(a="qv", b="qv")
    nb = _DOT.format(a="nv", b="nv")
    pairs = F.broadcast(probes).join(
        base.selectExpr("nid", "v AS nv", "cid"), "cid"
    ).where(F.col("qid") != F.col("nid"))
    scored = pairs.selectExpr(
        "qid", "nid",
        f"CAST(floor(({dot}) / (sqrt({na}) * sqrt({nb})) * 10000 + 0.5) "
        f"AS BIGINT) AS cosine_x10k",
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_x10k"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"),
                "rank", "cosine_x10k")
    )


def cosine_dup_pairs(embeddings: DataFrame, threshold_x10k: int = 9500,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bucket_col: str = "label") -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold,
    restricted to same-bucket candidates (the LSH/IVF prefilter).
    Returns (id_a, id_b, cosine_x10k).

    Each side carries its vector NORM as a per-row column, so the
    within-bucket pair expansion computes one dot product per pair
    instead of re-deriving both norms pair-by-pair (the norm is the
    same float expression either way — once per vector, not once per
    pair — so thresholded values are bit-identical).  The input is
    spread across cores first: a single-file embedding table scans as
    one partition and would serialize the whole quadratic pair
    computation onto one task."""
    from ramp_shapes_spark.ops.dedup import spread

    emb = spread(embeddings)
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"),
                   F.col(bucket_col).alias("ba"),
                   _norm(F.col(vec_col)).alias("__na"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"),
                   F.col(bucket_col).alias("bb"),
                   _norm(F.col(vec_col)).alias("__nb"))
    pairs = a.join(b, (F.col("ba") == F.col("bb"))
                   & (F.col("id_a") < F.col("id_b")))
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))
    return (
        pairs.select("id_a", "id_b",
                     F.floor(sim * 10000 + F.lit(0.5)).cast("long").alias("cosine_x10k"))
        .filter(F.col("cosine_x10k") >= threshold_x10k)
    )


def semantic_dedup(embeddings: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_clusters: int = 8,
                   iters: int = 2,
                   threshold_x10k: int = 9500) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023:
    cluster the embedding space, drop all but one member of every
    tight within-cluster similarity group).

    Pipeline: exact-integer k-means assignment (:func:`kmeans_assign`
    — bit-deterministic argmin, so the cluster partition is identical
    on any engine) → within-cluster cosine pairs at
    ``cosine_x10k >= threshold_x10k`` (:func:`cosine_dup_pairs` over
    the cluster id as the bucket) → connected components over the
    pair graph → numeric-minimum canonical per component.  Returns
    ``(vec_id, canonical, kept)`` for EVERY vector — the keep/drop
    map a semantic-dedup stage applies to the corpus (kept =
    vec_id == canonical; singletons keep themselves).

    Scale shape: the only all-pairs step is confined within clusters
    (the SemDeDup trade — k ~ sqrt(corpus) bounds cluster width), the
    centroid table broadcasts, the vector table shuffles once on
    cluster id, and clustering reuses the pipeline's contraction CC.
    Cross-engine exactness matches :func:`cosine_dup_pairs`: cosines
    round to the 1e-4 grid before thresholding.
    """
    from ramp_shapes_spark.pipeline.canonicalize import (
        connected_components,
    )

    neg = embeddings.select(id_col).filter(
        F.col(id_col) < 0).limit(1).collect()
    if neg:
        raise ValueError(
            f"semantic_dedup requires non-negative {id_col} values "
            f"(got {neg[0][0]}): zero-padded lexicographic order must "
            f"equal numeric order; bias ids into >= 0 first")

    assign, _cents = kmeans_assign(embeddings, n_clusters, iters,
                                   id_col, vec_col)
    bucketed = embeddings.join(
        assign.withColumnRenamed("nid", id_col), id_col)
    pairs = cosine_dup_pairs(bucketed, threshold_x10k, id_col,
                             vec_col, bucket_col="cid")

    pad = "%019d"
    edges = pairs.select(
        F.format_string(pad, F.col("id_a")).alias("src"),
        F.format_string(pad, F.col("id_b")).alias("dst"),
    )
    cc = connected_components(edges, hot_k=0)
    return (
        embeddings.select(
            F.format_string(pad, F.col(id_col)).alias("node"))
        .join(cc, "node", "left")
        .select(
            F.col("node").cast("long").alias("vec_id"),
            F.coalesce(F.col("component"), F.col("node"))
            .cast("long").alias("canonical"),
        )
        .withColumn("kept", (F.col("vec_id") == F.col("canonical"))
                    .cast("boolean"))
    )
