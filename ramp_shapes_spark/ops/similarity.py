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
    base = embeddings.select(F.col(id_col).alias("nid"),
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
    base = embeddings.select(F.col(id_col).alias("nid"),
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


def cosine_dup_pairs(embeddings: DataFrame, threshold_x10k: int = 9500,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bucket_col: str = "label") -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold,
    restricted to same-bucket candidates (the LSH/IVF prefilter).
    Returns (id_a, id_b, cosine_x10k)."""
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("va"),
                          F.col(bucket_col).alias("ba"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"),
                          F.col(bucket_col).alias("bb"))
    pairs = a.join(b, (F.col("ba") == F.col("bb"))
                   & (F.col("id_a") < F.col("id_b")))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b",
                     F.floor(sim * 10000 + F.lit(0.5)).cast("long").alias("cosine_x10k"))
        .filter(F.col("cosine_x10k") >= threshold_x10k)
    )
